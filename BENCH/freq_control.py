#!/usr/bin/env python
"""Pure-CPU frequency control: per-core throughput at K=1 vs K=4 pinned cores.

Separates HOST physics from ENGINE overhead in the N-vs-4N proxy: each pinned
worker runs an identical register-only integer loop (no memory traffic, no
shared state), so any per-core throughput drop at K=4 is the host's
single-core-turbo vs all-core-clock asymmetry — a single-box artifact that a
real N-vs-4N-*executor* deployment (one frequency budget per node) does not
have. The measured ratio f(4)/f(1) is the physical ceiling any 4-core-arm
sample on this box can reach relative to the 1-core arm, engine regardless.

Writes BENCH/freq_control.json: per-K best iterations/sec/core over reps,
interleaved K order, min-of-samples per K.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import time, sys
n = 0
x = 1469598103934665603
t0 = time.perf_counter()
deadline = t0 + float(sys.argv[1])
# ~1e6 dependent integer ops per outer tick: multiply+xor chain, register-only
while time.perf_counter() < deadline:
    for _ in range(100000):
        x = (x * 1099511628211) ^ (x >> 7)
    n += 100000
print(n / (time.perf_counter() - t0))
"""


def measure(k: int, secs: float = 8.0) -> float:
    """Spawn k pinned single-core workers simultaneously (cpus 0..k-1);
    return the MEAN per-core rate (ops/s) across them."""
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", _WORKER, str(secs)],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(k)
    ]
    rates = [float(p.communicate()[0].strip()) for p in procs]
    return sum(rates) / len(rates)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    ks = (
        tuple(int(x) for x in sys.argv[2].split(","))
        if len(sys.argv) > 2
        else (1, 4, 8)
    )
    out_path = os.path.join(REPO, "BENCH", "freq_control.json")
    best: dict[int, float] = {}
    samples: list[dict] = []
    if os.path.exists(out_path):
        prior = json.load(open(out_path))
        samples = prior.get("samples", [])
        best = {int(k): v for k, v in prior.get("best_ops_per_core", {}).items()}
    for rep in range(reps):
        for k in ks:  # interleaved so host drift hits all K equally
            t0 = time.time()
            # loadavg on this host can sit inflated (~2-4) with vmstat showing
            # 100% idle - phantom load from stuck kernel threads. Bounded wait:
            # prefer a quiet window, proceed after 120s regardless.
            while os.getloadavg()[0] >= 4.5 and time.time() - t0 < 120:
                time.sleep(10)
            r = measure(k)
            best[k] = max(best.get(k, 0.0), r)
            samples.append({"k": k, "ops_per_core": round(r), "t": int(time.time())})
            print(f"rep {rep} K={k}: {r:,.0f} ops/s/core", flush=True)
    result = {
        "best_ops_per_core": {str(k): round(v) for k, v in sorted(best.items())},
        "per_core_ratio_vs_1": {
            str(k): round(best[k] / best[1], 3) for k in sorted(best) if 1 in best
        },
        "samples": samples,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["per_core_ratio_vs_1"]))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
