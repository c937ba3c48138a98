#!/usr/bin/env python
"""One-off config-variant sweep for the 4-core scaling arm (round 3).

The audited record's 4-core best (17.7 s) sits ~1.5 s above its own CPU work
floor (64.3 cpu-s / 4 = 16.1 s). This probes where that tail lives by timing
the same cascade under config variants, interleaved min-of-N so host drift
hits all variants equally. Results are printed, not recorded — the winning
variant (if any) graduates into session.py / the pinned record explicitly.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import CHILD, REPO  # noqa: E402

VARIANTS = {
    "baseline": {},
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "serialgc": {"spark.driver.extraJavaOptions": "-XX:+UseSerialGC"},
    "noaqe+serialgc": {
        "spark.sql.adaptive.enabled": "false",
        "spark.driver.extraJavaOptions": "-XX:+UseSerialGC",
    },
}


def run(cores: int, conf: dict) -> tuple[float, float]:
    env = dict(os.environ, SPARK_GRAFT_EXTRA_CONF=json.dumps(conf))
    inp = os.path.join(REPO, "tests/data/transcripts_bench.parquet")
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", CHILD,
         str(cores), inp, REPO, str(cores)],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("MEASURE"):
            f = line.split()
            return float(f[2]), float(f[4])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def main() -> None:
    core_list = [int(c) for c in (sys.argv[1] if len(sys.argv) > 1 else "4").split(",")]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results: dict[tuple, list] = {(k, c): [] for k in VARIANTS for c in core_list}
    for rep in range(reps):
        for name, conf in VARIANTS.items():
            for cores in core_list:
                wall, cpu = run(cores, conf)
                results[(name, cores)].append((wall, cpu))
                print(f"rep {rep} {name} local[{cores}]: wall {wall:.2f}s "
                      f"cpu {cpu:.1f}s", flush=True)
    print("\n== best per (variant, cores) ==")
    for (name, cores), rs in results.items():
        w = min(r[0] for r in rs)
        c = min(r[1] for r in rs)
        print(f"{name:16s} local[{cores}]  wall {w:6.2f}s  cpu {c:6.1f}s  "
              f"floor {c / cores:5.2f}s")


if __name__ == "__main__":
    main()
