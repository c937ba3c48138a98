#!/usr/bin/env python
"""Round-3 config triage: measure (wall, cpu) of the cached cascade child at
1 and 4 pinned cores under candidate GC/AQE variants, one sample per cell per
rep, interleaved, idle-gated.  Goal: find the variant whose CPU-work
inflation W(4)/W(1) is lowest — at the quiet-window floor the audited
scaling efficiency equals W(1)/W(4), so inflation <= 1.25 is what makes the
>= 0.8 N->4N gate physically reachable on this single-VM host."""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "BENCH", "child_cascade.py")
INPUT = os.path.join(REPO, "tests/data/transcripts_bench.parquet")

VARIANTS = {
    "serialgc_noaqe": {
        "spark.sql.adaptive.enabled": "false",
        "spark.driver.extraJavaOptions": "-XX:+UseSerialGC",
    },
    "serialgc_noaqe_uncached": {
        "spark.sql.adaptive.enabled": "false",
        "spark.driver.extraJavaOptions": "-XX:+UseSerialGC",
        "_nocache": "1",
    },
    "pgc2_noaqe": {
        "spark.sql.adaptive.enabled": "false",
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=2",
    },
    "serialgc_noaqe_heap4g": {
        "spark.sql.adaptive.enabled": "false",
        "spark.driver.extraJavaOptions": "-XX:+UseSerialGC",
        "spark.driver.memory": "4g",
    },
}


def wait_idle(max_load=5.0, timeout_s=600):
    t0 = time.time()
    while time.time() - t0 < timeout_s and os.getloadavg()[0] >= max_load:
        time.sleep(5)


def run(cores, conf):
    conf = dict(conf)
    env = dict(os.environ)
    if conf.pop("_nocache", None):
        env["SPARK_GRAFT_NO_CACHE"] = "1"
    env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(conf)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores-1}", sys.executable, CHILD,
         str(cores), INPUT, REPO, str(cores)],
        capture_output=True, text=True, cwd=REPO, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("MEASURE"):
            f = line.split()
            return float(f[2]), float(f[4])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


results = {}
for rep in range(int(sys.argv[1]) if len(sys.argv) > 1 else 2):
    for name, conf in VARIANTS.items():
        for cores in (1, 4):
            wait_idle()
            try:
                wall, cpu = run(cores, conf)
            except Exception as e:
                print(f"rep {rep} {name} c{cores} FAILED: {e}", flush=True)
                continue
            results.setdefault((name, cores), []).append((wall, cpu))
            print(f"rep {rep} {name:28s} local[{cores}]: wall {wall:7.2f}s cpu {cpu:6.1f}s",
                  flush=True)

print("\n== best per (variant, cores); floor-eff = W(1)/W(4) ==")
for name in VARIANTS:
    w1 = results.get((name, 1)); w4 = results.get((name, 4))
    if not (w1 and w4):
        continue
    c1 = min(c for _, c in w1); c4 = min(c for _, c in w4)
    b1 = min(w for w, _ in w1); b4 = min(w for w, _ in w4)
    print(f"{name:28s} W1={c1:6.1f} W4={c4:6.1f} floor-eff={c1/c4:5.3f} "
          f"wall1={b1:6.1f} wall4={b4:6.1f} live-eff={b1/(4*b4):5.3f}")
