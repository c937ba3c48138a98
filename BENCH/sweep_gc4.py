#!/usr/bin/env python
"""Round-3 follow-up probe: 4-core-arm GC/heap triage on the 4x corpus.

Today's accumulation showed the config, not the host, dominating the 4-core
arm: SerialGC@16g burned 2.5-3x the CPU floor twice in a row (581/683 cpu-s
vs the ~226 floor) while SerialGC@4g stayed clean twice (226 cpu-s). This
sweep times ONLY the 4-core arm across GC/heap candidates, interleaved, to
pick the pair config worth spending 1-core samples on."""
import json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "BENCH", "child_cascade.py")
INPUT = os.path.join(REPO, "tests/data/transcripts_bench4x.parquet")

VARIANTS = {
    "sgc4g":  {"spark.sql.adaptive.enabled": "false",
               "spark.driver.extraJavaOptions": "-XX:+UseSerialGC",
               "spark.driver.memory": "4g"},
    "sgc8g":  {"spark.sql.adaptive.enabled": "false",
               "spark.driver.extraJavaOptions": "-XX:+UseSerialGC",
               "spark.driver.memory": "8g"},
    "pgc4_4g": {"spark.sql.adaptive.enabled": "false",
                "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=4",
                "spark.driver.memory": "4g"},
    "g1_4g":  {"spark.sql.adaptive.enabled": "false",
               "spark.driver.memory": "4g"},
    "g1_16g": {"spark.sql.adaptive.enabled": "false"},
    "pgc4_8g": {"spark.sql.adaptive.enabled": "false",
                "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=4",
                "spark.driver.memory": "8g"},
    "g1_8g":  {"spark.sql.adaptive.enabled": "false",
               "spark.driver.memory": "8g"},
    "pgc4_6g": {"spark.sql.adaptive.enabled": "false",
                "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=4",
                "spark.driver.memory": "6g"},
    "sgc4g_p4": {"spark.sql.adaptive.enabled": "false",
                 "spark.driver.extraJavaOptions": "-XX:+UseSerialGC",
                 "spark.driver.memory": "4g", "_parts": 16},
}

def wait_idle(max_load=5.0, timeout_s=600):
    t0 = time.time()
    while time.time() - t0 < timeout_s and os.getloadavg()[0] >= max_load:
        time.sleep(5)

def run(cores, conf):
    conf = dict(conf)
    parts = conf.pop("_parts", cores)
    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(conf)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores-1}", sys.executable, CHILD,
         str(cores), INPUT, REPO, str(parts)],
        capture_output=True, text=True, cwd=REPO, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("MEASURE"):
            f = line.split()
            return float(f[2]), float(f[4])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
only = sys.argv[2].split(",") if len(sys.argv) > 2 else list(VARIANTS)
for rep in range(reps):
    for name in only:
        wait_idle()
        try:
            w, c = run(4, VARIANTS[name])
        except RuntimeError as e:
            print(f"rep {rep} {name:10s} local[4]: FAILED {str(e)[:200]}", flush=True)
            continue
        print(f"rep {rep} {name:10s} local[4]: wall {w:7.2f}s cpu {c:7.1f}s", flush=True)
