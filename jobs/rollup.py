#!/usr/bin/env python
"""Batch rollup job (SURVEY §3 E1/E3) — the spark-submit entry point.

    spark-submit --py-files engine.zip jobs/rollup.py \
        --input <transcripts parquet/Iceberg path> \
        --output <tier-table root> \
        --tiers 1m,1h,1d [--num-parts 64] [--resume] [--ckpt manifest.jsonl]

Two phases, ONE scan of the input per job run (not per range):

1. **Stage** — dedup + channels + finest-tier sufficient statistics are
   computed in a single pass over the input and written to
   ``<output>/_stage/snap=<id>/stats_1m`` partitioned by the conv_id hash
   bucket (``part``).  Per-range raw-row counts are captured *in the same
   action* via ``DataFrame.observe`` (no extra count jobs).  The stage is
   keyed by snapshot-id, so a resumed run whose stage already exists never
   touches the raw input at all.
2. **Ranges** — each of ``--num-parts`` hash buckets of conv_id is rolled up
   independently from its *partition-pruned* slice of the staged stats (the
   stage read's FileScan shows ``PartitionFilters: [part = K]``; asserted in
   tests/test_plans.py).  A range is conversation-closed and idempotently
   restartable: it writes ``<output>/tier=<T>/part=<K>/`` and appends a
   lineage record (snapshot-id, range, rows-in, points-out) to the checkpoint
   manifest only after its writes commit.  Points-out come from an
   ``observe`` on each tier write — the written files are never re-read.

``--resume`` skips completed ranges after verifying the snapshot is
unchanged.  On success the stage directory is deleted.

Scale note (10^12 turns): the previous design filtered the FULL input by
``pmod(xxhash64(conv_id))`` once per range — O(P·N) read amplification,
since a hash predicate cannot prune a parquet/Iceberg scan.  The staged
layout reads the input exactly once and each range reads only its own
(much smaller, aggregated) bucket via real partition pruning.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from features_engineering_of_motion_data_spark.operators.channels import (
    dedup_turns,
    derive_channels,
)
from features_engineering_of_motion_data_spark.operators.features import (
    TIER_US,
    aggregate_tier,
)
from features_engineering_of_motion_data_spark.operators.rollup import cascade_from_stats
from features_engineering_of_motion_data_spark.session import get_spark
from features_engineering_of_motion_data_spark.sources.checkpoints import (
    append_record,
    completed_parts,
    load_manifest,
)
from features_engineering_of_motion_data_spark.sources.transcripts import (
    read_transcripts,
    resolve_snapshot,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--tiers", default="1m,1h,1d")
    p.add_argument("--num-parts", type=int, default=16)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ckpt", default=None, help="manifest path (default <output>/_ckpt.jsonl)")
    p.add_argument("--master", default=None, help="override master (tests); spark-submit sets it otherwise")
    p.add_argument("--fail-after", type=int, default=None, help="TEST HOOK: abort after N ranges")
    return p.parse_args(argv)


def _part_expr(num_parts: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(num_parts))


def _build_stage(spark, args, snapshot: str, finest: str, stage_dir: str) -> dict:
    """Phase 1: one pass over the input → staged finest-tier stats + metrics.

    Returns the stage metadata dict (also persisted as ``meta.json`` so a
    resumed run can skip this phase entirely).
    """
    from pyspark.sql import Observation

    turns = read_transcripts(spark, args.input, snapshot_id=snapshot)
    obs = Observation()
    part_of = _part_expr(args.num_parts)
    # per-range raw-row counts, harvested from the SAME action that writes
    # the stage (CollectMetrics node — zero extra scans)
    counters = [
        F.sum(F.when(part_of == k, 1).otherwise(0)).alias(f"p{k}")
        for k in range(args.num_parts)
    ]
    turns = turns.observe(obs, *counters)
    t0 = time.perf_counter()
    stats = aggregate_tier(derive_channels(dedup_turns(turns)), finest)
    staged = stats.withColumn("part", _part_expr(args.num_parts))
    (
        staged.write.mode("overwrite")
        .partitionBy("part")
        .parquet(os.path.join(stage_dir, "stats"))
    )
    rows = obs.get
    meta = {
        "snapshot_id": snapshot,
        "num_parts": args.num_parts,
        "finest": finest,
        "rows_in": {str(k): int(rows[f"p{k}"] or 0) for k in range(args.num_parts)},
        "stage_wall_s": round(time.perf_counter() - t0, 3),
        # explicit read schema: an empty input writes NO partition dirs, and
        # a schema-less parquet read of that would fail
        "schema": staged.schema.json(),
    }
    tmp = os.path.join(stage_dir, "meta.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, os.path.join(stage_dir, "meta.json"))
    return meta


def _load_stage_meta(stage_dir: str, snapshot: str, args, finest: str):
    """Reusable stage metadata, or None if absent / keyed differently."""
    path = os.path.join(stage_dir, "meta.json")
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        meta = json.load(f)
    if (
        meta.get("snapshot_id") == snapshot
        and meta.get("num_parts") == args.num_parts
        and meta.get("finest") == finest
        and meta.get("schema")
    ):
        return meta
    return None


def run(args) -> int:
    tiers = tuple(args.tiers.split(","))
    for t in tiers:
        if t not in TIER_US:
            raise SystemExit(f"unknown tier {t!r}; valid: {sorted(TIER_US)}")
    finest = min(tiers, key=lambda t: TIER_US[t])
    ckpt = args.ckpt or os.path.join(args.output, "_ckpt.jsonl")
    snapshot = resolve_snapshot(args.input)
    manifest = load_manifest(ckpt) if args.resume else []
    if not args.resume and load_manifest(ckpt):
        raise SystemExit(
            f"manifest {ckpt} already exists; pass --resume to continue it"
        )
    done = completed_parts(manifest, snapshot)

    from pyspark.sql import Observation, SparkSession

    # only stop the session on exit if this job created it (in-process test
    # harnesses share one session via getOrCreate)
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(master=args.master, app_name="transcript-rollup")

    stage_dir = os.path.join(args.output, "_stage", f"snap={snapshot}")
    meta = _load_stage_meta(stage_dir, snapshot, args, finest) if args.resume else None
    if meta is None:
        meta = _build_stage(spark, args, snapshot, finest, stage_dir)

    from pyspark.sql import types as T

    staged = spark.read.schema(
        T.StructType.fromJson(json.loads(meta["schema"]))
    ).parquet(os.path.join(stage_dir, "stats"))

    ran = 0
    for part in range(args.num_parts):
        if part in done:
            continue
        t0 = time.perf_counter()
        sub_stats = staged.filter(F.col("part") == part).drop("part")
        points: dict[str, int] = {}
        outputs = cascade_from_stats(sub_stats, tiers)
        for tier, df in outputs.items():
            dest = os.path.join(args.output, f"tier={tier}", f"part={part:05d}")
            pobs = Observation()
            df = df.observe(pobs, F.count(F.lit(1)).alias("points"))
            df.write.mode("overwrite").parquet(dest)
            points[tier] = int(pobs.get["points"])
        append_record(
            ckpt,
            snapshot,
            part,
            meta["rows_in"][str(part)],
            points,
            time.perf_counter() - t0,
        )
        ran += 1
        if args.fail_after is not None and ran >= args.fail_after:
            print(f"TEST HOOK: aborting after {ran} ranges", file=sys.stderr)
            if owns_session:
                spark.stop()
            return 42
    shutil.rmtree(stage_dir, ignore_errors=True)
    try:
        os.rmdir(os.path.dirname(stage_dir))  # drop _stage/ itself if empty
    except OSError:
        pass
    if owns_session:
        spark.stop()
    print(
        f"rollup complete: snapshot={snapshot} parts={args.num_parts} "
        f"(ran {ran}, resumed past {len(done)}) tiers={','.join(tiers)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(run(parse_args()))
