#!/usr/bin/env python
"""Batch rollup job (SURVEY §3 E1/E3) — the spark-submit entry point.

    spark-submit --py-files engine.zip jobs/rollup.py \
        --input <transcripts parquet/Iceberg path> \
        --output <tier-table root> \
        --tiers 1m,1h,1d [--num-parts 64] [--resume] [--ckpt manifest.jsonl]

The input is processed in ``--num-parts`` deterministic partition ranges
(hash buckets of conv_id, so a range is conversation-closed and every range
is independently restartable). Each range runs the full cascade and writes
idempotently to ``<output>/tier=<T>/part=<K>/``; a per-range lineage record
(snapshot-id, range, rows-in, points-out) lands in the checkpoint manifest.
``--resume`` skips completed ranges after verifying the snapshot is unchanged.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from features_engineering_of_motion_data_spark.operators.channels import (
    dedup_turns,
    derive_channels,
)
from features_engineering_of_motion_data_spark.operators.features import TIER_US
from features_engineering_of_motion_data_spark.operators.rollup import cascade
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


def run(args) -> int:
    tiers = tuple(args.tiers.split(","))
    for t in tiers:
        if t not in TIER_US:
            raise SystemExit(f"unknown tier {t!r}; valid: {sorted(TIER_US)}")
    ckpt = args.ckpt or os.path.join(args.output, "_ckpt.jsonl")
    snapshot = resolve_snapshot(args.input)
    manifest = load_manifest(ckpt) if args.resume else []
    if not args.resume and load_manifest(ckpt):
        raise SystemExit(
            f"manifest {ckpt} already exists; pass --resume to continue it"
        )
    done = completed_parts(manifest, snapshot)

    from pyspark.sql import SparkSession

    # only stop the session on exit if this job created it (in-process test
    # harnesses share one session via getOrCreate)
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(master=args.master, app_name="transcript-rollup")
    turns = read_transcripts(spark, args.input, snapshot_id=snapshot)
    part_of = F.pmod(F.xxhash64("conv_id"), F.lit(args.num_parts))

    ran = 0
    for part in range(args.num_parts):
        if part in done:
            continue
        t0 = time.perf_counter()
        sub = turns.filter(part_of == part)
        rows_in = sub.count()
        points: dict[str, int] = {}
        outputs = cascade(derive_channels(dedup_turns(sub)), tiers)
        for tier, df in outputs.items():
            dest = os.path.join(args.output, f"tier={tier}", f"part={part:05d}")
            df.write.mode("overwrite").parquet(dest)
            points[tier] = spark.read.parquet(dest).count()
        append_record(
            ckpt, snapshot, part, rows_in, points, time.perf_counter() - t0
        )
        ran += 1
        if args.fail_after is not None and ran >= args.fail_after:
            print(f"TEST HOOK: aborting after {ran} ranges", file=sys.stderr)
            if owns_session:
                spark.stop()
            return 42
    if owns_session:
        spark.stop()
    print(
        f"rollup complete: snapshot={snapshot} parts={args.num_parts} "
        f"(ran {ran}, resumed past {len(done)}) tiers={','.join(tiers)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(run(parse_args()))
