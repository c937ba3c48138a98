#!/usr/bin/env python
"""Batch rollup job (SURVEY §3 E1/E3) — the spark-submit entry point.

    spark-submit --py-files engine.zip jobs/rollup.py \
        --input <transcripts parquet/Iceberg path> \
        --output <tier-table root> \
        --tiers 1m,1h,1d [--num-parts 64] [--resume] [--ckpt manifest.jsonl] \
        [--incremental]

``--incremental`` turns the job into a continuous-aggregate refresher: the
output dir records the last fully-processed input snapshot
(``_input_manifest.json``); when the input is an append of it (Iceberg
incremental-scan semantics), only the NEW data files are aggregated and
merged into the existing tiers via operators/incremental.py — bit-equal to
a full rerun, with only delta-affected hash ranges rewritten. Bootstraps to
a full run when no prior snapshot is recorded; refuses (with a clear error)
when the input history is not append-only.

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
from features_engineering_of_motion_data_spark.operators.rollup import (
    CAL_UNITS,
    cascade_from_stats,
    split_tiers,
)
from features_engineering_of_motion_data_spark.session import get_spark
from features_engineering_of_motion_data_spark.sources.checkpoints import (
    append_record,
    completed_parts,
    load_manifest,
)
from features_engineering_of_motion_data_spark.operators.incremental import (
    delta_tier_stats,
    merge_partial_stats,
)
from features_engineering_of_motion_data_spark.sources.transcripts import (
    read_transcripts,
    read_transcripts_delta,
    resolve_snapshot,
    snapshot_manifest,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--tiers",
        default="1m,1h,1d",
        help="comma list of fixed tiers (1m/1h/1d) and/or calendar tiers "
             "(week/month/quarter/year); calendar tiers merge from the "
             "coarsest fixed tier in the list",
    )
    p.add_argument("--num-parts", type=int, default=16)
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--archive",
        action="store_true",
        help="also write the compressed full-fidelity raw tier to "
             "<output>/archive (delta-of-delta timestamps + Gorilla XOR "
             "values per (conv, channel, 1h bucket)); its own scan of the "
             "input — the staged stats pass cannot feed it because the "
             "archive needs the turn-level rows the stage deliberately "
             "aggregates away",
    )
    p.add_argument(
        "--incremental",
        action="store_true",
        help="refresh mode: if <output>/_input_manifest.json records a prior "
             "snapshot and the input is an append of it, aggregate only the "
             "new data files and merge into the existing tiers (bit-equal to "
             "a full rerun); bootstraps to a full run otherwise",
    )
    p.add_argument("--ckpt", default=None, help="manifest path (default <output>/_ckpt.jsonl)")
    p.add_argument("--master", default=None, help="override master (tests); spark-submit sets it otherwise")
    p.add_argument("--fail-after", type=int, default=None, help="TEST HOOK: abort after N ranges")
    return p.parse_args(argv)


def _part_expr(num_parts: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(num_parts))


def _observe_parts(df, obs, num_parts: int):
    """Attach per-range row counters to the SAME action that writes the stage
    (CollectMetrics node — zero extra scans)."""
    part_of = _part_expr(num_parts)
    counters = [
        F.sum(F.when(part_of == k, 1).otherwise(0)).alias(f"p{k}")
        for k in range(num_parts)
    ]
    return df.observe(obs, *counters)


def _write_stage(
    stage_dir: str, staged, rows_cb, args, snapshot: str, finest: str, t0: float,
    extra: dict | None = None,
) -> dict:
    """Write the staged stats; ``rows_cb()`` supplies per-range rows-in after
    the write action completes (Observation harvest or precomputed dict)."""
    (
        staged.write.mode("overwrite")
        .partitionBy("part")
        .parquet(os.path.join(stage_dir, "stats"))
    )
    rows = rows_cb()
    meta = {
        "snapshot_id": snapshot,
        "num_parts": args.num_parts,
        "finest": finest,
        "rows_in": {str(k): int(rows.get(f"p{k}") or 0) for k in range(args.num_parts)},
        "stage_wall_s": round(time.perf_counter() - t0, 3),
        # explicit read schema: an empty input writes NO partition dirs, and
        # a schema-less parquet read of that would fail
        "schema": staged.schema.json(),
    }
    meta.update(extra or {})
    tmp = os.path.join(stage_dir, "meta.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, os.path.join(stage_dir, "meta.json"))
    return meta


def _build_stage(spark, args, snapshot: str, finest: str, stage_dir: str) -> dict:
    """Phase 1 (full): one pass over the input → staged finest-tier stats +
    per-range raw-row metrics. Persisted as ``meta.json`` so a resumed run
    can skip this phase entirely."""
    from pyspark.sql import Observation

    turns = read_transcripts(spark, args.input, snapshot_id=snapshot)
    obs = Observation()
    turns = _observe_parts(turns, obs, args.num_parts)
    t0 = time.perf_counter()
    stats = aggregate_tier(derive_channels(dedup_turns(turns)), finest)
    staged = stats.withColumn("part", _part_expr(args.num_parts))
    return _write_stage(
        stage_dir, staged, lambda: dict(obs.get), args, snapshot, finest, t0
    )


def _build_stage_incremental(
    spark, args, snapshot: str, finest: str, stage_dir: str, prior: dict
) -> dict:
    """Phase 1 (incremental): one pass over the DELTA data files only.

    Stages the already-MERGED finest-tier stats for the delta's affected
    conversations: old stats (read back from the existing ``tier=<finest>``
    output, semi-joined to the delta's conv_ids) + delta stats with seam
    context (operators/incremental.py). Staging the merged frame — rather
    than the delta alone — keeps the range loop free of a read-then-
    overwrite on the tier dirs it rewrites. ``rows_in`` counts DELTA turns
    per range (the lineage of what this run actually ingested) via an
    explicit count over the small delta — the delta subtree feeds three
    plan branches (channels, seam conv list, semi-join), so an Observation
    there would be ambiguous. Ranges with zero delta rows are skipped
    untouched: their tier outputs are already bit-correct on disk.
    """
    from features_engineering_of_motion_data_spark.operators.features import (
        STAT_COLS,
    )

    delta = read_transcripts_delta(spark, args.input, prior["entries"])
    t0 = time.perf_counter()
    rows = {
        f"p{r['part']}": r["cnt"]
        for r in delta.groupBy(_part_expr(args.num_parts).alias("part"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # a rewritten range must carry ALL its conversations, not only the
    # delta's: the old side is filtered by the partition column (pruned
    # read of exactly the affected part dirs), so convs with no delta in
    # an affected range pass through the merge bit-unchanged
    affected = [k for k in range(args.num_parts) if rows.get(f"p{k}", 0) > 0]
    old = spark.read.parquet(os.path.join(args.output, f"tier={finest}"))
    old_stats = old.filter(F.col("part").isin(affected)).select(
        "conv_id",
        "channel",
        F.unix_micros("bucket_start").alias("bucket_us"),
        *STAT_COLS,
    )
    d_stats = delta_tier_stats(old_stats, delta, finest)
    merged = merge_partial_stats(old_stats, d_stats)
    staged = merged.withColumn("part", _part_expr(args.num_parts))
    return _write_stage(
        stage_dir, staged, lambda: rows, args, snapshot, finest, t0,
        extra={"incremental": True, "parent_snapshot": prior["snapshot_id"]},
    )


def _input_manifest_path(output: str) -> str:
    return os.path.join(output, "_input_manifest.json")


def _load_input_manifest(output: str):
    p = _input_manifest_path(output)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def _write_input_manifest(
    output: str,
    snapshot: str,
    entries: list,
    num_parts: int,
    finest: str,
    prior: dict | None,
) -> None:
    """Record the fully-processed input snapshot (atomic; enables the next
    --incremental run to diff against it). ``history`` accumulates every
    completed snapshot so a later run can tell a *finished* refresh's
    checkpoint records from an interrupted one's."""
    history = list(prior.get("history", [prior["snapshot_id"]])) if prior else []
    p = _input_manifest_path(output)
    with open(p + ".tmp", "w", encoding="utf-8") as f:
        json.dump(
            {
                "snapshot_id": snapshot,
                "entries": entries,
                "num_parts": num_parts,
                "finest": finest,
                "history": history + [snapshot],
            },
            f,
            sort_keys=True,
        )
    os.replace(p + ".tmp", p)


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


def _write_archive(spark, args, snapshot: str) -> None:
    """Optional second product: the compressed full-fidelity raw tier
    (SURVEY §2.7 C1/C2; operators/archive.py).  One dedicated scan —
    partitioned by the conv_id hash range like the tiers, with a lineage
    sidecar recording the snapshot and the measured compression ratio via
    ``observe`` on the SAME write action (no re-read)."""
    from pyspark.sql import Observation

    from features_engineering_of_motion_data_spark.operators.archive import (
        build_archive,
    )

    turns = read_transcripts(spark, args.input, snapshot_id=snapshot)
    arch = build_archive(derive_channels(dedup_turns(turns)), tier="1h")
    arch = arch.withColumn("part", _part_expr(args.num_parts))
    obs = Observation()
    arch = arch.observe(
        obs,
        F.count(F.lit(1)).alias("buckets"),
        F.sum("n").alias("turn_points"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("encoded_bytes").alias("encoded_bytes"),
    )
    dest = os.path.join(args.output, "archive")
    arch.write.mode("overwrite").partitionBy("part").parquet(dest)
    m = {k: int(v or 0) for k, v in obs.get.items()}
    m["snapshot_id"] = snapshot
    m["ratio"] = (
        round(m["encoded_bytes"] / m["raw_bytes"], 6) if m["raw_bytes"] else None
    )
    tmp = os.path.join(dest, "_archive_meta.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(m, f, sort_keys=True)
    os.replace(tmp, os.path.join(dest, "_archive_meta.json"))


def run(args) -> int:
    tiers = tuple(args.tiers.split(","))
    try:
        fixed, cal = split_tiers(tiers)
    except KeyError as e:
        raise SystemExit(
            f"unknown tier {e.args[0]!r}; valid: {sorted(TIER_US) + list(CAL_UNITS)}"
        )
    if not fixed:
        raise SystemExit(
            f"calendar tiers {cal} merge from a fixed tier; include one of "
            f"{sorted(TIER_US)}"
        )
    finest = min(fixed, key=lambda t: TIER_US[t])
    ckpt = args.ckpt or os.path.join(args.output, "_ckpt.jsonl")
    snapshot = resolve_snapshot(args.input)
    entries = snapshot_manifest(args.input)
    prior = _load_input_manifest(args.output) if args.incremental else None
    if prior is not None and prior.get("snapshot_id") == snapshot:
        print(f"rollup up to date: snapshot={snapshot} (no new data files)")
        return 0
    incremental = bool(
        prior is not None
        and prior.get("num_parts") == args.num_parts
        and prior.get("finest") == finest
    )
    manifest = load_manifest(ckpt) if (args.resume or incremental) else []
    if not (args.resume or incremental) and load_manifest(ckpt):
        raise SystemExit(
            f"manifest {ckpt} already exists; pass --resume to continue it"
        )
    if incremental:
        # the ckpt is a lineage log across refreshes: records for COMPLETED
        # snapshots (in the manifest's history) are fine, and records for
        # the current snapshot are a resumable partial refresh — but records
        # for any OTHER snapshot mean a refresh was interrupted and the
        # input then grew again; merging on top of its partial tier writes
        # would double-count that delta, so refuse.
        known = set(prior.get("history", [prior["snapshot_id"]]))
        stray = {r["snapshot_id"] for r in manifest} - known - {snapshot}
        if stray:
            raise SystemExit(
                f"checkpoint {ckpt} holds ranges for interrupted snapshot(s) "
                f"{sorted(stray)}; rerun --incremental with that exact input "
                "to finish it, or run a full rollup into a fresh output"
            )
        done = {
            int(r["part_key"]) for r in manifest if r["snapshot_id"] == snapshot
        }
    else:
        done = completed_parts(manifest, snapshot)

    from pyspark.sql import Observation, SparkSession

    # only stop the session on exit if this job created it (in-process test
    # harnesses share one session via getOrCreate)
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(master=args.master, app_name="transcript-rollup")

    stage_dir = os.path.join(args.output, "_stage", f"snap={snapshot}")
    meta = _load_stage_meta(stage_dir, snapshot, args, finest) if args.resume else None
    if meta is None:
        if incremental:
            meta = _build_stage_incremental(
                spark, args, snapshot, finest, stage_dir, prior
            )
        else:
            meta = _build_stage(spark, args, snapshot, finest, stage_dir)

    from pyspark.sql import types as T

    staged = spark.read.schema(
        T.StructType.fromJson(json.loads(meta["schema"]))
    ).parquet(os.path.join(stage_dir, "stats"))

    ran = 0
    for part in range(args.num_parts):
        if part in done:
            continue
        if meta.get("incremental") and meta["rows_in"][str(part)] == 0:
            # no delta turns hashed into this range: its tier outputs on
            # disk are already bit-correct — skip without rewriting
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
    if args.archive:
        _write_archive(spark, args, snapshot)
    # record the fully-processed snapshot — the diff base for the next
    # --incremental run (written for full runs too, so any full rollup
    # bootstraps later increments)
    _write_input_manifest(
        args.output, snapshot, entries, args.num_parts, finest, prior
    )
    if owns_session:
        spark.stop()
    print(
        f"rollup complete: snapshot={snapshot} parts={args.num_parts} "
        f"({'incremental, ' if incremental else ''}ran {ran}, "
        f"resumed past {len(done)}) tiers={','.join(tiers)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(run(parse_args()))
