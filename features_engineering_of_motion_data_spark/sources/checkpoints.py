"""Per-partition checkpoint manifest (SURVEY §2.1 S4, §3 E3).

JSON-lines file; one record per completed partition range carrying lineage:
input snapshot-id, partition key, rows-in / points-out metrics and wall time.
Appends are atomic enough for a single driver (O_APPEND + flush + fsync);
on Iceberg deployments the manifest would live beside the job's own commit
metadata, but its format is engine-owned either way.
"""

from __future__ import annotations

import json
import os
import time


def load_manifest(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def completed_parts(records: list[dict], snapshot_id: str) -> set[int]:
    """Partition keys already finished *for this snapshot*.

    A manifest written against a different snapshot is a hard error: resume
    must never mix snapshots (lineage guarantee, SURVEY §3 E3).
    """
    seen = {r["snapshot_id"] for r in records}
    if seen and seen != {snapshot_id}:
        raise RuntimeError(
            f"checkpoint manifest was written for snapshot(s) {sorted(seen)} "
            f"but the input resolves to {snapshot_id}; refusing to resume "
            "across snapshots"
        )
    return {int(r["part_key"]) for r in records}


def append_record(
    path: str,
    snapshot_id: str,
    part_key: int,
    rows_in: int,
    points_out: dict[str, int],
    wall_s: float,
) -> dict:
    rec = {
        "snapshot_id": snapshot_id,
        "part_key": part_key,
        "rows_in": rows_in,
        "points_out": points_out,
        "wall_s": round(wall_s, 3),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "a", encoding="utf-8") as f:
        f.write(json.dumps(rec, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())
    return rec
