"""Driver-checkable query registry (SURVEY.md §2 Oracle column).

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame`` with
an equivalent DuckDB SQL string, compared by the driver at sf0.01 via
row-count + schema + order-insensitive value hash.

Float-safety contract (applies to every pair in this package): cross-engine
float aggregation is never compared directly. Quantities with finite decimal
granularity (fixture doubles all carry 2 decimals) are scaled to exact
integers (cents) and summed as BIGINT — bit-exact in any engine at any
parallelism — and any derived float is produced by a *pinned* sequence of
IEEE-754 double ops on those exact integers, written identically on both
sides, so even the doubles match bitwise. Timestamps are emitted as epoch
microseconds (BIGINT) to dodge timezone/representation drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import detect, events, relational, rolling, shape, signal, text, vector

# Registry order = driver execution order.  The round-3 driver truncated its
# correctness sweep at 50 queries, leaving the tail (then text/vector)
# attested only by a stale round-2 artifact.  text/vector therefore go FIRST
# so the least-recently-driver-verified block is always inside the window;
# the events/relational/signal queries are the cheapest per-query and give
# the sweep the best chance of finishing all of them too.
_MODULES = (text, vector, events, relational, signal, shape, detect, rolling)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE_SQL)
    return out
