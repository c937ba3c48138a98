"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``features_engineering_of_motion_data_spark.queries``;
see that package's docstring for the exact-integer bridging contract that
makes even derived doubles match DuckDB bitwise.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from features_engineering_of_motion_data_spark import queries as _q  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the A1–A8 feature aggregation at the 1h tier over the events
    stream (user_id→conv_id, value→signal), the events-fixture face of the
    transcript rollup cascade."""
    return _q.queries()["q01_tier_features_1h"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; keys absent here (e.g. MinHash LSH)
    get the driver's weaker rows-only check."""
    return _q.oracle_sql()
