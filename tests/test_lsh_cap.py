"""Hot-bucket bound for the LSH candidate self-joins (VERDICT r3 item 4).

A (band, bkey) bucket with d members yields O(d²) candidate pairs; a
duplicate-heavy corpus — exactly what near-dup dedup targets — piles
near-identical vectors into ONE bucket and the join goes quadratic in the
worst key. lsh_candidate_pairs (and q28's band join) therefore keep only
each bucket's ``bucket_cap`` smallest ids. These tests prove:

1. the candidate count stays sub-quadratic on an adversarial
   1,000-duplicate corpus (the bound is C(cap, 2) per bucket-set, not
   C(n, 2));
2. the cap does NOT change the fixture output (the default cap is far above
   any real bucket there), so every driver-checked q34/q37 row is
   unaffected;
3. capped buckets still pair the kept members (recall within the cap).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from features_engineering_of_motion_data_spark.queries.vector import (
    LSH_BUCKET_CAP,
    _emb,
    _quantized,
    lsh_candidate_pairs,
    q34_embedding_lsh_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _dup_heavy(spark, n_dups: int = 1000):
    """n_dups near-identical 64-dim vectors: every LSH band puts ALL of them
    in one bucket (identical sign patterns), the worst key possible."""
    rng = np.random.Generator(np.random.PCG64(42))
    base = rng.normal(size=64)
    rows = []
    for i in range(n_dups):
        v = base + rng.normal(scale=1e-6, size=64)  # jitter far below QUANT
        rows.append((i, [float(x) for x in v]))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return _quantized(spark.createDataFrame(rows, schema)).select("vec_id", "q")


def test_adversarial_corpus_candidates_bounded(spark):
    cap = 32
    e = _dup_heavy(spark, 1000)
    n_cand = lsh_candidate_pairs(e, bucket_cap=cap).count()
    # every band holds the same 32 smallest vec_ids -> distinct pairs are
    # exactly C(32, 2); without the cap this would be C(1000, 2) = 499,500
    assert n_cand == cap * (cap - 1) // 2, n_cand


def test_capped_bucket_still_pairs_kept_members(spark):
    cap = 8
    e = _dup_heavy(spark, 20)
    got = {
        (r.vec_a, r.vec_b)
        for r in lsh_candidate_pairs(e, bucket_cap=cap).collect()
    }
    want = {(a, b) for a in range(cap) for b in range(a + 1, cap)}
    assert got == want


def test_default_cap_leaves_fixture_output_unchanged(spark):
    uncapped = q34_embedding_lsh_pairs(spark, SF_DIR, bucket_cap=10**9)
    capped = q34_embedding_lsh_pairs(spark, SF_DIR, bucket_cap=LSH_BUCKET_CAP)
    key = lambda r: (r.vec_a, r.vec_b)  # noqa: E731
    a = sorted(uncapped.collect(), key=key)
    b = sorted(capped.collect(), key=key)
    assert len(a) > 0
    assert [(r.vec_a, r.vec_b, r.dot_q, r.cosine) for r in a] == [
        (r.vec_a, r.vec_b, r.dot_q, r.cosine) for r in b
    ]


def test_fixture_max_bucket_below_cap(spark):
    """The honesty check behind test_default_cap…: the fixture's largest
    (band, bkey) bucket is measured, not assumed, to sit under the cap."""
    from features_engineering_of_motion_data_spark.queries.vector import (
        _band_keys,
    )

    e = _quantized(_emb(spark, SF_DIR))
    sig = e.select(
        "vec_id", F.explode(_band_keys(F.col("q"))).alias("bk")
    ).select(F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    biggest = (
        sig.groupBy("band", "bkey").count().agg(F.max("count")).collect()[0][0]
    )
    assert biggest <= LSH_BUCKET_CAP, biggest


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
