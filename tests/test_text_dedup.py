"""MinHash+LSH near-dup path (q28) vs the brute-force exact-Jaccard oracle
(q25): LSH may only drop pairs the banding provably might miss — everything it
returns must be exactly a brute-force pair, and high-similarity pairs must
always be found."""

from __future__ import annotations

import pandas as pd

from features_engineering_of_motion_data_spark.queries.text import (
    q25_ngram_jaccard_pairs,
)
from features_engineering_of_motion_data_spark.queries.vector import (
    q28_minhash_lsh_pairs,
)


def _pairs(df: pd.DataFrame) -> set[tuple[int, int]]:
    return set(zip(df["doc_a"].tolist(), df["doc_b"].tolist()))


def test_lsh_pairs_subset_and_recall(spark, sf_dir):
    brute = q25_ngram_jaccard_pairs(spark, sf_dir).toPandas()
    lsh = q28_minhash_lsh_pairs(spark, sf_dir).toPandas()

    bp, lp = _pairs(brute), _pairs(lsh)
    # verification step makes LSH output a subset of the exact answer
    assert lp <= bp, f"LSH produced non-pairs: {lp - bp}"
    # banding recall: every pair with jaccard >= 0.6 must be found.
    # NOTE: banding theory gives ~99.9% expected recall at s=0.6 (16 bands
    # of 2 rows), not 100% — this strict assertion is pinned to the
    # deterministic fixture/seed, not a general guarantee.
    strong = _pairs(brute[brute["jaccard"] >= 0.6])
    assert strong <= lp, f"LSH missed strong pairs: {strong - lp}"
    # values for common pairs are identical (same exact-verify arithmetic)
    merged = brute.merge(lsh, on=["doc_a", "doc_b"], suffixes=("_b", "_l"))
    assert (merged["n_inter_b"] == merged["n_inter_l"]).all()
    assert (merged["jaccard_b"] == merged["jaccard_l"]).all()


def test_simhash_separates_near_dups(spark, sf_dir):
    """SimHash signatures: near-dup pairs (3-gram Jaccard ≥ 0.5) must sit at
    much smaller Hamming distance than the background pair population."""
    import numpy as np

    from features_engineering_of_motion_data_spark.queries.vector import (
        q29_simhash_docs,
    )

    sig = q29_simhash_docs(spark, sf_dir).toPandas().set_index("doc_id")["simhash60"]
    brute = q25_ngram_jaccard_pairs(spark, sf_dir).toPandas()

    def hamming(a, b):
        return bin((int(a) ^ int(b)) & ((1 << 60) - 1)).count("1")

    near = np.array(
        [hamming(sig[r.doc_a], sig[r.doc_b]) for r in brute.itertuples()]
    )
    rng = np.random.default_rng(0)
    ids = sig.index.to_numpy()
    ra, rb = rng.choice(ids, 500), rng.choice(ids, 500)
    rand = np.array(
        [hamming(sig[a], sig[b]) for a, b in zip(ra, rb) if a != b]
    )
    # the fixture's docs share one small vocabulary, so background signatures
    # correlate; separation is relative, not absolute
    assert near.max() <= 12, f"near-dup hamming too large: {near.max()}"
    assert np.median(rand) > near.max(), (
        f"no separation: background median {np.median(rand)} vs near max {near.max()}"
    )
