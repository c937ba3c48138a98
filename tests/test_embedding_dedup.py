"""LSH-bucketed embedding near-dup pairs (q34) vs the brute-force all-pairs
oracle (q30): the exact-verify step makes q34's output a strict subset of
q30's, banding must recover ≥ 0.9 of it, and values for common pairs are
bit-identical (same pinned integer-dot → cosine arithmetic)."""

from __future__ import annotations

from features_engineering_of_motion_data_spark.queries.vector import (
    q30_embedding_near_dup,
    q34_embedding_lsh_pairs,
)


def _pairs(df):
    return set(zip(df["vec_a"].tolist(), df["vec_b"].tolist()))


def test_ivf_topk_structure(spark, sf_dir):
    """IVF probe (q36) vs brute force (q26): common neighbours carry
    bit-identical cosines (same pinned arithmetic), the IVF list is sorted,
    and the probe finds a non-trivial share of the true top-k. Recall on
    this fixture is modest BY DESIGN — the synthetic embeddings don't
    cluster by label, so the label-mean coarse quantizer scatters true
    neighbours across lists; the assertion pins the deterministic floor."""
    from features_engineering_of_motion_data_spark.queries.vector import (
        q26_ann_cosine_topk,
        q36_ann_ivf_topk,
    )

    brute = q26_ann_cosine_topk(spark, sf_dir).toPandas()
    ivf = q36_ann_ivf_topk(spark, sf_dir).toPandas()
    assert len(ivf) == len(brute) == 10
    assert (ivf["cosine"].diff().dropna() <= 0).all()
    merged = brute.merge(ivf, on="vec_id", suffixes=("_b", "_i"))
    assert len(merged) >= 2  # fixture-pinned overlap floor
    assert (merged["cosine_b"] == merged["cosine_i"]).all()
    assert (merged["dot_q_b"] == merged["dot_q_i"]).all()


def test_ivf_lloyd_refined_centroids(spark, sf_dir):
    """Lloyd-refined IVF (lloyd_iters>0): still deterministic (two runs are
    bit-identical — the whole iteration is exact-integer sufficient stats +
    a pinned assignment expression), common neighbours with brute force carry
    bit-identical cosines, and recall vs q26 doesn't regress below the
    label-quantizer baseline."""
    from features_engineering_of_motion_data_spark.queries.vector import (
        q26_ann_cosine_topk,
        q36_ann_ivf_topk,
    )

    brute = q26_ann_cosine_topk(spark, sf_dir).toPandas()
    base = q36_ann_ivf_topk(spark, sf_dir).toPandas()
    ll = q36_ann_ivf_topk(spark, sf_dir, lloyd_iters=2).toPandas()
    ll2 = q36_ann_ivf_topk(spark, sf_dir, lloyd_iters=2).toPandas()
    assert ll.equals(ll2)  # deterministic training
    assert len(ll) == 10
    merged = brute.merge(ll, on="vec_id", suffixes=("_b", "_i"))
    assert (merged["cosine_b"] == merged["cosine_i"]).all()
    recall_base = len(brute.merge(base, on="vec_id"))
    recall_ll = len(merged)
    assert recall_ll >= recall_base, (recall_ll, recall_base)


def test_lsh_pairs_nondefault_banding(spark, sf_dir):
    """The q34 tuning surface (threshold/bands/band_bits as arguments): a
    non-default 8×8 parameterization still yields a subset of the brute-force
    pairs at its threshold, with bit-identical values on common pairs, and
    its candidate set is measurably more selective than 16×4's."""
    from features_engineering_of_motion_data_spark.queries.vector import (
        _emb,
        _quantized,
        lsh_candidate_pairs,
    )

    thr = 0.45
    brute = q30_embedding_near_dup(spark, sf_dir).toPandas()
    brute = brute[brute["cosine"] >= thr]
    lsh = q34_embedding_lsh_pairs(
        spark, sf_dir, threshold=thr, bands=8, band_bits=8
    ).toPandas()
    assert _pairs(lsh) <= _pairs(brute)
    merged = brute.merge(lsh, on=["vec_a", "vec_b"], suffixes=("_b", "_l"))
    assert (merged["cosine_b"] == merged["cosine_l"]).all()

    e = _quantized(_emb(spark, sf_dir)).select("vec_id", "q")
    n = e.count()
    cand_88 = lsh_candidate_pairs(e, 8, 8).count()
    cand_164 = lsh_candidate_pairs(e, 16, 4).count()
    assert cand_88 < cand_164 < n * (n - 1) / 2


def test_lsh_embedding_pairs_subset_and_recall(spark, sf_dir):
    brute = q30_embedding_near_dup(spark, sf_dir).toPandas()
    lsh = q34_embedding_lsh_pairs(spark, sf_dir).toPandas()

    bp, lp = _pairs(brute), _pairs(lsh)
    assert lp <= bp, f"LSH produced non-pairs: {lp - bp}"
    # NOTE: 0.94 expected by banding theory at cosine exactly 0.4; the
    # fixture's pair population sits above the threshold, so ≥ 0.9 holds for
    # the pinned fixture/planes seed (not a general guarantee).
    assert len(lp) >= 0.9 * len(bp), f"recall {len(lp)}/{len(bp)} < 0.9"

    merged = brute.merge(lsh, on=["vec_a", "vec_b"], suffixes=("_b", "_l"))
    assert (merged["dot_q_b"] == merged["dot_q_l"]).all()
    assert (merged["cosine_b"] == merged["cosine_l"]).all()
