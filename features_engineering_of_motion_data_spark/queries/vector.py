"""Similarity-search / embedding queries over ``embeddings``, plus MinHash-LSH
near-dup over ``documents`` (the non-SQL-expressible scale path; rows-only
driver check — pytest compares it against the exact-Jaccard oracle q25).

Embeddings are bridged to exact integers by quantizing each float32 component
to 1e-4 (q = round(v·10⁴) as BIGINT): dot products and norms are then exact
integer sums in any engine at any parallelism, and the derived cosine is a
pinned int→double expression that matches bitwise across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import _docs, _shingles, _with_tokens

QUANT = 10_000
TOPK = 10

# MinHash/LSH parameters: 32 permutations in 16 bands of 2 rows — band match
# probability s² per band gives ≈99% recall at Jaccard 0.5 and ≈1-8e-8 at 0.8
MINHASH_PERMS = 32
LSH_BAND_ROWS = 2


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _quantized(df: DataFrame) -> DataFrame:
    # floor(x + 0.5) instead of round(): DuckDB rounds doubles half-even,
    # Spark half-away — floor of the identical double is engine-independent
    q = F.transform(
        "embedding",
        lambda v: F.floor(v.cast("double") * QUANT + F.lit(0.5)).cast("long"),
    )
    return df.withColumn("q", q)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


# --- q26: brute-force cosine top-k (ANN baseline) ----------------------------


def q26_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbours of vec_id=0 by cosine over quantized embeddings.

    Brute force IS the baseline contract (SURVEY-extension: similarity
    search); the broadcast of the single query vector makes the scan
    embarrassingly parallel — the scale path is q27's LSH bucketing.
    """
    e = _quantized(_emb(spark, sf_dir))
    qvec = e.filter(F.col("vec_id") == 0).select(F.col("q").alias("qv"))
    d = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qvec))
    d = d.select(
        "vec_id",
        "label",
        _dot(F.col("q"), F.col("qv")).alias("dot_q"),
        _dot(F.col("q"), F.col("q")).alias("na_q"),
        _dot(F.col("qv"), F.col("qv")).alias("nb_q"),
    )
    cos = F.col("dot_q").cast("double") / (
        F.sqrt(F.col("na_q").cast("double")) * F.sqrt(F.col("nb_q").cast("double"))
    )
    return (
        d.withColumn("cosine", cos)
        .orderBy(F.desc("dot_q"), F.asc("vec_id"))
        .limit(TOPK)
        .select("vec_id", "label", "dot_q", "cosine")
    )


_Q26_SQL = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
prod AS (
  SELECT e.vec_id, e.label,
         CAST(SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)
                  * CAST(floor(CAST(q.qe[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS BIGINT) AS dot_q,
         CAST(SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)
                  * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS BIGINT) AS na_q,
         CAST(SUM(CAST(floor(CAST(q.qe[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)
                  * CAST(floor(CAST(q.qe[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS BIGINT) AS nb_q
  FROM embeddings e, q, UNNEST(range(1, len(e.embedding) + 1)) AS t(i)
  WHERE e.vec_id != 0
  GROUP BY 1, 2
)
SELECT vec_id, label, dot_q,
       CAST(dot_q AS DOUBLE)
         / (sqrt(CAST(na_q AS DOUBLE)) * sqrt(CAST(nb_q AS DOUBLE))) AS cosine
FROM prod
ORDER BY dot_q DESC, vec_id ASC LIMIT {TOPK}
"""


# --- q27: per-label centroid components (vectorized column math) -------------


def q27_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _quantized(_emb(spark, sf_dir))
    return (
        e.select("label", F.posexplode("q").alias("i", "qv"))
        .groupBy("label", "i")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qv").alias("sum_q"))
    )


_Q27_SQL = f"""
SELECT label, i - 1 AS i, COUNT(*) AS n,
       CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS BIGINT) AS sum_q
FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
GROUP BY 1, 2
"""


# --- q28: MinHash + LSH near-dup candidates (rows-only driver check) ---------


def q28_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path near-dup detection: shingle → 32-perm MinHash → 8 LSH bands
    → band-bucket join → exact Jaccard verify on candidates only.

    Not ANSI-SQL-expressible (per-permutation min-hash signatures) → driver
    records a rows-only check; tests/test_text_dedup.py asserts the verified
    output equals the brute-force q25 pairs above the threshold.
    """
    from .text import JACCARD_THRESHOLD

    g = _shingles(_with_tokens(_docs(spark, sf_dir)))
    # minhash signature: for each permutation p, min over grams of
    # xxhash64(p, gram) — vectorized as explode over a small literal array
    perms = F.array(*[F.lit(i) for i in range(MINHASH_PERMS)])
    sig = (
        g.select("doc_id", "gram", F.explode(perms).alias("p"))
        .withColumn("h", F.xxhash64("p", "gram"))
        .groupBy("doc_id", "p")
        .agg(F.min("h").alias("mh"))
    )
    # LSH: band id = p div LSH_BAND_ROWS; bucket key = hash of the band rows
    band = (
        sig.withColumn("band", (F.col("p") / F.lit(LSH_BAND_ROWS)).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.xxhash64(F.sort_array(F.collect_list(F.struct("p", "mh")))).alias("bkey"))
    )
    a = band.alias("a")
    b = band.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact-Jaccard verification restricted to candidates
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    ga = g.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = g.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "nb"), "doc_b")
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_inter"))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(JACCARD_THRESHOLD))
    )
    return j.select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")


QUERIES = {
    "q26_ann_cosine_topk": q26_ann_cosine_topk,
    "q27_label_centroids": q27_label_centroids,
    "q28_minhash_lsh_pairs": q28_minhash_lsh_pairs,
}

ORACLE_SQL = {
    "q26_ann_cosine_topk": _Q26_SQL,
    "q27_label_centroids": _Q27_SQL,
    # q28 deliberately absent: MinHash signatures are not SQL-expressible →
    # rows-only driver check; exactness covered in pytest vs q25.
}
