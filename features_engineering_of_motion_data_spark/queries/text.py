"""Text-analysis / dedup queries over the ``documents`` fixture — the
training-data-pipeline surface (token counting, quality scoring, language-ID
heuristic, fingerprinting, exact + n-gram-Jaccard dedup).

Tokens are single-space splits (the fixture is space-joined words); all
outputs are exact integers/strings/booleans, with any derived double produced
by a pinned int→double division identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOP_EN = ["the", "a", "of", "and", "is", "to", "in"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _with_tokens(df: DataFrame) -> DataFrame:
    return df.withColumn("toks", F.split("text", " "))


# --- q20: token counting -----------------------------------------------------


def q20_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_tokens(_docs(spark, sf_dir)).select(
        "lang",
        F.size("toks").alias("n_tokens"),
        F.length("text").alias("len_chars"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.sum("len_chars").alias("sum_chars"),
        F.max("n_tokens").alias("max_tokens"),
    )


_Q20_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
FROM documents GROUP BY 1
"""


# --- q21: exact dedup via content fingerprint --------------------------------


def q21_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (hash-groupBy) dedup: md5 of whitespace-normalized lowercase
    text; keep the smallest doc_id per fingerprint."""
    fp = F.md5(
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " ").cast("binary")
    )
    return (
        _docs(spark, sf_dir)
        .withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


_Q21_SQL = """
SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""


# --- q22: language-ID heuristic (stopword hit rate) --------------------------


def q22_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop_arr = F.array(*[F.lit(s) for s in STOP_EN])
    n_stop = F.size(
        F.filter("toks", lambda t: F.array_contains(stop_arr, t))
    )
    d = _with_tokens(_docs(spark, sf_dir)).select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_tokens"),
        n_stop.alias("n_stop"),
    )
    score = F.col("n_stop").cast("double") / F.col("n_tokens").cast("double")
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_stop",
        score.alias("en_score"),
        (score >= F.lit(0.05)).alias("is_en_pred"),
    )


_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOP_EN) + "]"
_Q22_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
                         t -> list_contains({_STOP_SQL}, t))) AS n_stop
  FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_stop AS BIGINT) AS n_stop,
       CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS en_score,
       CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.05 AS is_en_pred
FROM t
"""


# --- q23: quality scoring ----------------------------------------------------


def q23_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/short-doc/dup-token quality signals aggregated per source."""
    d = _with_tokens(_docs(spark, sf_dir)).select(
        "source",
        F.length("text").alias("len_chars"),
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_tokens"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len_chars").alias("sum_chars"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.sum("n_distinct_tokens").alias("sum_distinct_tokens"),
        F.sum((F.col("len_chars") < 100).cast("long")).alias("n_short_docs"),
    )


_Q23_SQL = """
WITH t AS (
  SELECT source, length(text) AS len_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(n_distinct_tokens) AS BIGINT) AS sum_distinct_tokens,
       CAST(SUM(CASE WHEN len_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_short_docs
FROM t GROUP BY 1
"""


# --- q24: document fingerprinting (prefix shingle) ---------------------------


def q24_prefix_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_tokens(_docs(spark, sf_dir))
    fp = F.md5(F.concat_ws(" ", F.slice("toks", 1, 8)).cast("binary"))
    return d.select("doc_id", fp.alias("prefix_fp"), F.size("toks").alias("n_tokens"))


_Q24_SQL = """
SELECT doc_id,
       md5(array_to_string((string_split(text, ' '))[1:8], ' ')) AS prefix_fp,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


# --- q25: n-gram Jaccard near-dup pairs --------------------------------------

JACCARD_THRESHOLD = 0.5


def _shingles(df: DataFrame) -> DataFrame:
    """(doc_id, gram): distinct 3-token shingles per document."""
    grams = F.when(
        F.size("toks") >= 3,
        F.expr(
            "transform(sequence(1, size(toks) - 2),"
            " i -> concat_ws(' ', slice(toks, i, 3)))"
        ),
    ).otherwise(F.array())
    return (
        df.select("doc_id", F.explode(grams).alias("gram")).distinct()
    )


def q25_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact 3-gram Jaccard ≥ 0.5 — the brute oracle
    for the MinHash/LSH path (q28, rows-only). The shingle→pair join is the
    scale-path shape: candidates only materialize for docs sharing a gram."""
    g = _shingles(_with_tokens(_docs(spark, sf_dir))).cache()
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = g.alias("a")
    b = g.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_inter"))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(JACCARD_THRESHOLD))
    )
    return j.select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")


_Q25_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id, gram
  FROM toks, UNNEST(list_transform(range(1, greatest(len(t) - 1, 1)),
                    i -> array_to_string(t[i:i+2], ' '))) AS u(gram)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter,
       sa.n_grams + sb.n_grams - n_inter AS n_union,
       CAST(n_inter AS DOUBLE)
         / CAST(sa.n_grams + sb.n_grams - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE)
      / CAST(sa.n_grams + sb.n_grams - n_inter AS DOUBLE) >= {JACCARD_THRESHOLD}
"""


QUERIES = {
    "q20_token_stats": q20_token_stats,
    "q21_exact_dedup": q21_exact_dedup,
    "q22_lang_id": q22_lang_id,
    "q23_quality": q23_quality,
    "q24_prefix_fingerprint": q24_prefix_fingerprint,
    "q25_ngram_jaccard_pairs": q25_ngram_jaccard_pairs,
}

ORACLE_SQL = {
    "q20_token_stats": _Q20_SQL,
    "q21_exact_dedup": _Q21_SQL,
    "q22_lang_id": _Q22_SQL,
    "q23_quality": _Q23_SQL,
    "q24_prefix_fingerprint": _Q24_SQL,
    "q25_ngram_jaccard_pairs": _Q25_SQL,
}
