"""Scalar-quantized (int8) ADC retrieval and its recall audit.

``embedding_quantization_error`` (operators/similarity.py) measures the
RECONSTRUCTION cost of int8; this module measures the RETRIEVAL cost —
the number that actually licenses shipping quantized vectors at 100 TB
(int8 cuts the candidate-scan bytes 4x and turns the scoring inner loop
into integer MACs):

- ``sq8_topk``: asymmetric-distance-style top-k where BOTH sides are
  symmetric int8 (one global scale from the corpus max-|element|), the
  score is an exact integer dot product, and ranking is deterministic
  (score desc, neighbor_id) — bit-stable across engines with no decimal
  machinery at all, because every quantity is an integer.
- ``sq8_adc_recall``: recall@5 of that quantized retrieval against the
  exact-decimal brute-force baseline (cosine_topk), per query — the
  same composed-oracle construction as lsh_recall_at_k.

Scale posture: quantization is a per-row map (no shuffle). The scoring
join broadcasts the <=10-query set; the per-query top-k shuffles only
(query_id, neighbor_id, integer score). At 100 TB this brute-force scan
is the RECALL REFERENCE; production retrieval composes the same int8
scoring into ivf_topk's bucket pruning (score only the probed cells).
The reference repo has no vector ops (it is a task/IO framework); this
family is beyond-reference surface — see SURVEY.md §2 addendum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from porcupine_spark.operators.similarity import cosine_topk
from porcupine_spark.plans.registry import REGISTRY as _REG
from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

N_QUERIES = 10
TOPK = 5

# Global symmetric scale: qmax = max |element| over the corpus; each
# element quantizes to floor(v * 127 / qmax) in [-127, 127]. floor (not
# round) because FLOOR(double) is identically defined in Spark and
# DuckDB; the 1-ulp asymmetry vs round-half-even is irrelevant to a
# recall audit and buys bit-stable cross-engine integers.
_SQL_QMAX = (
    "SELECT CAST(MAX(list_max(list_transform(embedding, v -> abs(v))))"
    " AS DOUBLE) AS qmax FROM embeddings"
)
_SQL_Q8 = (
    "list_transform({col}, v -> "
    "CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / qmax) AS BIGINT))"
)


def _q8(col, qmax):
    return F.transform(
        col, lambda v: F.floor(v.cast("double") * F.lit(127.0) / qmax).cast("long")
    )


@query(
    "sq8_topk",
    f"""
    WITH m AS ({_SQL_QMAX}),
    q AS (
      SELECT vec_id AS query_id, {_SQL_Q8.format(col='embedding')} AS qq
      FROM embeddings, m WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS neighbor_id, {_SQL_Q8.format(col='embedding')} AS qc
      FROM embeddings, m
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST(list_sum(list_transform(list_zip(qq, qc),
               p -> p[1] * p[2])) AS BIGINT) AS score
      FROM q CROSS JOIN c
      WHERE query_id <> neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, score
    FROM ranked WHERE rank <= {TOPK}
    """,
    tags=("similarity", "ann", "quantization"),
    doc=f"Int8 symmetric-quantized top-{TOPK} retrieval for the broadcast "
    f"query set (vec_id < {N_QUERIES}): one global scale (corpus "
    "max-|element|, a 1-row broadcast), per-element floor quantization, "
    "and a PURE-INTEGER dot-product score — deterministic ranks with "
    "zero decimal arithmetic. The production pairing is this scoring "
    "inside ivf_topk's probed cells; standalone it is the quantized "
    "recall reference sq8_adc_recall audits.",
)
def sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qmax_df = emb.agg(
        F.max(F.array_max(F.transform("embedding", lambda v: F.abs(v))))
        .cast("double")
        .alias("qmax")
    )
    with_scale = emb.crossJoin(F.broadcast(qmax_df))
    cand = with_scale.select(
        F.col("vec_id").alias("neighbor_id"),
        _q8(F.col("embedding"), F.col("qmax")).alias("qc"),
    )
    qset = with_scale.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        _q8(F.col("embedding"), F.col("qmax")).alias("qq"),
    )
    scored = (
        cand.crossJoin(F.broadcast(qset))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with("qq", "qc", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id", "rank", "score")
    )


@query(
    "sq8_adc_recall",
    None,  # late-bound below: composes cosine_topk's and sq8_topk's oracles
    tags=("similarity", "quantization", "evaluation", "monitoring"),
    doc=f"Recall@{TOPK} of int8-quantized retrieval against the exact-"
    "decimal brute-force baseline, per query — the acceptance gate for "
    "shipping quantized vectors (pair with embedding_quantization_error "
    "for the reconstruction view; this is the end-to-end retrieval "
    "view). Composes the two verified builders; the comparison joins "
    f"two (|queries| x {TOPK})-row lists — constant-size beyond the "
    "retrieval passes.",
)
def sq8_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_exact")
    )
    approx = sq8_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("in_sq8")
    )
    m = exact.join(approx, ["query_id", "neighbor_id"], "full_outer")
    return m.groupBy("query_id").agg(
        F.sum(F.coalesce("in_exact", F.lit(0))).cast("long").alias("n_exact"),
        F.sum(F.coalesce("in_sq8", F.lit(0))).cast("long").alias("n_sq8"),
        F.sum(
            F.when(F.col("in_exact").isNotNull() & F.col("in_sq8").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_hits"),
        F.expr(
            "CAST(SUM(CASE WHEN in_exact IS NOT NULL AND in_sq8 IS NOT NULL"
            " THEN 1 ELSE 0 END) * 1000000"
            " div SUM(CASE WHEN in_exact IS NOT NULL THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("recall_micro"),
    )


_REG["sq8_adc_recall"].oracle = f"""
    WITH e AS (SELECT query_id, neighbor_id FROM ({_REG["cosine_topk"].oracle})),
    s AS (SELECT query_id, neighbor_id FROM ({_REG["sq8_topk"].oracle})),
    m AS (
      SELECT COALESCE(e.query_id, s.query_id) AS query_id,
             CASE WHEN e.query_id IS NOT NULL THEN 1 END AS in_exact,
             CASE WHEN s.query_id IS NOT NULL THEN 1 END AS in_sq8
      FROM e FULL OUTER JOIN s
        ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id
    )
    SELECT query_id,
           CAST(SUM(CASE WHEN in_exact IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN in_sq8 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_sq8,
           CAST(SUM(CASE WHEN in_exact IS NOT NULL AND in_sq8 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN in_exact IS NOT NULL AND in_sq8 IS NOT NULL THEN 1 ELSE 0 END) * 1000000
                // SUM(CASE WHEN in_exact IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS recall_micro
    FROM m GROUP BY query_id
"""
