"""Distinct-counting sketches with exact oracles.

The reference has no sketch layer (its folds are exact; SURVEY §2.4),
but a 100 TB curation pipeline lives on cardinality estimates —
vocabulary sizes, per-source distinct tokens, join-key cardinalities
for planning. The sketch of choice here is KMV (k-minimum values,
Bar-Yossef et al. 2002): keep the k smallest hash values of the
distinct set; the k-th smallest h_k estimates the cardinality as
(k-1) * M / h_k for hashes uniform on [1, M). Unlike HyperLogLog,
KMV's state and estimate are PURE integer/order statistics — both
engines compute them bit-identically, so the estimator itself gets an
exact oracle (the same verification posture as
minhash_estimator_calibration).

Scale posture: the production sketch keeps k values per group via
partial aggregation (k smallest of a union of k-smallest sets —
mergeable, one combine tree, no distinct shuffle). The REGISTERED
query is the calibration report (estimate next to exact), which needs
the exact side anyway; its window-over-distinct shape matches that
requirement, not the sketch's production cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from porcupine_spark.operators.text import tokens
from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

KMV_K = 64  # sketch size: relative error ~ 1/sqrt(k-2) ~ 13%
KMV_M = 1 << 60  # hash domain: 60-bit md5 prefix (both engines exact)


@query(
    "kmv_distinct_estimate",
    f"""
    WITH toks AS (
      SELECT DISTINCT source,
             CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM (SELECT source,
                   UNNEST(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    ranked AS (
      SELECT source, h,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n_exact
      FROM toks
    )
    SELECT source,
           CAST(n_exact AS BIGINT) AS n_distinct_exact,
           CAST(CASE WHEN n_exact < {KMV_K} THEN n_exact
                     ELSE CAST({KMV_K - 1} AS HUGEINT) * {KMV_M} // h
                END AS BIGINT) AS kmv_estimate,
           CAST(CASE WHEN n_exact < {KMV_K} THEN 0
                     ELSE ABS(CAST({KMV_K - 1} AS HUGEINT) * {KMV_M} // h - n_exact)
                          * 1000000 // n_exact
                END AS BIGINT) AS abs_err_micro
    FROM ranked
    WHERE rk = CASE WHEN n_exact < {KMV_K} THEN n_exact ELSE {KMV_K} END
    """,
    tags=("sketch", "monitoring", "corpus"),
    doc=f"KMV distinct-token estimator calibration per source: the "
    f"k-th smallest (k={KMV_K}) 60-bit token hash yields the "
    f"cardinality estimate (k-1)*2^60 div h_k, reported next to the "
    f"exact distinct count with the relative error in integer "
    f"micro-units (truncating div - the repo's exact-ratio recipe). "
    f"Order statistics + integer division are bit-identical across "
    f"engines, so a SKETCH gets an exact oracle. Production keeps "
    f"only the k minima per group (mergeable partial aggregate, no "
    f"distinct shuffle); this calibration query pays the exact side "
    f"deliberately - it exists to tell you whether k is sized right "
    f"before trusting the sketch at 100 TB.",
)
def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            tokens(F.col("text"))
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    hashed = toks.select(
        "source",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    ).distinct()
    wr = W.partitionBy("source").orderBy("h")
    wc = W.partitionBy("source")
    ranked = hashed.select(
        "source",
        "h",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n_exact"),
    )
    at_k = ranked.filter(
        F.col("rk")
        == F.when(F.col("n_exact") < KMV_K, F.col("n_exact")).otherwise(F.lit(KMV_K))
    )
    est = F.when(F.col("n_exact") < KMV_K, F.col("n_exact").cast("decimal(38,0)")).otherwise(
        F.expr(f"CAST({KMV_K - 1} AS DECIMAL(38,0)) * {KMV_M} div h")
    )
    err = F.when(F.col("n_exact") < KMV_K, F.lit(0).cast("decimal(38,0)")).otherwise(
        F.expr(
            f"abs(CAST({KMV_K - 1} AS DECIMAL(38,0)) * {KMV_M} div h - n_exact)"
            " * 1000000 div n_exact"
        )
    )
    return at_k.select(
        "source",
        F.col("n_exact").alias("n_distinct_exact"),
        est.cast("long").alias("kmv_estimate"),
        err.cast("long").alias("abs_err_micro"),
    )


MG_CAPACITY = 2000  # Misra-Gries counters per partition


def mg_summarize(counts: dict, cap: int) -> dict:
    """Reduce a counter dict to ``cap`` entries by the Misra-Gries /
    mergeable-summaries rule (Agarwal et al. 2012): subtract the
    (cap+1)-th largest count from everything, drop non-positives.
    Underestimates each survivor by at most (input mass)/(cap+1)."""
    if len(counts) <= cap:
        return counts
    m = sorted(counts.values(), reverse=True)[cap]
    return {t: c - m for t, c in counts.items() if c - m > 0}


@query(
    "frequent_tokens_mg",
    rf"""
    WITH toks AS (
      SELECT tok FROM (SELECT string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks FROM documents),
           LATERAL (SELECT UNNEST(toks) AS tok)
      WHERE tok <> ''
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT tok, COUNT(*) AS n_occurrences
    FROM toks
    GROUP BY tok
    HAVING COUNT(*) * {MG_CAPACITY + 1} > (SELECT n FROM tot)
    """,
    tags=("sketch", "corpus", "vocab"),
    doc=f"All tokens above frequency N/{MG_CAPACITY + 1}, found WITHOUT "
    f"a full-vocabulary shuffle: each partition keeps a "
    f"{MG_CAPACITY}-counter Misra-Gries summary (mergeable-summaries "
    f"guarantee: any token with global count > N/(cap+1) survives in "
    f"at least one partition's candidate set), the tiny candidate "
    f"union is broadcast back, and only candidates are exactly "
    f"recounted and thresholded (the grand total N rides the sketch "
    f"pass as per-partition mass, so the corpus is scanned exactly "
    f"twice: sketch + recount) - so the OUTPUT is exact and "
    f"partition-independent while the shuffle moves candidate tokens "
    f"only (bounded by partitions x cap), not the vocabulary. The "
    f"100 TB heavy-hitters pattern: sketch to find, recount to "
    f"verify. Oracle = the same threshold over full counts, which "
    f"the MG completeness guarantee makes identical.",
)
def frequent_tokens_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            tokens(F.col("text"))
        ).alias("tok")
    ).filter(F.col("tok") != "")

    def mg_partition(it):
        import pandas as pd

        # One extra sentinel row (tok=NULL) carries the partition's total
        # token mass, so the grand total N rides along with the sketch pass
        # instead of costing a third full corpus scan. A real token can
        # never be NULL (explode of a split array yields strings).
        counts: dict = {}
        mass = 0
        for pdf in it:
            mass += len(pdf)
            for t, c in pdf["tok"].value_counts().items():
                counts[t] = counts.get(t, 0) + int(c)
            counts = mg_summarize(counts, MG_CAPACITY)
        yield pd.DataFrame(
            {
                "tok": list(counts.keys()) + [None],
                "mass": [0] * len(counts) + [mass],
            }
        )

    # Bounded by partitions x (cap+1) rows; localCheckpoint materializes it
    # once so candidates and the total don't each re-run the corpus scan.
    summary = toks.mapInPandas(
        mg_partition, schema="tok string, mass long"
    ).localCheckpoint()
    candidates = summary.filter(F.col("tok").isNotNull()).select("tok").distinct()
    total = summary.filter(F.col("tok").isNull()).agg(F.sum("mass").alias("n"))
    return (
        toks.join(F.broadcast(candidates), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * (MG_CAPACITY + 1) > F.col("n"))
        .select("tok", "n_occurrences")
    )
