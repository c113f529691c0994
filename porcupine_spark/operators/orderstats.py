"""Exact distributed order statistics and range-partition planning.

Two operators built on one kernel: EXACT global order statistics
without a global sort. A bounded histogram (pass 1, one map-side-
combined aggregation) locates the bin holding each requested rank;
only that bin's rows are ranked (pass 2, a broadcast-semi second
scan). The shuffle in pass 1 moves (group, bin, count) triples —
bounded by the bin count, never the data — and pass 2's window
partitions are single bins, so per-task memory is value-range/BIN_W
of the data, not all of it. This is how you take an exact median (or
any quantile) of 100 TB in two passes, and how Spark's own
repartitionByRange boundaries are planned — except here both passes
stay fully distributed and DETERMINISTIC, so the result carries an
exact SQL oracle.

The reference engine has no order-statistic surface (its folds are
streaming one-pass; SURVEY §2.4); these extend the beyond-reference
profiling family (shuffle_skew_report, ks_drift_doc_length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

BIN_W = 64  # n_chars histogram bin width (pass-1 state: max_value/64 bins)
PRICE_BIN_W = 4096  # o_totalprice bin width for the range planner
RANGE_BUCKETS = 16  # target range partitions
SAMPLE_MOD = 32  # deterministic 1/32 sample for boundary planning


def rows_at_ranks(df: DataFrame, keys: list[str], targets: DataFrame) -> DataFrame:
    """Exact rows at requested global ranks, two-pass and sort-free.

    ``df`` must carry ``_v`` (the ordered value), ``_tb`` (a unique
    tiebreak), and ``_bin`` (a long that is monotone in ``_v``, e.g.
    ``_v div W``); ``targets`` is ``keys + [q, r]`` with ``r`` the
    1-based rank of the wanted row within its key group ordered by
    ``(_v, _tb)``. Returns ``keys + [q, _v]``.

    Binning by a monotone function means rank-within-bin equals
    global rank minus the cumulative count of earlier bins, so the
    value at global rank r is the value at within-bin rank k — found
    with a row_number over ONE bin, not the group.
    """
    hist = df.groupBy(*keys, "_bin").agg(F.count(F.lit(1)).alias("_cnt"))
    wc = W.partitionBy(*keys).orderBy("_bin")
    cume = hist.select(*keys, "_bin", "_cnt", F.sum("_cnt").over(wc).alias("_cume"))
    located = (
        targets.join(cume, keys)
        .filter(
            (F.col("r") > F.col("_cume") - F.col("_cnt"))
            & (F.col("r") <= F.col("_cume"))
        )
        .select(
            *keys, "q", "_bin", (F.col("r") - F.col("_cume") + F.col("_cnt")).alias("_k")
        )
    )
    wv = W.partitionBy(*keys, "q").orderBy("_v", "_tb")
    return (
        df.join(F.broadcast(located), [*keys, "_bin"])
        .withColumn("_rn", F.row_number().over(wv))
        .filter(F.col("_rn") == F.col("_k"))
        .select(*keys, "q", "_v")
    )


@query(
    "exact_quantiles_two_pass",
    f"""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50_n_chars,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90_n_chars
    FROM ranked GROUP BY source
    """,
    tags=("orderstats", "profiling", "corpus"),
    doc=f"EXACT per-source p50/p90 document length in two passes with "
    f"no per-group sort: a div-{BIN_W} histogram (pass 1, map-side "
    f"combined, state = max_len/{BIN_W} counters per source) locates "
    f"the bin holding each target rank, then only that bin's rows "
    f"are row_number'd (pass 2, broadcast bin list). percentile() "
    f"buffers every group value per task and percentile_approx is "
    f"inexact; this is the 100 TB path to exact quantiles - per-task "
    f"memory bounded by one bin, shuffles bounded by the histogram. "
    f"Oracle = direct rank selection over a full window sort, which "
    f"the monotone-binning identity makes provably identical.",
)
def exact_quantiles_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prepared = docs.select(
        "source",
        F.col("n_chars").alias("_v"),
        F.col("doc_id").alias("_tb"),
        F.expr(f"n_chars div {BIN_W}").alias("_bin"),
    )
    totals = prepared.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    targets = totals.select(
        "source",
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("q"), F.expr("(n + 1) div 2").alias("r")
                ),
                F.struct(
                    F.lit("p90").alias("q"), F.expr("(9 * n + 9) div 10").alias("r")
                ),
            )
        ).alias("t"),
    ).select("source", "t.q", "t.r")
    picked = rows_at_ranks(prepared, ["source"], targets)
    return picked.groupBy("source").agg(
        F.max(F.when(F.col("q") == "p50", F.col("_v"))).alias("p50_n_chars"),
        F.max(F.when(F.col("q") == "p90", F.col("_v"))).alias("p90_n_chars"),
    )


@query(
    "range_partition_plan",
    f"""
    WITH s AS (
      SELECT o_totalprice AS v, o_orderkey AS tb
      FROM orders
      WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                 AS BIGINT) % {SAMPLE_MOD} = 0
    ),
    m AS (SELECT COUNT(*) AS m FROM s),
    ranked AS (SELECT v, row_number() OVER (ORDER BY v, tb) AS rn FROM s),
    bnd AS (
      SELECT i.range AS i,
             (SELECT v FROM ranked
              WHERE rn = GREATEST(1, (i.range * (SELECT m FROM m)) // {RANGE_BUCKETS}))
               AS bv
      FROM range(1, {RANGE_BUCKETS}) i
    ),
    assigned AS (
      SELECT o.o_totalprice AS v,
             (SELECT COUNT(*) FROM bnd WHERE o.o_totalprice > bnd.bv) AS bucket
      FROM orders o
    ),
    counts AS (
      SELECT bucket, COUNT(*) AS n_rows, MIN(v) AS min_price, MAX(v) AS max_price
      FROM assigned GROUP BY bucket
    ),
    tot AS (SELECT COUNT(*) AS t FROM orders)
    SELECT sp.range AS bucket,
           COALESCE(n_rows, 0) AS n_rows,
           CAST(CAST(COALESCE(n_rows, 0) AS HUGEINT) * 1000000
                // (SELECT t FROM tot) AS BIGINT) AS share_micro,
           CAST(CAST(COALESCE(n_rows, 0) AS HUGEINT) * {RANGE_BUCKETS} * 1000000
                // (SELECT t FROM tot) AS BIGINT) AS balance_micro,
           min_price, max_price
    FROM range(0, {RANGE_BUCKETS}) sp LEFT JOIN counts ON counts.bucket = sp.range
    """,
    tags=("orderstats", "profiling", "skew"),
    doc=f"Range-partition planner (the TeraSort / repartitionByRange "
    f"pattern, made deterministic and exact): a 1/{SAMPLE_MOD} "
    f"md5-keyed sample - identical on both engines, no RNG state - "
    f"yields {RANGE_BUCKETS - 1} boundary values at evenly spaced "
    f"sample ranks via the same two-pass order-statistic kernel as "
    f"exact_quantiles_two_pass (no global sort anywhere), every row "
    f"is assigned its bucket by a {RANGE_BUCKETS - 1}-element "
    f"broadcast array fold (zero shuffle), and the report verifies "
    f"the plan: per-bucket row count, share, balance factor (1e6 = "
    f"even) and value range, empty buckets kept visible - duplicate "
    f"boundaries from a hot value show up as empties next to a fat "
    f"bucket, the signal to salt before the real sort ships.",
)
def range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    h = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % SAMPLE_MOD
    )
    sample = o.filter(h == 0).select(
        F.lit(0).alias("_g"),
        F.col("o_totalprice").alias("_v"),
        F.col("o_orderkey").alias("_tb"),
        F.floor(F.col("o_totalprice") / PRICE_BIN_W).cast("long").alias("_bin"),
    )
    m = sample.agg(F.count(F.lit(1)).alias("m"))
    targets = (
        spark.range(1, RANGE_BUCKETS)
        .select(F.lit(0).alias("_g"), F.col("id").alias("q"))
        .crossJoin(F.broadcast(m))
        .select(
            "_g",
            "q",
            F.greatest(F.lit(1).cast("long"), F.expr(f"(q * m) div {RANGE_BUCKETS}")).alias("r"),
        )
    )
    boundaries = rows_at_ranks(sample, ["_g"], targets)
    barr = boundaries.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("q"), F.col("_v")))),
            lambda s: s["_v"],
        ).alias("bs")
    )
    assigned = o.crossJoin(F.broadcast(barr)).select(
        F.col("o_totalprice").alias("v"),
        F.aggregate(
            "bs",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(F.col("o_totalprice") > x, 1).otherwise(0),
        ).alias("bucket"),
    )
    counts = assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("v").alias("min_price"),
        F.max("v").alias("max_price"),
    )
    tot = o.agg(F.count(F.lit(1)).alias("t"))
    spine = spark.range(RANGE_BUCKETS).select(F.col("id").alias("bucket"))
    return (
        spine.join(counts, "bucket", "left")
        .withColumn("n_rows", F.coalesce(F.col("n_rows"), F.lit(0).cast("long")))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_rows",
            F.expr("CAST(n_rows AS DECIMAL(38,0)) * 1000000 div t")
            .cast("long")
            .alias("share_micro"),
            F.expr(
                f"CAST(n_rows AS DECIMAL(38,0)) * {RANGE_BUCKETS} * 1000000 div t"
            )
            .cast("long")
            .alias("balance_micro"),
            "min_price",
            "max_price",
        )
    )


DECILES = 10


@query(
    "length_decile_assign",
    f"""
    WITH hist AS (
      SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars
    ),
    cum AS (
      SELECT n_chars,
             SUM(cnt) OVER (ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS lo
      FROM hist
    ),
    tot AS (SELECT COUNT(*) AS n FROM documents)
    SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,
           CAST(cum.lo * {DECILES} // tot.n AS BIGINT) AS decile
    FROM documents d JOIN cum USING (n_chars), tot
    """,
    tags=("orderstats", "curation", "sampling"),
    doc=f"Per-document EXACT length decile without a global sort — the "
    "rank-based bucketing a curriculum/mixing pipeline needs (train on "
    "short docs first, cap the long tail, stratify evals by length). "
    "decile = floor(lowest-tied-rank * 10 / n) from the VALUE "
    "histogram's cumulative counts (same kernel as the two-pass "
    "quantiles above): deterministic — equal lengths always share a "
    "decile (ntile() would split ties by partition order, which is "
    "neither stable nor oracle-able). The only ordered window runs "
    "over the bounded distinct-length histogram; docs join the decile "
    "back by VALUE (broadcast: the histogram is |distinct lengths|).",
)
def length_decile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    wc = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, 0)
    cum = hist.select(
        "n_chars", (F.sum("cnt").over(wc) - F.col("cnt")).alias("lo")
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    return (
        docs.join(F.broadcast(cum), "n_chars")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.floor((F.col("lo") * F.lit(DECILES)) / F.col("n"))
            .cast("long")
            .alias("decile"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order layout audit (query-backed face of functions/zorder.py)

from porcupine_spark.plans.relational import sql_dsum  # noqa: E402

ZO_BITS = 8  # 8 bits per dimension -> 16-bit Morton code
ZO_TILE_SHIFT = 8  # keep the top 4 bits of each dim -> 16x16 grid of tiles


def _sql_morton(x: str, y: str, bits: int = ZO_BITS) -> str:
    """DuckDB mirror of functions.zorder.z_interleave: explicit
    shift/and/or chain, bit 2i = x's bit i, bit 2i+1 = y's bit i."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "zorder_layout_audit",
    f"""
    WITH coded AS (
      SELECT o_custkey % 256 AS x,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 256 AS y,
             o_totalprice
      FROM orders
    ),
    z AS (
      SELECT x, y, o_totalprice,
             ({_sql_morton('x', 'y')}) >> {ZO_TILE_SHIFT} AS tile
      FROM coded
    )
    SELECT tile,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y
    FROM z GROUP BY tile
    """,
    tags=("layout", "zorder", "profiling"),
    doc="Z-order (Morton) layout audit for the 2-hot-column case "
    "(customer x order-day): interleave the low 8 bits of each, key "
    "files by the top 4+4 bits -> 256 tiles. The audit PROVES the "
    "data-skipping property the write path (functions/zorder.py "
    "write_zordered) relies on: every tile's min/max span is <= 16 in "
    "BOTH dimensions, so a predicate on EITHER column prunes ~15/16 "
    "of the files via parquet footer stats - the Delta OPTIMIZE "
    "ZORDER / Hudi clustering idea, built from plain codegen'd bit "
    "arithmetic (no UDF). One shuffle (the 256-key agg); at 100 TB "
    "the same expression feeds repartitionByRange(z) at write time.",
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from porcupine_spark.functions.zorder import z_interleave
    from porcupine_spark.plans.relational import dsum

    o = load_table(spark, sf_dir, "orders")
    coded = o.select(
        F.pmod(F.col("o_custkey"), F.lit(256)).alias("x"),
        F.pmod(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")),
            F.lit(256),
        ).alias("y"),
        "o_totalprice",
    )
    z = coded.select(
        "x",
        "y",
        "o_totalprice",
        F.shiftright(z_interleave(F.col("x"), F.col("y"), bits=ZO_BITS), ZO_TILE_SHIFT).alias(
            "tile"
        ),
    )
    return z.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        # datediff yields int32 — widen to long to match the oracle's BIGINT
        F.min("y").cast("long").alias("min_y"),
        F.max("y").cast("long").alias("max_y"),
    )
