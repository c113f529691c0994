"""Core relational operator surface (SURVEY.md §2.2–§2.7).

Every query here compiles to built-in DataFrame ops (Catalyst handles
pushdown/pruning/join selection); each has a matching DuckDB oracle.

Reproducibility note (applies to every aggregate below, both engines):
per-row arithmetic stays in DOUBLE (IEEE ops are exact-rounded, so both
engines produce bit-identical per-row values), but SUM/AVG go through
``DECIMAL(38,6)`` and cast back to DOUBLE afterwards. Decimal addition
is exact and associative, so the result does not depend on Spark's
partial-aggregation order vs DuckDB's sequential order — the harness'
value hash sees identical doubles.

Reference parity citations are on each query (file:line into
/root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

DEC = "decimal(38,6)"


def dsum(col: F.Column) -> F.Column:
    """Order-independent sum of a double expression (see module note)."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: F.Column) -> F.Column:
    return (F.sum(col.cast(DEC)).cast("double") / F.count(F.lit(1))).cast("double")


# SQL mirrors of dsum/davg (kept textually tiny so oracles stay readable)
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST({sql_dsum(expr)} / COUNT(*) AS DOUBLE)"


# ---------------------------------------------------------------------------
# §2.4 folds / aggregations
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "fold", "flagship"),
    doc="TPC-H Q1 shape: the applicative multi-fold (FoldA <*>) compiled to "
    "one grouped agg pass. Reference: FoldA Applicative, "
    "porcupine-core/src/Control/Arrow/FoldA.hs:118-130.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_multi_fold",
    f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(DISTINCT c_mktsegment) AS n_segments,
           {sql_dsum('c_acctbal')} AS total_acctbal,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM customer
    """,
    tags=("agg", "fold"),
    doc="Radon-example applicative fold: Summary <$> L.length <*> (premap "
    "state L.nub) <*> ... in ONE pass (examples/example-radon/"
    "ExampleRadon.hs:71-79) -> single ungrouped agg with N expressions.",
)
def agg_multi_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        dsum(F.col("c_acctbal")).alias("total_acctbal"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


@query(
    "grouped_fold_premap",
    f"""
    SELECT c_mktsegment,
           {sql_dsum('CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END')} AS pos_bal,
           COUNT(*) FILTER (WHERE c_acctbal > 0) AS n_pos,
           COUNT(*) AS n_all
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "fold"),
    doc="premapMaybe/prefilterA before a fold (Repetition/Foldl.hs:136-145, "
    "FoldA.hs:159-169): select/filter fused into the agg pass.",
)
def grouped_fold_premap(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    pos = F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).otherwise(F.lit(0.0))
    return c.groupBy("c_mktsegment").agg(
        dsum(pos).alias("pos_bal"),
        F.count(F.when(F.col("c_acctbal") > 0, 1)).alias("n_pos"),
        F.count(F.lit(1)).alias("n_all"),
    )


# ---------------------------------------------------------------------------
# §2.2 projections / filters / scalar transforms
# ---------------------------------------------------------------------------


@query(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity < 25
    """,
    tags=("filter", "project"),
    doc="arr f / filterTask: pure projection+predicate (PTask arr instance "
    "PTask/Internal.hs:113-119; filterTask Repetition.hs:82-89). Pushdown: "
    "all three predicates reach the parquet scan.",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 joins (full Spark join surface; reference's index-aligned loads)
# ---------------------------------------------------------------------------


@query(
    "join_customer_orders",
    f"""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           COUNT(o.o_orderkey) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS revenue
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY n.n_name, c.c_mktsegment
    """,
    tags=("join", "agg"),
    doc="Index-aligned load join (loadDataList pairing idx->record, "
    "VirtualFileAccess.hs:103-111) generalized: fact-dim join with "
    "broadcast nation (25 rows at any SF).",
)
def join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


@query(
    "q3_shipping_priority",
    f"""
    SELECT o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP_NS) AS o_orderdate, o.o_orderpriority,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    doc="TPC-H Q3 shape: 3-way join, grouped fold, deterministic top-10 "
    "(revenue is exact decimal -> same ordering both engines; orderkey "
    "tiebreak).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    f"""
    SELECT n.n_name AS nation,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("join", "agg"),
    doc="TPC-H Q5 shape: 6-way join with broadcast dims (region/nation/"
    "supplier) and the local-supplier equi-constraint.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == F.col("l_suppkey")) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "semi_join_active_customers",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
    tags=("join",),
    doc="left_semi join (EXISTS). No reference analogue (no relational "
    "joins, SURVEY §2.3); part of the full Spark join surface we ship.",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "anti_join_idle_customers",
    """
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    tags=("join",),
    doc="left_anti join (NOT EXISTS): customers with no urgent orders.",
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_acctbal")


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / set ops; §1.4 layered merge
# ---------------------------------------------------------------------------


@query(
    "orderby_limit",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
    tags=("sort",),
    doc="Global sort + limit (TakeOrderedAndProject physical op: no full "
    "sort materialized, per-partition top-k then merge).",
)
def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(25)
    )


@query(
    "set_ops",
    """
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big_spenders AS (
           SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
         )
    SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM big_spenders)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM big_spenders)
    """,
    tags=("setop",),
    doc="union / intersect / except builtins (reference has none on data, "
    "SURVEY §2.6; its Semigroup merges are config-level).",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    spenders = (
        o.filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    inter = building.intersect(spenders).select(F.lit("intersect").alias("op"), "c_custkey")
    exc = building.subtract(spenders).select(F.lit("except").alias("op"), "c_custkey")
    return inter.unionByName(exc)


@query(
    "layered_merge_right_biased",
    """
    WITH base AS (
      SELECT c_custkey, c_name, c_acctbal, 0 AS layer FROM customer
    ),
    override AS (
      SELECT c_custkey, upper(c_name) AS c_name, c_acctbal * 2 AS c_acctbal, 1 AS layer
      FROM customer WHERE c_custkey % 5 = 0
    ),
    merged AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY layer DESC) AS rn
      FROM (SELECT * FROM base UNION ALL SELECT * FROM override)
    )
    SELECT c_custkey, c_name, c_acctbal FROM merged WHERE rn = 1
    """,
    tags=("layers", "setop", "window"),
    doc="Layered read with right-biased merge (LayeredReadScheme, "
    "VirtualFile.hs:75-81; merge loop PorcupineTree.hs:614-636): reads "
    "merge keyed last-layer-wins -> unionByName + keep-last window dedup. "
    "The 'override' layer is derived here; in the engine it is a second "
    "physical location bound to the same virtual path.",
)
def layered_merge_right_biased(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    base = c.select("c_custkey", "c_name", "c_acctbal", F.lit(0).alias("layer"))
    override = (
        c.filter(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey",
            F.upper("c_name").alias("c_name"),
            (F.col("c_acctbal") * 2).alias("c_acctbal"),
            F.lit(1).alias("layer"),
        )
    )
    w = W.partitionBy("c_custkey").orderBy(F.desc("layer"))
    return (
        base.unionByName(override)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# §2.5 window functions
# ---------------------------------------------------------------------------


@query(
    "window_sliding_mean",
    f"""
    SELECT user_id, event_id, value,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING)
             AS sliding_mean
    FROM events
    """,
    tags=("window",),
    doc="The msliding-10 + avg hand-rolled window of example2 "
    "(Example2.hs:40-55) as a proper frame: ROWS BETWEEN CURRENT AND 9 "
    "FOLLOWING. decimal-sum/count instead of avg() so sliding-frame "
    "accumulator optimizations can't perturb float bits.",
)
def window_sliding_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(0, 9)
    mean = (F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count(F.lit(1)).over(w))
    return ev.select("user_id", "event_id", "value", mean.alias("sliding_mean"))


@query(
    "window_rank_lag",
    """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
           LAG(o_orderkey) OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
    doc="Ranking/analytic builtins exposed by the engine (SURVEY §2.5: "
    "Spark builtins, nothing to port).",
)
def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(wp).cast("long").alias("price_rank"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@query(
    "topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
    doc="Top-K per group: window row_number <= K (the scale-safe pattern; "
    "no per-group collect).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# pivot / rollup / cube (free builtins the reference lacks, SURVEY §2.4 note)
# ---------------------------------------------------------------------------


@query(
    "pivot_status",
    f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
    doc="Pivot compiled to FILTERed aggregates (one pass, no extra "
    "shuffle).",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum(F.col("l_quantity")))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@query(
    "rollup_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
    doc="ROLLUP grouping sets (free builtin; reference has none, SURVEY "
    "§2.4 note). GROUPING() flags disambiguate data-nulls from "
    "subtotal-nulls.",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_rf"),
        F.grouping("l_linestatus").cast("long").alias("g_ls"),
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# §2.7 repetition / index ranges
# ---------------------------------------------------------------------------


@query(
    "index_range_letter_counts",
    """
    WITH idx AS (
      SELECT * FROM (SELECT UNNEST(GENERATE_SERIES(0, 10)) AS i)
      UNION ALL
      SELECT * FROM (SELECT UNNEST(GENERATE_SERIES(50, 60)) AS i)
    ),
    chars AS (
      SELECT c.c_custkey, lower(substr(c.c_name, s.pos, 1)) AS letter
      FROM customer c
      JOIN idx ON c.c_custkey = idx.i,
      LATERAL (SELECT UNNEST(GENERATE_SERIES(1, length(c.c_name))) AS pos) s
    )
    SELECT c_custkey, letter, COUNT(*) AS cnt
    FROM chars
    WHERE letter BETWEEN 'a' AND 'z'
    GROUP BY c_custkey, letter
    """,
    tags=("repetition", "explode"),
    doc="example1 end-to-end: IndexRange '[0..10,50..60]' (Repetition.hs:"
    "114-181) -> index DataFrame joined against the keyed source "
    "(loadDataList, VirtualFileAccess.hs:103-111), per-index letter-count "
    "analysis (Example1.hs:37-40) with the HashMap result exploded to "
    "rows. Index list is a broadcast join side.",
)
def index_range_letter_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from porcupine_spark.repetition import parse_index_range, indices_dataframe

    idxs = parse_index_range("[0..10,50..60]")
    idx_df = indices_dataframe(spark, idxs).withColumnRenamed("idx", "i")
    c = load_table(spark, sf_dir, "customer")
    joined = c.join(F.broadcast(idx_df), c.c_custkey == F.col("i"))
    chars = joined.select(
        "c_custkey",
        F.explode(F.split(F.lower("c_name"), "")).alias("letter"),
    )
    return (
        chars.filter((F.col("letter") >= "a") & (F.col("letter") <= "z"))
        .groupBy("c_custkey", "letter")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "cube_agg",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_st, GROUPING(o_orderpriority) AS g_pr,
           COUNT(*) AS n, {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
    doc="CUBE grouping sets (free builtin beyond the reference, SURVEY "
    "§2.4 note): one pass expands to 4 grouping sets, partial aggs "
    "map-side.",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_st"),
        F.grouping("o_orderpriority").cast("long").alias("g_pr"),
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("o_totalprice")).alias("total"),
    )


@query(
    "having_groups",
    f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15 AND {sql_dsum('o_totalprice')} > 2000000
    """,
    tags=("agg", "having"),
    doc="Grouped fold + post-aggregation predicate (HAVING == filter "
    "after agg; Catalyst keeps it in the same stage).",
)
def having_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("spend"),
        )
        .filter((F.col("n_orders") >= 15) & (F.col("spend") > 2000000))
    )


@query(
    "unpivot_metrics",
    """
    SELECT l_orderkey, l_linenumber, metric, value
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem WHERE l_orderkey < 100
    ) UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
    tags=("unpivot",),
    doc="Unpivot/melt (stack): wide metric columns to (metric, value) "
    "rows — row count x3, no shuffle.",
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice, "
            "'l_discount', l_discount) AS (metric, value)"
        ),
    )


@query(
    "percentile_by_group",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.9) AS p90,
           MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
    doc="Exact percentiles per group (sort-based; both engines use "
    "linear interpolation on the sorted values, so results are "
    "bit-identical). The at-scale variant is approx_percentile "
    "(t-digest sketch) - engine-specific, hence not oracled.",
)
def percentile_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )


@query(
    "sql_api_q6",
    """
    SELECT
      CAST(SUM(CAST((l_extendedprice * l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        AS potential_revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("sql", "agg", "flagship"),
    doc="TPC-H Q6 shape issued through spark.sql on registered views — "
    "the SQL-API twin of the DataFrame surface (Catalyst emits the same "
    "plan either way; this query exists to exercise that path).",
)
def sql_api_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q6")
    return spark.sql(
        """
        SELECT
          CAST(SUM(CAST((l_extendedprice * l_discount) AS DECIMAL(38,6))) AS DOUBLE)
            AS potential_revenue,
          COUNT(*) AS n_lines
        FROM lineitem_q6
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
        """
    )


@query(
    "q17_small_quantity_revenue",
    f"""
    WITH part_avg AS (
      SELECT l_partkey, {sql_davg('l_quantity')} AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum('l.l_extendedprice')} AS total_price,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part_avg pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.4 * pa.avg_qty
    """,
    tags=("join", "agg", "subquery"),
    doc="TPC-H Q17 shape: correlated avg-quantity subquery decorrelated "
    "into a grouped pre-aggregate + equi-join (what Catalyst's "
    "decorrelation produces; written explicitly so the shuffle story "
    "is visible: two shuffles on l_partkey, AQE-coalesced).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(davg(F.col("l_quantity")).alias("avg_qty"))
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(
            dsum(F.col("l_extendedprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "events_props_json",
    f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_dsum("CAST(json_extract_string(props, '$.k') AS INT)")} AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "agg"),
    doc="Semi-structured column parsing: the events.props JSON string "
    "parsed in-flight (get_json_object / json_extract) and aggregated "
    "per type. At scale, repeated extraction is better done once via "
    "from_json to a struct column - shown here with the per-field "
    "extractor since only one key is touched.",
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "monthly_order_stats",
    f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP_NS) AS month,
           o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
    """,
    tags=("agg", "date"),
    doc="Calendar bucketing: date_trunc to month + grouped rollup — the "
    "partition-column shape (at scale, orders would be written "
    "partitionBy(month) and this query becomes partition-pruned).",
)
def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


@query(
    "nation_segment_sets",
    """
    SELECT n.n_name AS nation,
           array_to_string(list_sort(list_distinct(list(c.c_mktsegment))), ',')
             AS segments,
           COUNT(DISTINCT c.c_mktsegment) AS n_segments
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    tags=("agg", "collect"),
    doc="collect_set fold (the reference's L.nub, ExampleRadon.hs:76-79) "
    "per group; the set is emitted sorted+joined as a string so the "
    "value hash is representation-independent.",
)
def nation_segment_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


@query(
    "ntile_quartiles",
    f"""
    WITH q AS (
      SELECT c_custkey, c_acctbal,
             NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    )
    SELECT quartile, COUNT(*) AS n,
           MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi,
           {sql_dsum('c_acctbal')} AS total
    FROM q GROUP BY quartile
    """,
    tags=("window", "agg"),
    doc="NTILE bucketing + per-bucket rollup (deterministic global "
    "order via acctbal+custkey tiebreak). No single-task window: the "
    "global rank is distributed (functions/topk.global_rank — range-"
    "partition + partitioned row_number + |partitions|-integer "
    "offsets, the zipWithIndex pattern) and the NTILE bucket is exact "
    "integer arithmetic on (rank, n), byte-identical to the window "
    "function at any customer count.",
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from porcupine_spark.functions.topk import global_rank, ntile_from_rank

    c = load_table(spark, sf_dir, "customer")
    ranked, n, _ = global_rank(
        c.select("c_custkey", "c_acctbal"),
        [F.asc("c_acctbal"), F.asc("c_custkey")],
    )
    q = ranked.select(
        "c_acctbal", ntile_from_rank("rk", n, 4).cast("long").alias("quartile")
    )
    return q.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
        dsum(F.col("c_acctbal")).alias("total"),
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "agg", "exists"),
    doc="TPC-H Q4 shape: EXISTS with a correlated inequality -> "
    "left_semi join on the equi-part with the inequality in the join "
    "condition (Catalyst's decorrelation).",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q12_shipmode_buckets",
    """
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    tags=("join", "agg"),
    doc="TPC-H Q12 shape: fact-fact join + conditional counts (the "
    "schema has no l_shipmode; linestatus plays the bucket role).",
)
def q12_shipmode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    f"""
    SELECT
      CAST(100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS DOUBLE) AS promo_pct,
      COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    """,
    tags=("join", "agg"),
    doc="TPC-H Q14 shape: promo revenue share. part is a broadcast dim; "
    "both sums exact-decimal, the final ratio one IEEE division.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .agg(
            (F.lit(100.0) * dsum(promo) / dsum(rev)).cast("double").alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "revenue_daily_gapfill",
    """
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    ),
    spine AS (
      SELECT UNNEST(generate_series(
        (SELECT MIN(d) FROM daily),
        (SELECT MAX(d) FROM daily),
        INTERVAL 1 DAY)) AS d
    )
    SELECT CAST(s.d AS TIMESTAMP_NS) AS day,
           COALESCE(dy.n_orders, 0) AS n_orders,
           COALESCE(dy.revenue, 0.0) AS revenue
    FROM spine s LEFT JOIN daily dy ON dy.d = s.d
    """,
    tags=("timeseries", "gapfill"),
    doc="Gap-filled daily revenue: aggregate first (one shuffle of "
    "(day, partials) - the spine never touches raw orders), derive "
    "the date spine from the 1-row min/max via sequence()+explode "
    "(no calendar table needed), left-join the daily aggregate back "
    "and zero-fill. Spine length is bounded by the date range "
    "(~365*years rows) at any corpus size; revenue sums in "
    "decimal(38,6) so the zero-filled series is bit-identical to "
    "the oracle.",
)
def revenue_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("revenue"),
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    return (
        spine.join(daily, "d", "left")
        .select(
            F.col("d").alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
    )


@query(
    "grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "grouping-sets"),
    doc="Explicit GROUPING SETS (status totals, priority totals, grand "
    "total in one pass) with GROUPING() markers disambiguating "
    "set-null from data-null. One Expand + one aggregation exchange - "
    "the multi-report shape that would otherwise be three scans "
    "unioned; partial aggregation still applies map-side after the "
    "expand. Revenue in decimal(38,6).",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("revenue"),
        )
    )


@query(
    "daily_orders_autocorr",
    """
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    spine AS (
      SELECT UNNEST(generate_series(
        (SELECT MIN(d) FROM daily), (SELECT MAX(d) FROM daily),
        INTERVAL 1 DAY)) AS d
    ),
    filled AS (
      SELECT s.d, COALESCE(dy.n_orders, 0) AS x
      FROM spine s LEFT JOIN daily dy ON dy.d = s.d
    ),
    lagged AS (
      SELECT x, lead(x) OVER (ORDER BY d) AS y FROM filled
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
             CAST(SUM(x*y) AS BIGINT) AS sxy
      FROM lagged WHERE y IS NOT NULL
    )
    SELECT n AS n_days,
           CAST(n*sxy - sx*sy AS DOUBLE)
             / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS autocorr_lag1
    FROM s
    """,
    tags=("timeseries", "statistics"),
    doc="Lag-1 Pearson autocorrelation of DAILY ORDER COUNTS over the "
    "gap-filled date spine (zero days must count, or the statistic is "
    "biased toward sparse periods). Exactness recipe: every moment "
    "(sx, sxx, sxy) is an exact int64 sum of counts; the only floats "
    "are three correctly-rounded IEEE ops on exactly-cast operands "
    "(each < 2^53): two sqrt, one divide - bit-identical cross-"
    "engine without any decimal machinery. The global window runs "
    "over the bounded daily aggregate (|days| rows), never orders.",
)
def daily_orders_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    filled = spine.join(daily, "d", "left").select(
        "d", F.coalesce("n_orders", F.lit(0)).alias("x")
    )
    lagged = filled.select(
        "x", F.lead("x").over(W.orderBy("d")).alias("y")
    ).where(F.col("y").isNotNull())
    s = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    d2 = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return s.select(
        F.col("n").alias("n_days"), (num / (d1 * d2)).alias("autocorr_lag1")
    )


@query(
    "customer_reorder_gaps",
    """
    WITH seq AS (
      SELECT o_custkey,
             epoch_us(o_orderdate)
               - epoch_us(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate, o_orderkey))
               AS gap_us
      FROM orders
    )
    SELECT o_custkey,
           COUNT(*) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(CAST(SUM(gap_us) AS HUGEINT) // COUNT(*) AS BIGINT)
             AS avg_gap_us
    FROM seq WHERE gap_us IS NOT NULL
    GROUP BY o_custkey
    """,
    tags=("window", "timeseries", "retention"),
    doc="Reorder-interval profile per customer: gaps between "
    "consecutive orders (lag over the custkey window, exact integer "
    "microseconds), min/max, and the mean as integer "
    "microseconds via truncating division - the churn-risk feature "
    "(a customer whose current silence exceeds their historical max "
    "gap is churning). Window and aggregation share the custkey "
    "exchange: one shuffle of (custkey, date) pairs.",
)
def customer_reorder_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # o_orderdate arrives as TIMESTAMP_NTZ; session TZ is pinned UTC,
    # so the cast to TIMESTAMP is value-stable and unix_micros applies
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    seq = orders.select(
        "o_custkey", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return seq.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.expr(
            "CAST(SUM(gap_us) AS DECIMAL(38,0)) div COUNT(*)"
        ).alias("avg_gap_us"),
    )


@query(
    "weekday_priority_seasonality",
    """
    SELECT (datediff('day', DATE '1970-01-01', o_orderdate) + 3) % 7 AS weekday,
           o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("agg", "timeseries"),
    doc="Order seasonality by weekday x priority - the ops-reporting "
    "shape. Weekday computed as (epoch_days + 3) % 7 (0 = Monday) on "
    "BOTH engines, deliberately avoiding dayofweek()/isodow(), whose "
    "origin conventions differ across engines and locales - calendar "
    "arithmetic from a fixed epoch is convention-free. |weekdays| x "
    "|priorities| output rows with map-side partials.",
)
def weekday_priority_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wd = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        + 3
    ) % 7
    return orders.groupBy(
        wd.cast("long").alias("weekday"), "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("revenue"),
    )


@query(
    "nation_revenue_share",
    """
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS nation_rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY n.n_name, r.r_name
    )
    SELECT nation, region,
           CAST(nation_rev AS DOUBLE) AS nation_revenue,
           CAST(nation_rev AS DOUBLE)
             / CAST(SUM(nation_rev) OVER (PARTITION BY region) AS DOUBLE)
             AS region_share
    FROM rev
    """,
    tags=("window", "agg", "join"),
    doc="Percent-of-total report: each nation's share of its region's "
    "revenue. Revenue aggregates FIRST (broadcast dim joins, one fact "
    "shuffle), then the share window runs over the |nations|-row "
    "aggregate - the ratio-to-report shape that novices compute with "
    "a self-join and pay a second fact pass for. Decimal sums; the "
    "share is one double division of two exactly-cast decimal sums "
    "(both engines sum in exact decimal, so numerator and denominator "
    "are identical before the one rounded op).",
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("nation_rev"))
    )
    w = W.partitionBy("region")
    return rev.select(
        "nation",
        "region",
        F.col("nation_rev").cast("double").alias("nation_revenue"),
        (
            F.col("nation_rev").cast("double")
            / F.sum("nation_rev").over(w).cast("double")
        ).alias("region_share"),
    )


@query(
    "ship_delay_stats",
    """
    WITH d AS (
      SELECT o.o_orderpriority,
             datediff('day', o.o_orderdate, l.l_shipdate) AS delay_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(MIN(delay_days) AS BIGINT) AS min_delay,
           CAST(MAX(delay_days) AS BIGINT) AS max_delay,
           CAST(CAST(SUM(delay_days) AS HUGEINT) * 1000 // COUNT(*) AS BIGINT)
             AS avg_delay_milli
    FROM d GROUP BY o_orderpriority
    """,
    tags=("join", "agg", "timeseries"),
    doc="Order-to-ship delay profile per priority - the SLA report. "
    "The fact-fact join shuffles once on the order key (or goes "
    "shuffle-free entirely under the bucketed layout, "
    "bucketing.py); delays are exact integer days, the mean emitted "
    "in milli-days via truncating division. 5-row output.",
)
def ship_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("delay_days"),
    )
    return d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("delay_days").cast("long").alias("min_delay"),
        F.max("delay_days").cast("long").alias("max_delay"),
        F.expr(
            "(CAST(SUM(delay_days) AS DECIMAL(38,0)) * 1000) div COUNT(*)"
        ).alias("avg_delay_milli"),
    )


PARETO_NUM, PARETO_DEN = 4, 5  # the "80" in 80/20


@query(
    "revenue_pareto_8020",
    f"""
    WITH per_cust AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(rev) OVER () AS total,
             COUNT(*) OVER () AS n_cust
      FROM per_cust
    )
    SELECT CAST(MIN(n_cust) AS BIGINT) AS n_customers,
           COUNT(*) FILTER (
             WHERE cum * {PARETO_DEN} <= total * {PARETO_NUM}
                OR (cum - rev) * {PARETO_DEN} < total * {PARETO_NUM}
           ) AS n_top_customers,
           CAST(CAST(COUNT(*) FILTER (
             WHERE cum * {PARETO_DEN} <= total * {PARETO_NUM}
                OR (cum - rev) * {PARETO_DEN} < total * {PARETO_NUM}
           ) AS HUGEINT) * 1000000 // MIN(n_cust) AS BIGINT) AS top_share_micro
    FROM ranked
    """,
    tags=("window", "statistics"),
    doc="Revenue concentration (the 80/20 question): the smallest set "
    "of top customers covering 80% of revenue. Customers rank by "
    "exact decimal revenue; the cover test is cross-multiplied "
    "integer arithmetic (a customer is in the cover while the "
    "PRECEDING cumulative is still short of 4/5 of total), and the "
    "share of customers needed comes out in integer micro-units via "
    "truncating division. No single-task window: the running sum is "
    "distributed (functions/topk.global_rank — range-partition + "
    "partitioned prefix sums + exact per-partition offsets), and the "
    "grand totals fall out of the offset pass as literals; 1-row "
    "output.",
)
def revenue_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    from porcupine_spark.functions.topk import global_rank

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev")
    )
    run, n, sums = global_rank(
        per_cust,
        [F.desc("rev"), F.asc("o_custkey")],
        cumsum={"cum": "rev"},
    )
    ranked = run.select(
        "rev",
        "cum",
        F.lit(str(sums["cum"])).cast("decimal(38,6)").alias("total"),
        F.lit(n).cast("long").alias("n_cust"),
    )
    in_cover = (F.col("cum") * PARETO_DEN <= F.col("total") * PARETO_NUM) | (
        (F.col("cum") - F.col("rev")) * PARETO_DEN < F.col("total") * PARETO_NUM
    )
    return ranked.agg(
        F.min("n_cust").alias("n_customers"),
        F.count(F.when(in_cover, 1)).alias("n_top_customers"),
        F.expr(
            f"(CAST(COUNT(CASE WHEN (cum * {PARETO_DEN} <= total * {PARETO_NUM}) OR "
            f"((cum - rev) * {PARETO_DEN} < total * {PARETO_NUM}) THEN 1 END) AS DECIMAL(38,0))"
            " * 1000000) div MIN(n_cust)"
        ).alias("top_share_micro"),
    )


@query(
    "brand_concentration_hhi",
    """
    WITH c AS (
      SELECT p_type, p_brand, COUNT(*) AS n
      FROM part GROUP BY p_type, p_brand
    ),
    t AS (
      SELECT p_type, SUM(n) AS total, SUM(CAST(n AS HUGEINT) * n) AS ssq
      FROM c GROUP BY p_type
    )
    SELECT p_type,
           CAST(total AS BIGINT) AS n_parts,
           CAST(CAST(ssq AS HUGEINT) * 1000000
                // (CAST(total AS HUGEINT) * total) AS BIGINT) AS hhi_micro
    FROM t
    """,
    tags=("agg", "statistics"),
    doc="Herfindahl-Hirschman concentration index of brands within "
    "each part type (10000*HHI-style market-concentration report, "
    "here in micro-units of the [0,1] index): HHI = sum(share^2) = "
    "sum(n_i^2)/total^2, evaluated entirely in integers with ONE "
    "truncating division - no per-share floats to accumulate. Two "
    "narrowing aggregations, output |types| rows.",
)
def brand_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    c = part.groupBy("p_type", "p_brand").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("p_type").agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("ssq"),
    )
    return t.select(
        "p_type",
        F.col("total").cast("long").alias("n_parts"),
        F.expr(
            "(CAST(ssq AS DECIMAL(38,0)) * 1000000)"
            " div (CAST(total AS DECIMAL(38,0)) * total)"
        ).alias("hhi_micro"),
    )


@query(
    "revenue_mom_growth",
    """
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) * 1000000 AS HUGEINT)
               AS HUGEINT) AS rev_u
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT month, rev_u,
             lag(rev_u) OVER (ORDER BY month) AS prev_u
      FROM monthly
    )
    SELECT CAST(month AS TIMESTAMP_NS) AS month,
           CAST(rev_u AS DOUBLE) / 1000000 AS revenue,
           CAST(CASE WHEN prev_u IS NOT NULL AND prev_u <> 0
                THEN ((rev_u - prev_u) * 1000000) // prev_u END AS BIGINT)
             AS growth_micro
    FROM seq
    """,
    tags=("window", "timeseries"),
    doc="Month-over-month revenue growth - the BI staple done "
    "bit-stable: monthly revenue converts to exact integer micro-"
    "units (decimal*1e6 -> integer, exact by construction), growth is "
    "the integer-scaled truncating division (both engines truncate "
    "toward zero, verified for negatives too), and the one double "
    "emitted is an exact integer divided by 1e6 (two exact operands, "
    "one correctly-rounded op). Lag window runs over the |months|-row "
    "aggregate.",
)
def revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(38,6)")) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("rev_u")
    )
    seq = monthly.withColumn("prev_u", F.lag("rev_u").over(W.orderBy("month")))
    growth = F.when(
        F.col("prev_u").isNotNull() & (F.col("prev_u") != 0),
        F.expr("((rev_u - prev_u) * 1000000) div prev_u"),
    )
    return seq.select(
        "month",
        (F.col("rev_u").cast("double") / 1_000_000).alias("revenue"),
        growth.alias("growth_micro"),
    )


@query(
    "order_backlog_daily",
    """
    WITH closes AS (
      SELECT l_orderkey AS o_orderkey,
             date_trunc('day', MAX(l_shipdate)) AS close_day
      FROM lineitem GROUP BY 1
    ),
    spans AS (
      SELECT date_trunc('day', o.o_orderdate) AS open_day, c.close_day
      FROM orders o JOIN closes c ON c.o_orderkey = o.o_orderkey
    ),
    deltas AS (
      SELECT open_day AS d, 1 AS dl FROM spans
      UNION ALL
      SELECT close_day AS d, -1 AS dl FROM spans
    ),
    day_sums AS (SELECT d, SUM(dl) AS net FROM deltas GROUP BY d),
    spine AS (
      SELECT UNNEST(generate_series(
        (SELECT MIN(d) FROM day_sums),
        (SELECT MAX(d) FROM day_sums),
        INTERVAL 1 DAY)) AS d
    )
    SELECT CAST(s.d AS TIMESTAMP_NS) AS day,
           CAST(COALESCE(SUM(ds.net) OVER (ORDER BY s.d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT)
             AS open_orders
    FROM spine s LEFT JOIN day_sums ds ON ds.d = s.d
    """,
    tags=("timeseries", "interval"),
    doc="Daily order backlog (orders placed but not yet fully shipped): "
    "each order contributes +1 at its order day and -1 at the day its "
    "LAST lineitem ships; end-of-day backlog is the tie-free prefix "
    "sum of per-day delta totals over the gap-filled day spine - the "
    "same interval-sweep shape as peak_concurrent_sessions, on the "
    "relational side. The sweep moves 2 rows per order (never "
    "lineitems), the spine is date-range-bounded, and the prefix "
    "window runs over per-day TOTALS (|days| rows) so no ordering "
    "ties exist by construction.",
)
def order_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    closes = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.date_trunc("day", F.max("l_shipdate")).alias("close_day")
    )
    spans = orders.select(
        "o_orderkey", F.date_trunc("day", F.col("o_orderdate")).alias("open_day")
    ).join(closes, "o_orderkey")
    deltas = spans.select(F.col("open_day").alias("d"), F.lit(1).alias("dl")).unionByName(
        spans.select(F.col("close_day").alias("d"), F.lit(-1).alias("dl"))
    )
    day_sums = deltas.groupBy("d").agg(F.sum("dl").alias("net"))
    bounds = day_sums.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    wcum = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        spine.join(day_sums, "d", "left")
        .select(
            F.col("d").alias("day"),
            F.coalesce(F.sum("net").over(wcum), F.lit(0)).cast("long").alias("open_orders"),
        )
    )


@query(
    "props_key_coverage",
    """
    WITH keys AS (
      SELECT UNNEST(json_keys(props)) AS key FROM events WHERE props IS NOT NULL
    ),
    tot AS (SELECT COUNT(*) AS n FROM events)
    SELECT key,
           COUNT(*) AS n_events,
           CAST(CAST(COUNT(*) AS HUGEINT) * 1000000
                // (SELECT n FROM tot) AS BIGINT) AS coverage_micro
    FROM keys GROUP BY key
    """,
    tags=("json", "profiling"),
    doc="Semi-structured SCHEMA-INFERENCE report: which keys appear in "
    "the events.props JSON and in what fraction of events (integer "
    "micro-units, truncating div) - the first question against any "
    "raw JSON feed, and the report that decides which keys deserve "
    "promotion to real columns. One from_json map pass + key-keyed "
    "agg (map-side combined; key cardinality ~ schema size, tiny at "
    "any event count); the total is the justified 1-row scalar.",
)
def props_key_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keys = ev.filter(F.col("props").isNotNull()).select(
        F.explode(F.map_keys(F.from_json("props", "map<string,string>"))).alias("key")
    )
    total = ev.agg(F.count(F.lit(1)).alias("n"))
    return (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_events",
            F.expr("CAST(n_events AS DECIMAL(38,0)) * 1000000 div n")
            .cast("long")
            .alias("coverage_micro"),
        )
    )


SKEW_BUCKETS = 32  # diagnostic bucket count (stands in for shuffle partitions)


@query(
    "shuffle_skew_report",
    f"""
    WITH b AS (
      SELECT CAST(CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {SKEW_BUCKETS} AS BIGINT) AS bucket
      FROM orders
    ),
    counts AS (SELECT bucket, COUNT(*) AS n_rows FROM b GROUP BY bucket),
    tot AS (SELECT SUM(n_rows) AS t FROM counts)
    SELECT bucket, n_rows,
           CAST(CAST(n_rows AS HUGEINT) * 1000000 // (SELECT t FROM tot) AS BIGINT)
             AS share_micro,
           CAST(CAST(n_rows AS HUGEINT) * {SKEW_BUCKETS} * 1000000
                // (SELECT t FROM tot) AS BIGINT) AS balance_micro
    FROM counts
    """,
    tags=("profiling", "skew"),
    doc=f"Pre-flight shuffle-skew diagnosis: hash orders.o_custkey into "
    f"{SKEW_BUCKETS} buckets (an md5-derived stand-in for the shuffle "
    f"partitioner, identical on both engines) and report each bucket's "
    f"row share plus its balance factor (1e6 = perfectly even; a "
    f"bucket at 3e6 holds 3x its fair share and will straggle). THE "
    f"question to ask BEFORE a big join/agg ships to the cluster - a "
    f"hot key shows up here as a hot bucket, telling you to salt or "
    f"let AQE split before burning executor hours. One map-side-"
    f"combined aggregation; output is {SKEW_BUCKETS} rows at any "
    f"data size.",
)
def shuffle_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % SKEW_BUCKETS
    )
    counts = o.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = counts.agg(F.sum("n_rows").alias("t"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_rows",
            F.expr("CAST(n_rows AS DECIMAL(38,0)) * 1000000 div t")
            .cast("long")
            .alias("share_micro"),
            F.expr(
                f"CAST(n_rows AS DECIMAL(38,0)) * {SKEW_BUCKETS} * 1000000 div t"
            )
            .cast("long")
            .alias("balance_micro"),
        )
    )


@query(
    "cusum_changepoint",
    """
    WITH daily AS (
      SELECT o_orderdate AS day, COUNT(*) AS c
      FROM orders GROUP BY o_orderdate
    ),
    tot AS (SELECT COUNT(*) AS n_days, CAST(SUM(c) AS BIGINT) AS total FROM daily),
    cu AS (
      SELECT day, c,
             SUM(CAST(c AS HUGEINT) * (SELECT n_days FROM tot)
                 - (SELECT total FROM tot))
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cusum_scaled
      FROM daily
    ),
    peak AS (
      SELECT day, cusum_scaled,
             ROW_NUMBER() OVER (ORDER BY ABS(cusum_scaled) DESC, day) AS rk
      FROM cu
    )
    SELECT CAST((SELECT n_days FROM tot) AS BIGINT) AS n_days,
           CAST((SELECT total FROM tot) AS BIGINT) AS total_orders,
           CAST(day AS VARCHAR) AS peak_day,
           CAST(cusum_scaled AS BIGINT) AS peak_cusum_scaled,
           CAST(ABS(cusum_scaled) * 1000000
                // (CAST((SELECT total FROM tot) AS HUGEINT)
                    * (SELECT n_days FROM tot)) AS BIGINT) AS peak_rel_micro
    FROM peak WHERE rk = 1
    """,
    tags=("timeseries", "monitoring", "quality"),
    doc="CUSUM change-point detection over daily order volume: the "
    "cumulative sum of (daily count - global mean) peaks in absolute "
    "value at the most likely regime-shift day (the classic Page/"
    "Pettitt location statistic) - the drift alarm that says WHEN an "
    "ingest pipeline's rate changed, not just that it did. Exact by "
    "common-denominator trick: deviations are carried as "
    "c*n_days - total (integers - no mean division ever happens), so "
    "the argmax and the reported relative magnitude are bit-stable "
    "with a day tiebreak. Shape: one daily aggregate (|days| rows), "
    "one unpartitioned prefix window over the bounded day table "
    "(range-partitionable at scale), 1-row output.",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("c").cast("long").alias("total")
    )
    cu = daily.crossJoin(F.broadcast(tot)).withColumn(
        "cusum_scaled",
        F.sum(
            F.expr("CAST(c AS DECIMAL(38,0)) * n_days - total")
        ).over(W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)),
    )
    peak = cu.withColumn(
        "rk",
        F.row_number().over(W.orderBy(F.abs(F.col("cusum_scaled")).desc(), F.asc("day"))),
    ).filter(F.col("rk") == 1)
    return peak.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("total").alias("total_orders"),
        F.col("day").cast("string").alias("peak_day"),
        F.col("cusum_scaled").cast("long").alias("peak_cusum_scaled"),
        F.expr(
            "CAST(abs(cusum_scaled) * 1000000"
            " div (CAST(total AS DECIMAL(38,0)) * n_days) AS BIGINT)"
        ).alias("peak_rel_micro"),
    )


@query(
    "seasonal_naive_error",
    """
    WITH daily AS (
      SELECT o_orderdate AS day, COUNT(*) AS c
      FROM orders GROUP BY o_orderdate
    ),
    j AS (
      SELECT t.day, t.c, l.c AS c_lag
      FROM daily t JOIN daily l ON l.day = t.day - INTERVAL 7 DAY
    )
    SELECT COUNT(*) AS n_days_scored,
           CAST(SUM(ABS(c - c_lag)) AS BIGINT) AS total_abs_err,
           CAST(CAST(SUM(ABS(c - c_lag)) AS HUGEINT) * 1000000 // COUNT(*)
             AS BIGINT) AS mae_micro,
           CAST(CAST(SUM(ABS(c - c_lag)) AS HUGEINT) * 1000000 // SUM(c)
             AS BIGINT) AS wape_micro
    FROM j
    """,
    tags=("timeseries", "monitoring", "evaluation"),
    doc="Seasonal-naive forecastability of daily order volume: predict "
    "each day by the same weekday one week earlier and report MAE and "
    "WAPE (weighted absolute percentage error - sum|err|/sum actual, "
    "the denominator-safe MAPE) in integer micro-units. This is the "
    "baseline every forecasting pipeline must beat AND a drift "
    "monitor in itself - a WAPE jump means the weekly rhythm broke "
    "(ingest incident, seasonality shift) before any model notices. "
    "Shape: one daily aggregate, an equi-join on day-7 (two copies of "
    "the |days|-row table, co-partitioned), a constant-size fold. "
    "Joining the aggregate beats a lag window here: no global sort, "
    "and missing days score as absent rather than silently lagging "
    "to the previous present day.",
)
def seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    lag = daily.select(
        F.date_add(F.col("day"), 7).alias("day"), F.col("c").alias("c_lag")
    )
    j = daily.join(lag, "day")
    return j.agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.sum(F.abs(F.col("c") - F.col("c_lag"))).cast("long").alias("total_abs_err"),
        F.expr(
            "CAST(CAST(SUM(ABS(c - c_lag)) AS DECIMAL(38,0)) * 1000000"
            " div COUNT(1) AS BIGINT)"
        ).alias("mae_micro"),
        F.expr(
            "CAST(CAST(SUM(ABS(c - c_lag)) AS DECIMAL(38,0)) * 1000000"
            " div SUM(c) AS BIGINT)"
        ).alias("wape_micro"),
    )


@query(
    "props_variant_typed",
    """
    WITH t AS (
      -- TRY_CAST mirrors the Spark side's try_variant_get(..., 'long')
      -- exactly: both sides test LONG-CASTABILITY, not mere key
      -- presence, so a non-integer props.k diverges on neither side
      -- (and CAST would error where TRY_CAST yields NULL)
      SELECT event_type,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                       IS NOT NULL
                  THEN 1 ELSE 0 END AS has_k,
             CASE WHEN TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT)
                       IS NOT NULL
                  THEN 1 ELSE 0 END AS has_missing
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(has_k) AS BIGINT) AS n_typed_k,
           CAST(SUM(has_missing) AS BIGINT) AS n_typed_missing,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS distinct_k
    FROM t GROUP BY event_type
    """,
    tags=("json", "variant", "agg"),
    doc="Semi-structured parsing through Spark 4's VARIANT type: props "
    "parsed ONCE to a binary variant (parse_json), then typed "
    "extraction via try_variant_get — the parse-once/extract-many "
    "shape that replaces repeated get_json_object string walks at "
    "scale (events_props_json shows the legacy per-field extractor; "
    "this is its modern twin, and the typed-extraction counts double "
    "as a schema-presence audit: n_typed_missing pins the NULL path "
    "for absent keys). The oracle reaches identical values through "
    "DuckDB's JSON type — two independent semi-structured engines "
    "agreeing on typed extraction.",
)
def props_variant_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "long")
    missing = F.try_variant_get("v", "$.missing", "long")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(k.isNotNull(), 1).otherwise(0)).cast("long").alias("n_typed_k"),
        F.sum(F.when(missing.isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_typed_missing"),
        F.sum(k).cast("long").alias("sum_k"),
        F.countDistinct(k).cast("long").alias("distinct_k"),
    )
