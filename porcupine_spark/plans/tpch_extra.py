"""Extended TPC-H-shaped join/agg corpus (Q7,Q8,Q9,Q10,Q13,Q15,Q18,Q19,Q21,Q22).

The reference has no relational joins (SURVEY.md §2.3 — closest are the
Arrow pair combinators, porcupine-core/src/System/TaskPipeline/PTask/
Internal.hs:113-119), but the full Spark join surface is part of this
engine's contract. These ten queries are the classic TPC-H shapes
adapted to the driver's slimmed schema (no partsupp, no l_commitdate /
l_receiptdate / c_phone — predicates substituted with columns that
exist; query STRUCTURE preserved: join graphs, correlated subqueries,
scalar subqueries, OR-of-ANDs pushdown, left-join distributions).

Scale notes (local[32] now, 1000-executor 100TB later):
- dims (region/nation/supplier/part/customer at these ratios) are
  broadcast explicitly; fact-fact joins (orders⋈lineitem) shuffle on
  the join key and AQE picks the final partitioning.
- All SUM/AVG go through DECIMAL(38,6) (see plans.relational) so
  results hash-match the DuckDB oracle bit-exactly with no tolerance.
- Scalar subqueries (Q8 share denominator, Q22 avg balance) compute
  once and broadcast — never a per-row recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from porcupine_spark.plans.registry import query
from porcupine_spark.plans.relational import dsum, sql_dsum
from porcupine_spark.tables import load_table


@query(
    "q7_volume_shipping",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY sn.n_name, cn.n_name, l_year
    """,
    tags=("join", "agg", "tpch"),
    doc="TPC-H Q7 shape: two independent nation lookups on the same fact "
    "row (supplier side + customer side), symmetric pair predicate, "
    "yearly rollup. Both nation dims broadcast.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST({sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")} AS DOUBLE)
             / CAST({sql_dsum('volume')} AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "agg", "tpch"),
    doc="TPC-H Q8 shape: 8-way join, conditional-sum market share "
    "(sum(case)/sum — both sums decimal-exact, the division done once "
    "per group in double on both engines).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    annotated = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(cn.join(r, cn.cn_rkey == r.r_regionkey)),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    return annotated.groupBy("o_year").agg(
        (
            dsum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0)))
            / dsum(F.col("volume"))
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    f"""
    SELECT sn.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity')} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY sn.n_name, o_year
    """,
    tags=("join", "agg", "tpch"),
    doc="TPC-H Q9 shape (no partsupp in schema: supply cost proxied as "
    "10% of p_retailprice). LIKE-filtered part dim broadcast; profit "
    "expression stays per-row double, aggregated decimal-exact.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("sum_profit"))
    )


@query(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
    doc="TPC-H Q10 shape: returned-item revenue ranking, top 20. "
    "Deterministic under ties via the c_custkey tiebreaker; revenue is "
    "decimal-exact so both engines rank identically.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("join", "agg", "tpch"),
    doc="TPC-H Q13 shape: left join preserving customers with zero "
    "orders, two-level aggregation (count per customer, then histogram "
    "of counts). The ON-clause extra predicate (priority filter) must "
    "not turn the join inner — the left-join null path is the point.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_customer = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_customer.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("join", "agg", "subquery", "tpch"),
    doc="TPC-H Q15 shape: agg view + scalar-subquery max filter. The "
    "max compares decimal-exact revenues, so the equality is safe on "
    "both engines (no float-tolerance hedging).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    # scalar-subquery filter: broadcast the 1-row max and equi-join on it
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == F.col("m"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q18_large_volume_customers",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP_NS) AS o_orderdate, o.o_totalprice,
           {sql_dsum('l.l_quantity')} AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    tags=("join", "agg", "semijoin", "tpch"),
    doc="TPC-H Q18 shape: IN-subquery with HAVING compiled to a "
    "semi-join against the pre-aggregated qualifying-order set "
    "(threshold 250 ~ p99 of per-order quantity in this corpus).",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(qualifying.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
    )


@query(
    "q19_discounted_revenue",
    f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    tags=("join", "agg", "tpch"),
    doc="TPC-H Q19 shape: OR-of-ANDs mixing both join sides. Catalyst "
    "extracts the common part-side disjuncts below the join (the "
    "brand/size OR prunes the broadcast build side) and keeps the "
    "mixed residual as the join filter.",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (q >= 1)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (q >= 10)
            & (q <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & (q >= 20)
            & (q <= 40)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q22_global_sales_opportunity",
    f"""
    SELECT c.c_nationkey AS nationkey, COUNT(*) AS numcust,
           {sql_dsum('c.c_acctbal')} AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c.c_acctbal > (
        SELECT {sql_dsum('c2.c_acctbal')} / COUNT(*)
        FROM customer c2
        WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      )
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
    doc="TPC-H Q22 shape (phone-prefix predicate adapted to nationkey; "
    "'no orders in 7 years' adapted to 'no urgent orders' so the "
    "anti-join keeps a non-trivial set — every customer here has some "
    "order): scalar-subquery average + anti-join. The average is "
    "decimal-exact on both engines so the > comparison can't straddle "
    "a ULP.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = [1, 3, 5, 7, 9, 11, 13]
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(keys))
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal), c.c_acctbal > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lo l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE l1.late
      AND n.n_name = 'NATION_2'
      AND EXISTS (SELECT 1 FROM lo l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lo l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    tags=("join", "agg", "exists", "tpch"),
    doc="TPC-H Q21 shape (suppliers who kept orders waiting; lateness "
    "adapted to l_shipdate > o_orderdate + 60 days — no l_receiptdate/"
    "l_commitdate in the slim schema). The oracle keeps Q21's literal "
    "EXISTS / NOT EXISTS double self-join; the Spark plan uses the "
    "standard agg rewrite — ONE per-order pass computing (distinct "
    "suppliers, distinct LATE suppliers), then a line qualifies iff "
    "late AND n_supp >= 2 AND n_late_supp = 1. Two shuffles on "
    "l_orderkey (co-partitioned, AQE-coalesced) instead of three "
    "lineitem scans + two self-joins; supplier and nation broadcast. "
    "Deterministic top-10: numwait DESC, s_name tiebreak (names "
    "unique).",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    return (
        lo.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH eligible AS (
      SELECT l.l_partkey, l.l_suppkey,
             l.l_extendedprice / l.l_quantity AS unit_cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    min_cost AS (
      SELECT l_partkey, MIN(unit_cost) AS mc FROM eligible GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name AS nation,
           p.p_partkey, p.p_type, e.unit_cost
    FROM part p
    JOIN eligible e ON e.l_partkey = p.p_partkey
    JOIN min_cost m ON m.l_partkey = p.p_partkey AND e.unit_cost = m.mc
    JOIN supplier s ON s.s_suppkey = e.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size <= 15 AND p.p_type = 'SMALL'
    """,
    tags=("join", "subquery", "tpch"),
    doc="TPC-H Q2 shape (no partsupp in the slim schema: lineitem is the "
    "part-supplier relationship, unit_cost = extendedprice/quantity): "
    "correlated MIN-cost subquery decorrelated into a grouped pre-min + "
    "equi-join on partkey; region restriction applied INSIDE the "
    "subquery as in the original. MIN of doubles is order-independent, "
    "so no decimal discipline is needed (unlike sums). Supplier/nation/"
    "region dims broadcast; the only shuffle is the per-part min.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
    )
    eur_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    eligible = li.join(
        F.broadcast(eur_supp), li.l_suppkey == F.col("s_suppkey")
    ).select(
        "l_partkey",
        "s_name",
        "s_acctbal",
        "nation",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )
    min_cost = eligible.groupBy("l_partkey").agg(F.min("unit_cost").alias("mc"))
    return (
        eligible.join(min_cost, "l_partkey")
        .filter(F.col("unit_cost") == F.col("mc"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_type", "unit_cost")
        .distinct()
    )


@query(
    "q11_important_parts",
    f"""
    WITH filtered AS (
      SELECT l.l_partkey, l.l_extendedprice * l.l_quantity AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
    )
    SELECT l_partkey, {sql_dsum('v')} AS value
    FROM filtered GROUP BY l_partkey
    HAVING {sql_dsum('v')} > (SELECT {sql_dsum('v')} FROM filtered) * 0.001
    """,
    tags=("join", "agg", "subquery", "tpch"),
    doc="TPC-H Q11 shape (value = extendedprice*quantity in place of "
    "partsupp supplycost*availqty): per-part value sums for a nation "
    "group, HAVING against a global-total scalar subquery. The scalar "
    "computes ONCE and broadcasts into the filter; both sums are "
    "decimal-exact so the threshold boundary cannot flip cross-engine.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi").select(
        "s_suppkey"
    )
    v = F.col("l_extendedprice") * F.col("l_quantity")
    filtered = li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey")).select(
        "l_partkey", v.alias("v")
    )
    per_part = filtered.groupBy("l_partkey").agg(dsum(F.col("v")).alias("value"))
    total = filtered.agg(dsum(F.col("v")).alias("t"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("t") * 0.001)
        .select("l_partkey", "value")
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg", "tpch"),
    doc="TPC-H Q16 shape (lineitem as the part-supplier relationship; "
    "negative-balance suppliers stand in for the complaints NOT IN): "
    "NOT IN over non-nullable keys compiles to a broadcast anti-join, "
    "then count-distinct suppliers per (brand,type,size). The distinct "
    "agg is partial-aggregated map-side before the group shuffle.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_promo_part_suppliers",
    f"""
    WITH promo AS (
      SELECT l_partkey, l_suppkey, {sql_dsum('l_quantity')} AS sq
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey, {sql_dsum('l_quantity')} AS tq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey
    )
    SELECT s_name, s_acctbal FROM supplier
    WHERE s_suppkey IN (
        SELECT p.l_suppkey FROM promo p
        JOIN tot t ON t.l_partkey = p.l_partkey
        WHERE p.sq > 0.5 * t.tq)
      AND s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%')
    """,
    tags=("join", "agg", "subquery", "tpch"),
    doc="TPC-H Q20 shape (shipped quantity stands in for partsupp "
    "availqty): suppliers who shipped >50% of a small-part's 1997 "
    "volume, restricted to a nation group. The correlated half-of-total "
    "threshold decorrelates into a per-part total pre-aggregate joined "
    "to the per-(part,supplier) sums; both IN-subqueries become "
    "semi-joins. Quantity sums decimal-exact for the 0.5*t boundary.",
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    year = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(year)
    small = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    promo = (
        li.join(F.broadcast(small), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("sq"))
    )
    tot = li.groupBy("l_partkey").agg(dsum(F.col("l_quantity")).alias("tq"))
    qualified = (
        promo.join(tot, "l_partkey")
        .filter(F.col("sq") > 0.5 * F.col("tq"))
        .select("l_suppkey")
    )
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name").like("NATION_1%"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(qualified), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
