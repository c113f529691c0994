"""Non-equi (range) join and skew-salted aggregation queries.

Two surfaces the rest of the corpus doesn't exercise:

- a RANGE join (equi key + time-range condition) — the attribution /
  interval-alignment shape. Spark executes it as the equi-join on the
  key with the range predicate evaluated inside the join, so it
  shuffles once on the key and never builds the unkeyed cross product;
  at 100 TB the key join is the thing that scales, and a genuinely
  key-less range join would instead need bucketized range overlap
  (bin the time axis, equi-join on bin).
- the SALTED two-phase aggregation from functions/skew.py on the
  oracle path, proving result-equality with the plain GROUP BY it
  replaces (AQE splits skewed JOINS at runtime but not skewed
  aggregations — salting is the standing fix; see SCALE.md).

The reference has no joins at all (SURVEY §2.3) — these extend the
engine's join surface alongside the TPC-H corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from porcupine_spark.functions.skew import salted_agg
from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

BURST_HOURS = 2


@query(
    "range_join_error_burst",
    f"""
    SELECT s.event_id AS signup_id,
           s.user_id,
           COUNT(*) AS n_errors
    FROM events s
    JOIN events e
      ON e.user_id = s.user_id
     AND s.event_type = 'signup' AND e.event_type = 'error'
     AND e.ts >= s.ts
     AND e.ts < s.ts + INTERVAL {BURST_HOURS} HOURS
    GROUP BY s.event_id, s.user_id
    """,
    tags=("join", "range"),
    doc=f"Range join: errors within {BURST_HOURS}h after each signup, "
    "per signup. Executes as ONE shuffle on the user key with the "
    "time-range predicate evaluated inside the join — no cross "
    "product; the per-signup rollup reuses the join's key "
    "partitioning. A key-less range join would instead need "
    "time-bucketized overlap (bin the axis, equi-join on bin).",
)
def range_join_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", F.col("ts").alias("sts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("ets")
    )
    joined = s.join(
        e,
        (F.col("e_user") == F.col("user_id"))
        & (F.col("ets") >= F.col("sts"))
        & (F.col("ets") < F.col("sts") + F.expr(f"INTERVAL {BURST_HOURS} HOURS")),
    )
    return joined.groupBy("signup_id", "user_id").agg(F.count(F.lit(1)).alias("n_errors"))


@query(
    "salted_source_stats",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    """,
    tags=("agg", "skew"),
    doc="Per-source corpus stats through the SALTED two-phase "
    "aggregation (phase 1 on (source, salt) spreads hot sources over "
    "16 reducers, phase 2 merges partials on source). The oracle is "
    "the plain GROUP BY — passing proves the associative "
    "decomposition (count->sum, sum->sum) is exact. This is the "
    "standing fix for skewed aggregation keys, which AQE does not "
    "split (SCALE.md).",
)
def salted_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.length("text").alias("len")
    )
    return salted_agg(
        docs,
        keys=["source"],
        aggs=[F.count(F.lit(1)).alias("pc"), F.sum("len").alias("ps")],
        final_aggs=[
            F.sum("pc").alias("n_docs"),
            F.sum("ps").alias("total_chars"),
        ],
    )


FUZZY_MAX_DIST = 2


@query(
    "fuzzy_name_pairs",
    f"""
    WITH names AS (
      SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
    ),
    blocked AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             a.n_parts AS parts_a, b.n_parts AS parts_b,
             levenshtein(a.p_name, b.p_name) AS edit_dist
      FROM names a JOIN names b
        ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
       AND a.p_name < b.p_name
       AND ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= {FUZZY_MAX_DIST}
    )
    SELECT name_a, name_b, edit_dist, parts_a, parts_b
    FROM blocked WHERE edit_dist <= {FUZZY_MAX_DIST}
    """,
    tags=("join", "fuzzy", "entity-resolution"),
    doc="Blocked fuzzy (edit-distance) self-join - the entity-resolution "
    "shape. Scale discipline: match the DISTINCT name space, not rows "
    "(GROUP BY p_name first - the candidate join is |distinct names|^2 "
    "/ blocks, independent of row count), block on the name's noun "
    "token plus a length band (levenshtein<=k implies |len diff|<=k, "
    "so the band loses nothing), and carry row counts through the "
    "group-by so multiplicity survives without re-joining the fact "
    "table. Exact integer distances on both engines.",
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    noun = lambda c: F.split_part(F.col(c), F.lit(" "), F.lit(2))  # noqa: E731
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("n_parts").alias("parts_a"),
        noun("p_name").alias("blk_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("n_parts").alias("parts_b"),
        noun("p_name").alias("blk_b"),
    )
    cand = a.join(
        b,
        (F.col("blk_a") == F.col("blk_b"))
        & (F.col("name_a") < F.col("name_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= FUZZY_MAX_DIST
        ),
    )
    return (
        cand.withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("edit_dist") <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", "edit_dist", "parts_a", "parts_b")
    )


@query(
    "skyline_orders",
    """
    WITH dmin AS (
      SELECT o_totalprice AS price, MIN(o_orderdate) AS dmin
      FROM orders GROUP BY o_totalprice
    ),
    swept AS (
      SELECT price, dmin,
             MIN(dmin) OVER (ORDER BY price DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS m1
      FROM dmin
    ),
    frontier AS (
      SELECT price, dmin FROM swept WHERE m1 IS NULL OR dmin < m1
    ),
    cnt AS (
      SELECT o_totalprice AS price, o_orderdate AS d, COUNT(*) AS n_orders
      FROM orders GROUP BY o_totalprice, o_orderdate
    )
    SELECT f.price AS o_totalprice,
           CAST(f.dmin AS TIMESTAMP_NS) AS o_orderdate,
           c.n_orders
    FROM frontier f JOIN cnt c ON c.price = f.price AND c.d = f.dmin
    """,
    tags=("window", "skyline"),
    doc="2D skyline (Pareto frontier): orders not dominated on "
    "(higher price, earlier date) by any other order. Exact sweep-line "
    "formulation: reduce to (distinct price -> min date) first - the "
    "global window then runs over |distinct prices|, which for "
    "currency-valued data is a bounded grid, not the order count - "
    "then keep a price point iff its min date beats the running min "
    "over all strictly-higher prices (ROWS ... 1 PRECEDING = strict "
    "dominance; equal-price/equal-date ties survive, as skyline "
    "semantics require). Counts join back on the tiny frontier "
    "(broadcast). No self-join, no quadratic dominance test.",
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    dmin = orders.groupBy(F.col("o_totalprice").alias("price")).agg(
        F.min("o_orderdate").alias("dmin")
    )
    w = W.orderBy(F.col("price").desc()).rowsBetween(W.unboundedPreceding, -1)
    swept = dmin.withColumn("m1", F.min("dmin").over(w))
    frontier = swept.where(F.col("m1").isNull() | (F.col("dmin") < F.col("m1")))
    cnt = orders.groupBy(
        F.col("o_totalprice").alias("price"), F.col("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        cnt.join(
            F.broadcast(frontier),
            (cnt.price == frontier.price) & (cnt.d == frontier.dmin),
        )
        .select(
            cnt.price.alias("o_totalprice"),
            F.col("d").alias("o_orderdate"),
            "n_orders",
        )
    )


BASKET_MIN_SUPPORT = 3


@query(
    "basket_pair_lift",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    freq AS (SELECT l_partkey, COUNT(*) AS n_part FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
      FROM items a JOIN items b
        ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
    )
    SELECT p.part_a, p.part_b, p.support, fa.n_part AS n_a, fb.n_part AS n_b,
           CAST(CAST(p.support AS HUGEINT) * n.n_orders AS DOUBLE)
             / CAST(CAST(fa.n_part AS HUGEINT) * fb.n_part AS DOUBLE) AS lift
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b
    CROSS JOIN n
    """,
    tags=("join", "basket"),
    doc="Market-basket pairwise association (support + lift) over order "
    "baskets. The pair join is WITHIN the order key, so fan-out per "
    "order is C(basket,2) - bounded by basket size (<=13 here), never "
    "by part popularity; the support floor prunes after the bounded "
    "agg. Lift = support*N/(n_a*n_b) with both operands exact "
    "integers widened to decimal before ONE IEEE division - "
    "bit-identical cross-engine. The 1-row order-count broadcast is "
    "the justified scalar-subquery class.",
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # One exchange feeds every consumer of the basket item set
    # (optimization r8, guide §2.4 — the _copurchase_edges layout):
    # repartition the (orderkey, partkey) scan by l_orderkey FIRST.
    # HashPartitioning(ok) satisfies the distinct's clustering on
    # (ok, pk), the self-join's clustering on ok, AND the order-count
    # distinct on ok — so the old shape's per-consumer
    # Exchange(ok, pk) chains (5 lineitem scans + 5 distinct subtrees
    # in the executed plan: join sides a/b, freq twice, n once)
    # collapse onto one shuffle whose map stage AQE physically reuses.
    # Row set is identical — repartitioning commutes with distinct.
    items = (
        li.select("l_orderkey", "l_partkey")
        .repartition(F.col("l_orderkey"))
        .distinct()
    )
    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b"))
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "support", "n_a", "n_b",
            (
                (F.col("support").cast("decimal(38,0)") * F.col("n_orders")).cast("double")
                / (F.col("n_a").cast("decimal(38,0)") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


SN_WINDOW = 3  # sorted-neighborhood rank distance


@query(
    "sorted_neighborhood_pairs",
    f"""
    WITH names AS (
      SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
    ),
    ranked AS (
      SELECT p_name, n_parts,
             ROW_NUMBER() OVER (ORDER BY p_name) AS rk
      FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           b.rk - a.rk AS rank_dist,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM ranked a JOIN ranked b
      ON b.rk > a.rk AND b.rk <= a.rk + {SN_WINDOW}
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
    tags=("join", "fuzzy", "entity-resolution"),
    doc="Sorted-neighborhood entity resolution - the OTHER classic "
    "blocking method (vs fuzzy_name_pairs' token blocking): sort the "
    "DISTINCT name space, compare only rank-neighbors within a "
    "window of 3, verify with edit distance. Candidates are "
    "|names| x window regardless of name popularity - immune to the "
    "hot-block blowup token blocking can hit - at the cost of missing "
    "pairs that sort far apart (the methods are complementary and "
    "production stacks run both). The rank is fully DISTRIBUTED "
    "(zipWithIndex pattern: range-partition by name, row_number "
    "within each partition - a PARTITIONED window - plus per-"
    "partition offsets, a |partitions|-integer driver boundary "
    "bounded by cluster config, never the data), and the neighbor "
    "join is an EQUI-join on bucket = rank div window probing "
    "{bucket, bucket+1} - every bucket holds <= window names, so "
    "the join shards perfectly at any name count. No global window, "
    "no nested-loop join (both plan-asserted in tests/test_plans.py).",
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from porcupine_spark.functions.topk import global_rank

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    # distributed global rank over the distinct-name space (zipWithIndex
    # pattern — see functions/topk.global_rank)
    run, _, _ = global_rank(names, [F.asc("p_name")])
    ranked = run.select("p_name", "rk")
    # neighbor pairs (0 < rk_b - rk_a <= SN_WINDOW) via an equi-join on
    # bucket = rk div SN_WINDOW: any qualifying rk_b lives in the probe
    # row's bucket or the next one, and each bucket holds <= SN_WINDOW
    # names - sharded candidate generation, no inequality-only join
    bkt = F.expr(f"rk div {SN_WINDOW}")
    a = ranked.select(
        F.col("p_name").alias("name_a"),
        F.col("rk").alias("rk_a"),
        F.explode(F.array(bkt, bkt + 1)).alias("jb"),
    )
    b = ranked.select(
        F.col("p_name").alias("name_b"), F.col("rk").alias("rk_b"), bkt.alias("jb")
    )
    return (
        a.join(b, "jb")
        .where(
            (F.col("rk_b") > F.col("rk_a"))
            & (F.col("rk_b") <= F.col("rk_a") + SN_WINDOW)
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("edit_dist") <= 4)
        .select(
            "name_a", "name_b",
            (F.col("rk_b") - F.col("rk_a")).cast("long").alias("rank_dist"),
            "edit_dist",
        )
    )
