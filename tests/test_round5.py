"""Round-5 additions: state-store provider knob.

(The other round-5 items test where they belong: the keep-policy
broadcast guard in test_plans.py, $layers + zip_with in
test_catalog.py, IVF persistence in test_operators.py.)
"""

import os

import pytest


def test_statestore_knob_switches_provider_and_preserves_results(spark, sf_dir):
    """PORCUPINE_SPARK_STATESTORE=rocksdb must flip the cloned session
    to RocksDBStateStoreProvider and leave results IDENTICAL — the
    cluster-scale escape hatch for keyspaces that outgrow heap
    (SCALE.md round-5 A/B: the in-memory default wins locally, so the
    knob defaults off)."""
    from porcupine_spark.plans.registry import load_all_plans
    from porcupine_spark.streaming.windows import _state_sized_session

    specs = load_all_plans()
    baseline = {
        tuple(r) for r in specs["stream_tumbling_agg"].builder(spark, sf_dir).collect()
    }
    old = os.environ.get("PORCUPINE_SPARK_STATESTORE")
    os.environ["PORCUPINE_SPARK_STATESTORE"] = "rocksdb"
    try:
        ns = _state_sized_session(spark)
        assert "RocksDBStateStoreProvider" in ns.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
        rocks = {
            tuple(r)
            for r in specs["stream_tumbling_agg"].builder(spark, sf_dir).collect()
        }
        assert rocks == baseline
    finally:
        if old is None:
            os.environ.pop("PORCUPINE_SPARK_STATESTORE", None)
        else:
            os.environ["PORCUPINE_SPARK_STATESTORE"] = old
    # and the default session is back on the default provider
    ns2 = _state_sized_session(spark)
    assert "RocksDB" not in (
        ns2.conf.get(
            "spark.sql.streaming.stateStore.providerClass",
            "HDFSBackedStateStoreProvider",
        )
    )


# ---------------------------------------------------------------------------
# triangle_counts: degree-orientation exactness on planted graphs


def test_triangle_counts_planted(spark):
    """K4 plus a pendant: every corner of K4 sits on C(3,2)=3 triangles,
    lcc=1.0 for the degree-3 corners; the pendant node has none."""
    from porcupine_spark.operators.components import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 9)], "u long, v long")
    out = {r.node: r for r in triangle_counts(edges).collect()}
    for n in (1, 2, 3):
        assert out[n].triangles == 3 and out[n].degree == 3
        assert out[n].lcc_ppm == 1_000_000
    # node 4 has degree 4 (extra pendant edge): 3 triangles over C(4,2)=6
    assert out[4].triangles == 3 and out[4].degree == 4
    assert out[4].lcc_ppm == 500_000
    assert out[9].triangles == 0 and out[9].lcc_ppm == 0


def test_triangle_counts_skew_star(spark):
    """A star graph (max-skew hub) has ZERO triangles and — the scale
    property under test — the hub generates no wedge blowup: orientation
    sends every spoke->hub edge INTO the hub (spokes have lower degree),
    so the hub's out-degree is 0 and the wedge join emits nothing."""
    from porcupine_spark.operators.components import triangle_counts

    star = [(i, 100) for i in range(1, 40)]
    out = triangle_counts(spark.createDataFrame(star, "u long, v long"))
    rows = out.collect()
    assert all(r.triangles == 0 for r in rows)
    hub = next(r for r in rows if r.node == 100)
    assert hub.degree == 39 and hub.lcc_ppm == 0


def test_zorder_layout_audit_tile_spans(spark):
    """Every tile's value span is <= 16 in BOTH dimensions — the
    data-skipping property the write path depends on."""
    from porcupine_spark.plans.registry import load_all_plans

    out = load_all_plans()["zorder_layout_audit"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r.max_x - r.min_x <= 15
        assert r.max_y - r.min_y <= 15


def test_dsir_lean_scores_planted_signal(spark):
    """Target docs use a disjoint vocabulary: every target token leans
    (its buckets carry only target mass), no raw-only token does —
    scores separate to 1e6 vs 0 and the keep flag follows."""
    from porcupine_spark.operators.curation import dsir_lean_scores
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha beta gamma alpha", True),
        (2, "beta gamma alpha beta", True),
        (3, "delta epsilon zeta zeta", False),
        (4, "epsilon delta delta zeta", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {r.doc_id: r for r in dsir_lean_scores(docs, F.col("is_t")).collect()}
    assert out[1].lean_ppm == 1_000_000 and out[1].keep
    assert out[2].lean_ppm == 1_000_000 and out[2].keep
    assert out[3].lean_ppm == 0 and not out[3].keep
    assert out[4].lean_ppm == 0 and not out[4].keep


def test_kcore_peel_planted(spark):
    """K4 with a pendant chain: the chain peels layer by layer, K4 is
    the 3-core."""
    from porcupine_spark.operators.components import kcore_peel

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(k4 + chain, "u long, v long")
    out = {r.node: r for r in kcore_peel(edges, k=3, rounds=6).collect()}
    for n in (1, 2, 3, 4):
        assert out[n].in_core and out[n].removed_round == 0
    # whole chain has degree < 3 from round 1
    for n in (10, 11, 12):
        assert not out[n].in_core and out[n].removed_round == 1


def test_kcore_peel_converges_within_budget(spark):
    """On the real co-purchase graph the fixed budget IS the fixpoint:
    two extra rounds change nothing (so the result is the true k-core)."""
    from pyspark.sql import functions as F
    from porcupine_spark.operators.components import (
        KCORE_ROUNDS,
        TRI_MIN_SUPPORT,
        kcore_peel,
    )
    from porcupine_spark.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= TRI_MIN_SUPPORT)
        .select("u", "v")
    )
    base = {tuple(r) for r in kcore_peel(e, rounds=KCORE_ROUNDS).collect()}
    more = {tuple(r) for r in kcore_peel(e, rounds=KCORE_ROUNDS + 2).collect()}
    # survivors identical; removed rounds identical for all removed nodes
    assert {t for t in base if t[1] == 0} == {t for t in more if t[1] == 0}
    assert {t for t in base if 0 < t[1] < KCORE_ROUNDS} == {
        t for t in more if 0 < t[1] < KCORE_ROUNDS
    }


def test_jl_distortion_concentrates(spark):
    """JL with m=16 keeps squared-distance ratios within a constant
    band of 1 (std ~ sqrt(2/m) ~ 0.35) — the audit's reason to exist."""
    from porcupine_spark.plans.registry import load_all_plans

    rows = load_all_plans()["jl_distortion_audit"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) >= 10
    ppm = [r.distortion_ppm for r in rows]
    assert all(100_000 < p < 4_000_000 for p in ppm)
    mean = sum(ppm) / len(ppm)
    assert 600_000 < mean < 1_600_000
