"""Task composition, folds, repetition (SURVEY §2.2, §2.4, §2.7)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.folds import Fold, pandas_fold, run_fold, run_fold_grouped
from porcupine_spark.repetition import indices_dataframe, parse_index_range
from porcupine_spark.run import run_pipeline
from porcupine_spark.task import RunCtx, arr, io_task, load, write, write_eff


# ---- property: identity task (prop_runnable_id, PTask.hs:53-56) ----
@given(st.integers())
@settings(max_examples=50, deadline=None)
def test_identity_task_property(x):
    ident = arr(lambda v: v)
    assert ident.run(None, x) == x


def test_composition_accumulates_requirements():
    t = load("in/a") >> arr(lambda df: df) >> write("out/b")
    assert t.reads == {"in/a"}
    assert t.writes == {"out/b"}
    fan = load("in/a").fanout(load("in/c"))
    assert fan.reads == {"in/a", "in/c"}


def test_in_subtree_reroots_requirements():
    """taskInSubtree re-roots both requirements and access (PTask.hs:214-219)."""
    t = load("x").in_subtree("ns")
    assert t.reads == {"ns/x"}


def test_run_pipeline_checks_requirements(spark):
    t = load("missing")
    with pytest.raises(KeyError):
        run_pipeline(t, Catalog([]), spark)


def test_end_to_end_pipeline(spark, tmp_path):
    """example1 shape: load -> transform -> write through the catalog."""
    src = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    src.write.parquet(str(tmp_path / "in.parquet"))
    cat = Catalog([Dataset.source("in"), Dataset.sink("out")])
    task = (
        load("in")
        >> arr(lambda df: df.withColumn("v2", F.col("v") * 2))
        >> write("out")
    )
    run_pipeline(
        task, cat, spark, root=str(tmp_path),
        mappings={"in": str(tmp_path / "in.parquet")},
    )
    out = spark.read.parquet(str(tmp_path / "out.parquet"))
    assert {r.v2 for r in out.collect()} == {20.0, 40.0}


def test_write_eff_skips_compute_when_unmapped(spark, tmp_path):
    """writeEffData + toTaskAndWrite: computation skipped entirely when
    the sink is unmapped (Caching.hs:97-98)."""
    calls = []

    def expensive(ctx):
        calls.append(1)
        return ctx.spark.createDataFrame([(1,)], "id long")

    cat = Catalog([Dataset.sink("maybe_out")])
    t = write_eff("maybe_out", expensive)
    run_pipeline(t, cat, spark, root=str(tmp_path), mappings={"maybe_out": None})
    assert calls == []  # dead-sink pruned
    run_pipeline(t, cat, spark, root=str(tmp_path))
    assert calls == [1]


def test_path_template_repetition(spark, tmp_path):
    """Repetition splices the index into paths (Repetition/Internal.hs:
    102-131): write per-index occurrences, read one back."""
    cat = Catalog([Dataset("user")])
    bound = cat.bind(str(tmp_path), {"user": str(tmp_path) + "/User-{userId}.parquet"})
    for uid in (0, 1):
        df = spark.createDataFrame([(uid, f"name{uid}")], "id long, name string")
        bound.write(df, "user", variables={"userId": uid})
    back = bound.read(spark, "user", variables={"userId": 1}).collect()
    assert back[0].name == "name1"


# ---- folds ----
def test_applicative_fold_one_pass(spark):
    """ExampleRadon fold: Summary <$> length <*> nub state <*> nub-len
    county -> ONE agg pass."""
    df = spark.createDataFrame(
        [("MN", "A"), ("MN", "B"), ("WI", "A")], "state string, county string"
    )
    fold = (
        Fold.length("n")
        & Fold.nub("state", "states")
        & Fold.nub_length("county", "n_counties")
    )
    out = run_fold(df, fold).collect()[0]
    assert out.n == 3
    assert sorted(out.states) == ["MN", "WI"]
    assert out.n_counties == 2
    # single pass: exactly one Aggregate in the plan
    plan = run_fold(df, fold)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_fold_premap_prefilter_postmap(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "x int")
    fold = (
        Fold.sum_("y", "total")
        .premap(lambda d: d.withColumn("y", F.col("x") * 10))
        .prefilter(F.col("x") % 2 == 0)
        .postmap(lambda d: d.withColumn("total2", F.col("total") * 2))
    )
    out = run_fold(df, fold).collect()[0]
    assert out.total == 60  # (2+4)*10
    assert out.total2 == 120


def test_fold_zip_name_conflict():
    with pytest.raises(ValueError):
        Fold.length("n") & Fold.length("n")


def test_grouped_fold(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 5)], "k string, v int")
    out = {
        r.k: (r.n, r.total)
        for r in run_fold_grouped(df, ["k"], Fold.length("n") & Fold.sum_("v", "total")).collect()
    }
    assert out == {"a": (2, 3), "b": (1, 5)}


def test_pandas_fold_escape_hatch(spark):
    """arrowFold: opaque per-group step via applyInPandas."""
    df = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 5.0)], "k string, v double")

    def step(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "spread": [pdf["v"].max() - pdf["v"].min()]})

    out = {r.k: r.spread for r in pandas_fold(df, ["k"], step, "k string, spread double").collect()}
    assert out == {"a": 2.0, "b": 0.0}


# ---- repetition ----
def test_parse_index_range():
    assert parse_index_range(5) == [5]
    assert parse_index_range("0..3") == [0, 1, 2, 3]
    assert parse_index_range("[0..2, 7, 10..11]") == [0, 1, 2, 7, 10, 11]
    assert parse_index_range("[]") == []
    assert parse_index_range(["1..2", 9]) == [1, 2, 9]


def test_indices_dataframe(spark):
    df = indices_dataframe(spark, [1, 5])
    assert sorted(r.idx for r in df.collect()) == [1, 5]


def test_io_task_and_namespace(spark, tmp_path):
    seen = []

    def probe(ctx: RunCtx, x):
        seen.append(ctx.namespace)
        return x

    t = io_task(probe).named("step1")
    run_pipeline(t, Catalog([]), spark, root=str(tmp_path))
    assert seen == [("step1",)]


def test_fold_with_init_and_premap_init(spark):
    """FoldA's parameterized accumulator init + premapInitA
    (FoldA.hs:120-144): exprs built from a run-time init value, the
    init transformable, and <*> sharing one init across zipped folds."""
    from pyspark.sql import functions as F

    from porcupine_spark.folds import Fold, run_fold

    df = spark.createDataFrame([(1,), (2,), (3,)], "x long")

    # accumulator starts at `init`: sum-with-offset
    offset_sum = Fold.with_init(
        lambda i: (F.sum("x") + F.lit(i),), ("offsum",)
    )
    assert run_fold(df, offset_sum, init=10).collect()[0].offsum == 16

    # premapInitA: init arrives as a dict, mapped down to the offset
    mapped = offset_sum.premap_init(lambda cfg: cfg["offset"])
    assert run_fold(df, mapped, init={"offset": 100}).collect()[0].offsum == 106

    # <*> shares the init; the plain side ignores it; single Aggregate
    both = mapped.zip(Fold.length("n"))
    row = run_fold(df, both, init={"offset": 1}).collect()[0]
    assert (row.offsum, row.n) == (7, 3)
