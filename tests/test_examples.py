"""The reference's examples-as-E2E-tests genre (SURVEY §5): each
example pipeline runs end to end against seeded fixtures."""

import sys

from pyspark.sql import functions as F


def test_example1_users(spark, tmp_path):
    from examples.example1_users import CATALOG, build_task, seed_inputs
    from porcupine_spark.repetition import parse_index_range
    from porcupine_spark.run import run_pipeline

    indices = parse_index_range("[0..2]")
    seed_inputs(spark, str(tmp_path), indices)
    run_pipeline(
        build_task(indices), CATALOG, spark, root=str(tmp_path),
        mappings={
            "inputs/user": str(tmp_path) + "/Inputs/User-{userId}.json",
            "outputs/analysis": str(tmp_path / "Outputs/analysis.parquet"),
        },
    )
    out = spark.read.parquet(str(tmp_path / "Outputs/analysis.parquet"))
    rows = {(r.userId, r.letter): r.cnt for r in out.collect()}
    # User0 + Surname0 -> 'u' appears twice (User, Surname? no: u-s-e-r + s-u-r-n-a-m-e)
    assert rows[(0, "u")] == 2
    assert rows[(0, "s")] == 2
    assert set(out.select("userId").distinct().toPandas()["userId"]) == {0, 1, 2}


def test_example2_stocks(spark, tmp_path):
    from examples.example2_stocks import CATALOG, build_task, seed_inputs
    from porcupine_spark.run import run_pipeline

    comps = ["aapl", "fb"]
    seed_inputs(spark, str(tmp_path), comps)
    run_pipeline(
        build_task(comps), CATALOG, spark, root=str(tmp_path),
        mappings={
            "inputs/stock": str(tmp_path) + "/Inputs/Stock-{company}.json",
            "outputs/smoothed": str(tmp_path / "Outputs/smoothed.csv"),
        },
    )
    out = spark.read.csv(str(tmp_path / "Outputs/smoothed.csv"))
    assert out.count() == 28 * 2  # 28 days per company, headerless CSV
    # partitioned layout per company index
    assert (tmp_path / "Outputs/smoothed.csv/company=aapl").exists()


def test_example_radon(spark, tmp_path):
    from examples.example_radon import CATALOG, OPTIONS, build_task, seed_inputs
    from porcupine_spark.run import run_pipeline

    seed_inputs(spark, str(tmp_path))
    opts = OPTIONS.resolve({"min_log_radon": 0.5}, {})
    run_pipeline(
        build_task(opts["min_log_radon"]), CATALOG, spark, root=str(tmp_path),
        mappings={
            "inputs/radon": str(tmp_path / "Inputs/radon.csv"),
            "outputs/summary": str(tmp_path / "Outputs/summary.json"),
            "outputs/filtered": str(tmp_path / "Outputs/filtered.csv"),
        },
    )
    summary = spark.read.json(str(tmp_path / "Outputs/summary.json")).collect()[0]
    assert summary.n_obs == 5
    assert sorted(summary.states) == ["MN", "WI"]
    assert summary.n_counties == 3
    filtered = spark.read.option("header", True).csv(str(tmp_path / "Outputs/filtered.csv"))
    assert filtered.count() == 3  # log_radon > 0.5
