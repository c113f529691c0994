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


def test_example0_1_two_serials_one_value(spark, tmp_path):
    """example0/example0.1 (Example0_1.hs:19-33): one value through two
    serial layers of the same sink; the .yz layer run-length encodes
    via the serial's lmap pre-write transform."""
    from examples.example0_1 import CATALOG, build_task
    from porcupine_spark.run import run_pipeline

    run_pipeline(
        build_task("ab", [3, 4]),
        CATALOG,
        spark,
        root=str(tmp_path),
        mappings={"result": [f"{tmp_path}/result.txt", f"{tmp_path}/result.yz"]},
    )
    plain = [r.value for r in spark.read.text(f"{tmp_path}/result.txt").collect()]
    assert plain == ["aaabbbb"]
    rle = [r.value for r in spark.read.text(f"{tmp_path}/result.yz").collect()]
    assert rle == ["3a,4b,"]


def test_example_poke_http_catalog(spark, tmp_path):
    """The example-Poke port: an http-bound DataSource read through the
    catalog with a distributed per-id fan-out, analysis + summary sinks
    (ExamplePokeAPI.hs:44-103)."""
    from examples.example_poke import CATALOG, build_task, start_local_api
    from porcupine_spark.run import run_pipeline

    base_url, shutdown = start_local_api()
    try:
        indices = [1, 2, 3, 7]
        run_pipeline(
            build_task(indices),
            CATALOG,
            spark,
            root=str(tmp_path),
            mappings={
                "inputs/pokemon": f"{base_url}/api/v2/pokemon/{{pokemonId}}",
                "outputs/analysis": str(tmp_path / "Outputs/analysis.json"),
                "outputs/summary": str(tmp_path / "Outputs/summary.csv"),
            },
        )
    finally:
        shutdown()
    out = spark.read.json(str(tmp_path / "Outputs/analysis.json"))
    rows = {r.id: r.moveCount for r in out.collect()}
    assert rows == {i: i % 5 + 1 for i in indices}
    summary = spark.read.option("header", True).csv(str(tmp_path / "Outputs/summary.csv"))
    assert summary.count() == len(indices)


def test_example_curation(spark, tmp_path, sf_dir):
    """The curation showcase: task-layer composition (load >>> quality
    gate >>> near-dup removal >>> tee to two sinks) over the real
    documents table; curated output must be smaller than the input and
    the audit must account for exactly the curated docs."""
    from examples.example_curation import CATALOG, build_task

    from porcupine_spark.run import run_pipeline
    from porcupine_spark.tables import table_path

    run_pipeline(
        build_task(),
        CATALOG,
        spark,
        root=str(tmp_path),
        mappings={
            "corpus/raw": table_path(sf_dir, "documents"),
            "corpus/curated": f"{tmp_path}/curated.parquet",
            "corpus/audit": f"{tmp_path}/audit.parquet",
        },
    )
    raw = spark.read.parquet(table_path(sf_dir, "documents"))
    curated = spark.read.parquet(f"{tmp_path}/curated.parquet")
    audit = spark.read.parquet(f"{tmp_path}/audit.parquet")
    n_raw, n_cur = raw.count(), curated.count()
    assert 0 < n_cur < n_raw  # both gates actually dropped docs
    assert audit.agg({"n_docs": "sum"}).collect()[0][0] == n_cur
    # near-dup removal really ran: no verified-duplicate pair survives
    from porcupine_spark.operators.dedup import DEDUP_CANON_T, minhash_lsh_pairs

    survivors = minhash_lsh_pairs(curated).filter(f"jaccard >= {DEDUP_CANON_T}")
    assert survivors.count() == 0


def test_example_incremental_ingest(spark, tmp_path, sf_dir):
    """The ingest pipeline's accepted set is exactly the batch minus
    the docs the oracled incremental_dedup query flags (exact OR
    near) — pipeline and query agree on the same artifacts."""
    from examples import example_incremental as ex

    wd = str(tmp_path / "incr")
    ex.main(wd, sf_dir)
    accepted = {r.doc_id for r in spark.read.parquet(f"{wd}/accepted.parquet").collect()}

    from porcupine_spark.operators.dedup import incremental_dedup

    flags = incremental_dedup(spark, sf_dir).collect()
    expected = {r.doc_id for r in flags if not (r.exact_dup or r.near_dup)}
    assert accepted == expected


def test_example0_minimal_pipeline(spark, tmp_path):
    """The bare example0 (Example0.hs:15-29): options -> repeated char
    -> plain text sink through the full run machinery."""
    from examples.example0 import CATALOG, build_task
    from porcupine_spark.run import run_pipeline

    run_pipeline(
        build_task("z", 5),
        CATALOG,
        spark,
        root=str(tmp_path),
        mappings={"result": f"{tmp_path}/result.txt"},
    )
    got = [r.value for r in spark.read.text(f"{tmp_path}/result.txt").collect()]
    assert got == ["zzzzz"]


def test_example_stock_http_sliding_mean(spark, tmp_path):
    """The example-Stock port (ExampleStockAPI.hs:43-104): HTTP-bound
    chart source, option-driven multi-company fan-out, sliding-mean
    smoothing, JSON + Vega-Lite sinks."""
    import json as _json

    from examples.example_stock import CATALOG, SLIDE, build_task, start_local_api
    from porcupine_spark.run import run_pipeline

    base_url, shutdown = start_local_api()
    try:
        companies = ["aapl", "goog"]
        run_pipeline(
            build_task(companies),
            CATALOG,
            spark,
            root=str(tmp_path),
            mappings={
                "inputs/stock": f"{base_url}/1.0/stock/{{idcompany}}/batch?types=chart&range=1y",
                "outputs/stock_smoothed": str(tmp_path / "Outputs/StockSmoothed.json"),
                "outputs/stock_vegalite": str(tmp_path / "Outputs/VegaLite.json"),
            },
        )
    finally:
        shutdown()
    sm = spark.read.json(str(tmp_path / "Outputs/StockSmoothed.json"))
    rows = sm.collect()
    assert {r.company for r in rows} == set(companies)
    assert len(rows) == 30 * len(companies)  # 30-day charts
    # the forward sliding mean's LAST day equals its own close (window
    # of 1) and the first day averages the first SLIDE closes
    by_c = {}
    for r in rows:
        by_c.setdefault(r.company, []).append((r.date, r.close))
    import statistics

    for comp in companies:
        days = sorted(by_c[comp])
        assert len(days) == 30
    # vega-lite spec: one row per company, parseable JSON with the data
    vl = spark.read.json(str(tmp_path / "Outputs/VegaLite.json"))
    specs = {r.company: _json.loads(r.spec) for r in vl.collect()}
    assert set(specs) == set(companies)
    for comp, spec in specs.items():
        assert spec["mark"] == "line"
        assert len(spec["data"]["values"]) == 30
        assert set(spec["data"]["values"][0]) == {"Date", "Price"}
        # the encoding must be a REAL nested object with both channels
        # (a renderer rejects a double-encoded string / missing key)
        assert spec["encoding"]["x"] == {"field": "Date", "type": "temporal"}
        assert spec["encoding"]["y"] == {"field": "Price", "type": "quantitative"}
