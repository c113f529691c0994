"""Tests for the Python DataSource (sources/pyds.py): partition
planning, filter pushdown into the Python reader, streaming offsets,
determinism, and catalog routing through the synth:// accessor."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def synth(spark):
    from porcupine_spark.sources.pyds import register_synth_source

    register_synth_source(spark)
    return spark


def _load(spark, **opts):
    r = spark.read.format("porcupine_synth")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


class TestBatch:
    def test_partition_planning(self, synth):
        df = _load(synth, n=200, parts=4)
        assert df.count() == 200
        assert df.rdd.getNumPartitions() == 4
        assert df.select("doc_id").distinct().count() == 200

    def test_schema_matches_documents(self, synth, sf_dir):
        from porcupine_spark.tables import load_table

        df = _load(synth, n=10)
        docs = load_table(synth, sf_dir, "documents")
        assert [f.name for f in df.schema.fields] == [
            f.name for f in docs.schema.fields]

    def test_deterministic_across_reads(self, synth):
        a = sorted(map(tuple, _load(synth, n=50, seed=7).collect()))
        b = sorted(map(tuple, _load(synth, n=50, seed=7, parts=13).collect()))
        assert a == b  # partitioning must not change content
        c = sorted(map(tuple, _load(synth, n=50, seed=8).collect()))
        assert a != c

    def test_n_chars_consistent(self, synth):
        bad = _load(synth, n=100).filter(
            F.length("text") != F.col("n_chars")).count()
        assert bad == 0


class TestPushdown:
    def test_range_filters_prune_generation(self, synth):
        df = _load(synth, n=1000, parts=4)
        assert df.filter("doc_id >= 900").count() == 100
        assert df.filter("doc_id < 50").count() == 50
        assert df.filter("doc_id >= 10 AND doc_id <= 19").count() == 10
        assert df.filter("doc_id = 423").count() == 1
        assert df.filter("doc_id >= 1000").count() == 0

    def test_filters_reach_python_reader(self, synth):
        # the reader absorbs the bound: generated row count == output
        # row count (a post-scan filter would generate all 1000)
        from porcupine_spark.sources.pyds import SynthReader
        from pyspark.sql.datasource import GreaterThanOrEqual

        r = SynthReader({"n": "1000", "parts": "4"})
        leftover = list(r.pushFilters([GreaterThanOrEqual(("doc_id",), 990)]))
        assert leftover == []
        parts = r.partitions()
        generated = sum(len(list(r.read(p))) for p in parts)
        assert generated == 10

    def test_non_docid_filter_returned_to_spark(self, synth):
        from porcupine_spark.sources.pyds import SynthReader
        from pyspark.sql.datasource import EqualTo

        r = SynthReader({"n": "100"})
        left = list(r.pushFilters([EqualTo(("lang",), "en")]))
        assert len(left) == 1  # Spark must re-check it
        # end-to-end: results still correct
        df = _load(synth, n=100)
        n_en = df.filter("lang = 'en'").count()
        assert 0 < n_en < 100


class TestStream:
    def test_offsets_cover_exactly_n(self, synth):
        q = (
            synth.readStream.format("porcupine_synth")
            .option("n", 55).option("batch", 20).load()
            .writeStream.format("memory").queryName("pyds_sq").start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        t = synth.table("pyds_sq")
        ids = sorted(r.doc_id for r in t.select("doc_id").collect())
        assert ids == list(range(55))  # exactly-once, no dup batches

    def test_stream_rows_equal_batch_rows(self, synth):
        q = (
            synth.readStream.format("porcupine_synth")
            .option("n", 30).option("batch", 7).option("seed", 3).load()
            .writeStream.format("memory").queryName("pyds_sq2").start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(map(tuple, synth.table("pyds_sq2").collect()))
        want = sorted(map(tuple, _load(synth, n=30, seed=3).collect()))
        assert got == want


class TestCatalogRouting:
    def test_synth_scheme_reads_through_catalog(self, synth, tmp_path):
        from porcupine_spark.accessors import accessor_for, unregister_accessor
        from porcupine_spark.catalog import Catalog, Dataset
        from porcupine_spark.serials import SerialSet, parquet_serial
        from porcupine_spark.sources.pyds import (
            SYNTH_SCHEMA, register_synth_scheme)

        register_synth_scheme()
        try:
            assert accessor_for("synth://docs?n=40") is not None
            cat = Catalog([
                Dataset("docs", SerialSet(parquet_serial()),
                        schema=SYNTH_SCHEMA)])
            bound = cat.bind(str(tmp_path), {"docs": "synth://docs?n=40&seed=2"})
            df = bound.read(synth, "docs")
            assert df.count() == 40
            assert df.select("doc_id").distinct().count() == 40
        finally:
            unregister_accessor("synth")


class TestJsonlWriteProtocol:
    SCHEMA = "a long, b string"

    def _register(self, spark):
        from porcupine_spark.sources.jsonl import register_jsonl_source

        register_jsonl_source(spark)

    def test_roundtrip_and_partition_per_file(self, spark, tmp_path):
        self._register(spark)
        path = str(tmp_path / "out")
        df = spark.createDataFrame([(i, f"x{i}") for i in range(100)], self.SCHEMA)
        df.repartition(4).write.format("porcupine_jsonl").option(
            "path", path).mode("append").save()
        import os
        files = [f for f in os.listdir(path) if f.endswith(".jsonl")]
        assert len(files) == 4
        assert not any(f.startswith(".staging-") for f in os.listdir(path))
        back = (spark.read.format("porcupine_jsonl").schema(self.SCHEMA)
                .option("path", path).load())
        assert back.rdd.getNumPartitions() == 4
        assert sorted((r.a, r.b) for r in back.collect()) == [
            (i, f"x{i}") for i in range(100)]

    def test_overwrite_replaces_visible_files(self, spark, tmp_path):
        self._register(spark)
        path = str(tmp_path / "out2")
        w = lambda rows, mode: (spark.createDataFrame(rows, self.SCHEMA)
                                .coalesce(1).write.format("porcupine_jsonl")
                                .option("path", path).mode(mode).save())
        w([(1, "old")], "append")
        w([(2, "new")], "overwrite")
        back = (spark.read.format("porcupine_jsonl").schema(self.SCHEMA)
                .option("path", path).load())
        assert [(r.a, r.b) for r in back.collect()] == [(2, "new")]

    def test_failed_job_leaves_no_visible_output(self, spark, tmp_path):
        self._register(spark)
        import os
        from pyspark.sql import functions as F

        path = str(tmp_path / "out3")
        os.makedirs(path)
        df = spark.createDataFrame([(i, "x") for i in range(10)], self.SCHEMA)
        from pyspark.sql.functions import udf
        boom = udf(lambda a: (_ for _ in ()).throw(ValueError("boom")) if a == 7
                   else "ok")
        failing = df.select("a", boom("a").alias("b"))
        import pytest as _pytest
        with _pytest.raises(Exception):
            (failing.write.format("porcupine_jsonl")
             .option("path", path).mode("append").save())
        visible = [f for f in os.listdir(path) if f.endswith(".jsonl")]
        assert visible == []  # nothing published
        # abort removed the whole job staging dir (incl. killed tasks')
        assert [f for f in os.listdir(path) if f.startswith(".staging-")] == []
