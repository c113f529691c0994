"""Engine extension surfaces beyond the registered query corpus:
Python UDTFs, Arrow-native grouped maps (applyInArrow), and the
cogroup attribution operator's per-group edge cases.

These APIs are deliberately NOT on any registered query's hot path —
UDTFs execute row-at-a-time Python (the documented slow path; the
corpus keeps zero row-Python in registered plans) — but a user porting
a pipeline needs them available and proven."""

import pyarrow as pa
import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.functions import udtf


class TestUDTF:
    def test_json_kv_flatten_udtf(self, spark):
        @udtf(returnType="k string, v string")
        class JsonKV:
            def eval(self, s: str):
                import json

                if s is None:
                    return
                for k, v in json.loads(s).items():
                    yield k, str(v)

        spark.udtf.register("json_kv", JsonKV)
        df = spark.createDataFrame(
            [Row(id=1, j='{"a": 1, "b": "x"}'), Row(id=2, j='{"a": 2}')]
        )
        df.createOrReplaceTempView("jt")
        out = spark.sql(
            "SELECT id, k, v FROM jt, LATERAL json_kv(j) ORDER BY id, k"
        ).collect()
        assert [(r.id, r.k, r.v) for r in out] == [
            (1, "a", "1"), (1, "b", "x"), (2, "a", "2")]

    def test_udtf_terminate_emits_summary(self, spark):
        # terminate() runs once per partition slice — the UDTF
        # aggregation hook (here: count rows seen)
        @udtf(returnType="tag string, n bigint")
        class CountRows:
            def __init__(self):
                self.n = 0

            def eval(self, x: int):
                self.n += 1

            def terminate(self):
                yield "seen", self.n

        spark.udtf.register("count_rows", CountRows)
        df = spark.range(7).coalesce(1)
        df.createOrReplaceTempView("rng")
        rows = spark.sql(
            "SELECT * FROM count_rows(TABLE(rng))"
        ).collect()
        assert [(r.tag, r.n) for r in rows] == [("seen", 7)]


class TestApplyInArrow:
    def test_grouped_arrow_sum_matches_sql(self, spark, sf_dir):
        from porcupine_spark.tables import load_table

        ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")

        def counts(table: pa.Table) -> pa.Table:
            et = table.column("event_type")[0].as_py()
            return pa.table(
                {"event_type": [et], "n": [table.num_rows]},
                schema=pa.schema(
                    [("event_type", pa.string()), ("n", pa.int64())]
                ),
            )

        got = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .applyInArrow(counts, schema="event_type string, n long")
            .collect()
        }
        want = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want


class TestCogroupEdges:
    def _run(self, spark, monkeypatch, rows):
        from porcupine_spark.operators import asof as A

        df = spark.createDataFrame(
            [Row(event_id=i, ts=ts, user_id=u, event_type=et, value=0.0,
                 props="{}")
             for i, (u, et, ts) in enumerate(rows)]
        )
        monkeypatch.setattr(A, "load_table", lambda *a, **k: df)
        return {
            r.user_id: r
            for r in A.cogroup_purchase_view_attribution(spark, "x").collect()
        }

    def test_no_views_user(self, spark, monkeypatch):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        out = self._run(spark, monkeypatch, [
            (1, "purchase", t0),
            (2, "purchase", t0),
            (2, "view", t0 - dt.timedelta(seconds=10)),
        ])
        assert out[1].n_views == 0 and out[1].n_attributed == 0
        assert out[2].n_attributed == 1

    def test_window_boundary_inclusive(self, spark, monkeypatch):
        import datetime as dt
        from porcupine_spark.operators.asof import ATTRIB_WINDOW_S

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        out = self._run(spark, monkeypatch, [
            (1, "purchase", t0),
            (1, "view", t0 - dt.timedelta(seconds=ATTRIB_WINDOW_S)),  # on edge
            (2, "purchase", t0),
            (2, "view", t0 - dt.timedelta(seconds=ATTRIB_WINDOW_S, microseconds=1)),
        ])
        assert out[1].n_attributed == 1  # boundary inclusive
        assert out[2].n_attributed == 0  # one us past

    def test_view_only_user_emits_nothing(self, spark, monkeypatch):
        import datetime as dt

        out = self._run(spark, monkeypatch, [
            (9, "view", dt.datetime(2024, 1, 1)),
        ])
        assert 9 not in out  # no purchases -> no attribution row
