"""Reference example-Stock re-expressed (porcupine-http/examples/
example-Stock/ExampleStockAPI.hs): stock charts loaded from an HTTP
JSON API as a catalog-bound DataSource (``stockFile``,
ExampleStockAPI.hs:43-45, bound to the IEX-style URL per NASDAQ id),
an ``idcompany`` option choosing the companies (``parMapTask_
"idcompany" analyseStock``, :100-104), a sliding-mean smoothing
(``computeSmoothedCurve``, :72-86), and TWO sinks: the smoothed chart
as JSON (``stockSmoothed``, :62-64) and a Vega-Lite line-chart spec of
it (``stockToVegaLite``/``stockVegaLite``, :52-69).

Spark-first shape: the per-company fetch fan-out is ONE distributed
``read_many`` (executor-side GETs), the smoothing is a window frame
over all companies in one plan, and the Vega-Lite document is built
JVM-side (collect_list struct -> to_json) — one spec row per company,
no driver-side loop. The runnable example serves a tiny local JSON API
so it works offline; point the mapping at a real quote API to go live.

Run:  python examples/example_stock.py [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.config import OptionField, OptionsRecord
from porcupine_spark.run import run_pipeline
from porcupine_spark.serials import SerialSet, json_serial
from porcupine_spark.session import get_spark
from porcupine_spark.task import arr, io_task
from porcupine_spark.task_ext import tee

SLIDE = 10  # example2's msliding width; example-Stock uses the same machinery

CATALOG = Catalog(
    [
        Dataset.source(
            "inputs/stock",
            SerialSet(json_serial()),
            schema="chart array<struct<date:string, close:double>>",
        ),
        Dataset.sink("outputs/stock_smoothed", SerialSet(json_serial())),
        Dataset.sink("outputs/stock_vegalite", SerialSet(json_serial())),
    ]
)

OPTIONS = OptionsRecord(
    "settings",
    [
        OptionField(
            "idcompany", ["aapl"], "The NASDAQ ids of the companies to load"
        ),
    ],
)


def smooth(df):
    """computeSmoothedCurve (ExampleStockAPI.hs:72-86) as a window
    frame: per-company forward sliding mean over the exploded chart.
    The company rides the provenance ``url`` column read_many adds."""
    daily = df.select(
        F.regexp_extract("url", r"/stock/([^/]+)/", 1).alias("company"),
        F.explode("chart").alias("day"),
    ).select(
        "company",
        F.to_date("day.date").alias("date"),
        F.col("day.close").alias("close"),
    )
    w = W.partitionBy("company").orderBy("date").rowsBetween(0, SLIDE - 1)
    return daily.withColumn("smoothed", F.avg("close").over(w))


def vegalite(df):
    """stockToVegaLite (ExampleStockAPI.hs:52-60): the line-chart VLSpec
    per company, built JVM-side — collect the (Date, Price) columns
    into the spec's data.values and serialize with to_json."""
    values = F.sort_array(
        F.collect_list(
            F.struct(
                F.date_format("date", "yyyy-MM-dd").alias("Date"),
                F.col("smoothed").alias("Price"),
            )
        )
    )
    def channel(field: str, vtype: str):
        return F.struct(F.lit(field).alias("field"), F.lit(vtype).alias("type"))

    return df.groupBy("company").agg(
        F.to_json(
            F.struct(
                F.struct(values.alias("values")).alias("data"),
                F.lit(800).alias("width"),
                F.lit(500).alias("height"),
                F.lit("line").alias("mark"),
                # a real nested encoding object (stockToVegaLite's
                # position X/Y channels), not a double-encoded string
                F.struct(
                    channel("Date", "temporal").alias("x"),
                    channel("Price", "quantitative").alias("y"),
                ).alias("encoding"),
            )
        ).alias("spec")
    )


def build_task(companies: list[str]):
    """mainTask (ExampleStockAPI.hs:100-104): option-driven parMap over
    analyseStock — here one distributed fan-out + one smoothing plan +
    two sinks."""
    fetch = io_task(
        lambda ctx, _: ctx.bound.read_many(
            ctx.spark, "inputs/stock", [{"idcompany": c} for c in companies]
        ),
        name="fetch:stock",
    )
    return (
        fetch
        >> arr(smooth)
        >> tee(
            (
                "outputs/stock_smoothed",
                lambda df: df.select(
                    "company",
                    F.date_format("date", "yyyy-MM-dd").alias("date"),
                    F.col("smoothed").alias("close"),
                ).orderBy("company", "date"),
            ),
            ("outputs/stock_vegalite", vegalite),
        )
    )


def start_local_api():
    """A tiny offline stand-in for the IEX batch-chart endpoint
    (``/1.0/stock/<id>/batch?types=chart&range=1y``): deterministic
    30-day charts per company."""
    import http.server
    import json as _json
    import re
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            m = re.match(r"^/1\.0/stock/([a-z0-9]+)/batch", self.path)
            if not m:
                self.send_response(404)
                self.end_headers()
                return
            comp = m.group(1)
            seed = sum(ord(c) for c in comp)
            chart = [
                {
                    "date": f"2019-01-{d:02d}",
                    "close": round(100 + ((seed * d * 37) % 1000) / 100.0, 2),
                }
                for d in range(1, 31)
            ]
            body = _json.dumps({"chart": chart}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return f"http://127.0.0.1:{srv.server_address[1]}", srv.shutdown


def main(workdir: str = "/tmp/porcupine_example_stock") -> None:
    spark = get_spark("example_stock")
    base_url, shutdown = start_local_api()
    try:
        opts = OPTIONS.resolve({}, {})
        run_pipeline(
            build_task(list(opts["idcompany"])),
            CATALOG,
            spark,
            root=workdir,
            mappings={
                "inputs/stock": f"{base_url}/1.0/stock/{{idcompany}}/batch?types=chart&range=1y",
                "outputs/stock_smoothed": f"{workdir}/Outputs/StockSmoothed.json",
                "outputs/stock_vegalite": f"{workdir}/Outputs/StockSmoothedVegaLite.json",
            },
        )
        print(spark.read.json(f"{workdir}/Outputs/StockSmoothed.json").count(), "rows")
    finally:
        shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
