"""Reference example-Poke re-expressed (porcupine-http/examples/
example-Poke/ExamplePokeAPI.hs): an HTTP JSON API as a catalog-bound
DataSource, an index-range option choosing which pokemon to load, a
per-pokemon analysis (move count), and a summary sink.

Reference pipeline: ``getOption pokemonIds >>> parMapTask "pokemonId"
(loadData pokemonFile >>> analyzeOnePokemon >>> writeData
analysisFile) >>> writeSummary`` (ExamplePokeAPI.hs:44-103);
``pokemonFile`` is a JSON DataSource the mappings bind to
``https://pokeapi.co/api/v2/pokemon/{pokemonId}`` through the http
accessor (HTTP.hs:58-92: GET read, extension-less URL, JSON serial).

Spark-first shape: the per-id fetch fan-out runs on EXECUTORS
(``BoundCatalog.read_many`` -> mapInPandas), not one driver thread per
id; the "analysis" is one DataFrame pass over every pokemon at once;
both sinks are ordinary catalog writes. The runnable example serves a
tiny local JSON API so it works offline — point the mapping at the
real PokeAPI host to run against the network.

Run:  python examples/example_poke.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from porcupine_spark.catalog import Catalog, Dataset
from porcupine_spark.config import OptionField, OptionsRecord
from porcupine_spark.run import run_pipeline
from porcupine_spark.serials import SerialSet, csv_serial, json_serial
from porcupine_spark.session import get_spark
from porcupine_spark.task import io_task
from porcupine_spark.task_ext import tee

CATALOG = Catalog(
    [
        Dataset.source(
            "inputs/pokemon",
            SerialSet(json_serial()),
            schema="id long, name string, moves array<string>",
        ),
        Dataset.sink("outputs/analysis", SerialSet(json_serial())),
        Dataset.sink("outputs/summary", SerialSet(csv_serial(header=True))),
    ]
)

OPTIONS = OptionsRecord(
    "settings",
    [
        OptionField("pokemonIds", "[1..8]", "the indices of the pokemon to load"),
    ],
)


def build_task(indices: list[int]):
    """loadData-over-parMapTask becomes ONE distributed fan-out read +
    one analysis pass (analyzeOnePokemon = move count,
    ExamplePokeAPI.hs:52-90)."""
    fetch = io_task(
        lambda ctx, _: ctx.bound.read_many(
            ctx.spark, "inputs/pokemon", [{"pokemonId": i} for i in indices]
        ),
        name="fetch:pokemon",
    )
    return fetch >> tee(
        (
            "outputs/analysis",
            lambda df: df.select("id", "name", F.size("moves").alias("moveCount")),
        ),
        (
            "outputs/summary",
            lambda df: df.select(
                "name", F.size("moves").alias("numMoves")
            ).orderBy("name"),
        ),
    )


def start_local_api():
    """A stand-in PokeAPI: GET /api/v2/pokemon/{id} returns a JSON
    document. Returns (base_url, shutdown)."""
    import http.server
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            ident = int(self.path.rstrip("/").rsplit("/", 1)[1])
            body = json.dumps(
                {
                    "id": ident,
                    "name": f"poke{ident:03d}",
                    "moves": [f"move{j}" for j in range(ident % 5 + 1)],
                }
            ).encode()
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


def main(workdir: str = "/tmp/porcupine_poke") -> None:
    from porcupine_spark.repetition import parse_index_range

    spark = get_spark("example_poke")
    base_url, shutdown = start_local_api()
    try:
        opts = OPTIONS.resolve({}, {})
        indices = parse_index_range(opts["pokemonIds"])
        run_pipeline(
            build_task(indices),
            CATALOG,
            spark,
            root=workdir,
            mappings={
                "inputs/pokemon": f"{base_url}/api/v2/pokemon/{{pokemonId}}",
                "outputs/analysis": f"{workdir}/Outputs/analysis.json",
                "outputs/summary": f"{workdir}/Outputs/summary.csv",
            },
        )
    finally:
        shutdown()
    out = spark.read.json(f"{workdir}/Outputs/analysis.json")
    print(f"analyzed {out.count()} pokemon")
    out.orderBy("id").show(10, False)


if __name__ == "__main__":
    main(*sys.argv[1:])
