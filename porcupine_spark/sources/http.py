"""HTTP source/sink adapter — the porcupine-http accessor re-done for
Spark's execution model.

Reference: HTTP locations with configurable verbs/content-type/timeout
(porcupine-http/src/Data/Locations/Accessors/HTTP.hs:58-92,127-153).
Spark has NO native HTTP datasource, and pretending one exists would
put a network client inside a scan. Honest design (SURVEY §7 risk #5):
the *fetch fan-out* is distributed — URLs become a DataFrame, each
partition fetches its slice with bounded concurrency — but the
operator is explicit about being IO-bound, not a columnar scan.

``urllib`` only (no extra deps); fetches run inside mapInPandas so a
1000-URL fan-out uses the cluster, while a single config fetch stays
on the driver (fetch_one).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FETCH_SCHEMA = "url string, status int, body binary, error string"


def fetch_one(
    url: str, method: str = "GET", timeout_s: float = 10.0, headers: dict | None = None,
    data: bytes | None = None,
) -> tuple[int, bytes]:
    """Driver-side single fetch (configs, small options files)."""
    import urllib.request

    req = urllib.request.Request(url, method=method, data=data, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
        return resp.status, resp.read()


def fetch_distributed(
    spark: SparkSession,
    urls: list[str],
    method: str = "GET",
    timeout_s: float = 10.0,
    headers: dict | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Parallel fetch: urls -> (url, status, body, error) DataFrame.
    Per-URL failures are rows, not job failures (tryLoadDataStream
    semantics, VirtualFileAccess.hs:114-122)."""
    hdrs = dict(headers or {})
    n_part = partitions or max(1, min(len(urls) // 4, 64))
    url_df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(n_part)

    def fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.request

        for pdf in batches:
            rows = []
            for u in pdf["url"]:
                try:
                    req = urllib.request.Request(u, method=method, headers=hdrs)
                    with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
                        rows.append((u, resp.status, resp.read(), None))
                except Exception as e:  # noqa: BLE001
                    rows.append((u, -1, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=["url", "status", "body", "error"])

    return url_df.mapInPandas(fetch_batch, schema=FETCH_SCHEMA)


def json_bodies_to_df(spark: SparkSession, fetched: DataFrame, schema=None) -> DataFrame:
    """Decode JSON bodies into rows (spark.read.json over the decoded
    strings), keeping the url for provenance."""
    from pyspark.sql import functions as F

    ok = fetched.filter(F.col("status").between(200, 299)).select(
        "url", F.decode(F.col("body"), "UTF-8").alias("body_str")
    )
    if schema is not None:
        return ok.select("url", F.from_json("body_str", schema).alias("j")).select("url", "j.*")
    # schema-less: sample-infer on the driver from a few bodies
    sample = [r.body_str for r in ok.limit(20).collect()]
    if not sample:
        raise ValueError("no successful JSON bodies to infer a schema from")
    inferred = spark.read.json(spark.sparkContext.parallelize(sample)).schema
    return ok.select("url", F.from_json("body_str", inferred).alias("j")).select("url", "j.*")


def read_url_via_serial(spark: SparkSession, url: str, serial, schema=None) -> DataFrame:
    """Read one http(s) location through a dataset's serial — the
    catalog-bound read path (HTTP.hs:58-92: readBSS streams the body,
    the serial deserializes it). A single document fetch is driver-side
    (like a config read); the body is then parallelized so the decode
    and everything downstream is a normal distributed plan. For
    many-URL fan-out use ``fetch_distributed`` (BoundCatalog.read_many
    routes there)."""
    status, body = fetch_one(url)
    if not (200 <= status <= 299):
        raise IOError(f"GET {url} -> HTTP {status}")
    text = body.decode("utf-8")
    sc = spark.sparkContext
    if serial.format == "json":
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in serial.options.items():
            reader = reader.option(k, v)
        df = reader.json(sc.parallelize([text]))
    elif serial.format == "csv":
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in serial.options.items():
            reader = reader.option(k, v)
        df = reader.csv(sc.parallelize(text.splitlines()))
    elif serial.format == "text":
        df = spark.createDataFrame([(line,) for line in text.splitlines()], "value string")
    else:
        raise ValueError(
            f"serial format {serial.format!r} cannot deserialize an http body "
            "(json/csv/text only — columnar formats need a filesystem location)"
        )
    return serial.post_read(df) if serial.post_read else df


def write_df_to_url(df: DataFrame, url: str, serial, method: str = "POST") -> None:
    """Write a DataFrame to one http(s) location through its serial
    (HTTP.hs:127-153: writeBSS POSTs the serialized document). HTTP
    sinks are single-document by contract in the reference, so the
    serialization is driver-side; large distributed posts go through
    ``post_distributed``."""
    if serial.pre_write:
        df = serial.pre_write(df)
    if serial.format == "json":
        body = "\n".join(df.toJSON().collect()).encode("utf-8")
        ctype = "application/json"
    elif serial.format == "csv":
        pdf = df.toPandas()
        sep = serial.options.get("sep", ",")
        header = serial.options.get("header", "true") == "true"
        body = pdf.to_csv(index=False, sep=sep, header=header).encode("utf-8")
        ctype = "text/csv"
    elif serial.format == "text":
        col = df.columns[0]
        body = "\n".join(str(r[col]) for r in df.select(col).collect()).encode("utf-8")
        ctype = "text/plain"
    else:
        raise ValueError(
            f"serial format {serial.format!r} cannot serialize to an http body"
        )
    status, _ = fetch_one(
        url, method=method, data=body, headers={"Content-Type": ctype}
    )
    if not (200 <= status <= 299):
        raise IOError(f"{method} {url} -> HTTP {status}")


def post_distributed(
    spark: SparkSession, df: DataFrame, url_col: str, payload_col: str,
    timeout_s: float = 10.0, headers: dict | None = None,
) -> DataFrame:
    """HTTP sink: POST each row's payload to its url (HTTP.hs write
    verbs :127-153). Returns per-row status."""
    hdrs = {"Content-Type": "application/json", **(headers or {})}

    def post_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.request

        for pdf in batches:
            rows = []
            for u, payload in zip(pdf[url_col], pdf[payload_col]):
                try:
                    body = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
                    req = urllib.request.Request(u, method="POST", data=body, headers=hdrs)
                    with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
                        rows.append((u, resp.status, None))
                except Exception as e:  # noqa: BLE001
                    rows.append((u, -1, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=["url", "status", "error"])

    return df.mapInPandas(post_batch, schema="url string, status int, error string")
