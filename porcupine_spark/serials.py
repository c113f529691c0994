"""Serialization layer — the reference's ``SerialsFor`` bundles
(porcupine-core/src/Data/Locations/SerializationMethod.hs:606-650)
re-expressed as a format registry driving ``spark.read`` / ``df.write``.

A ``Serial`` maps a file extension to a Spark format + options and
optional pre-write / post-read DataFrame transforms (the profunctor
``dimap``/``lmap``/``rmap`` of the reference: SerializationMethod.hs:
642-679 — a transform prepended to a writer / appended to a reader).
``SerialSet`` is the semigroup of serials attached to one dataset
(``<>`` merges, first-added is the default extension — mirroring
``serialDefaultExt`` SerializationMethod.hs:609,653-654).

Compression wrapping (``addZlibSerials`` SerializationMethod.hs:
708-723) maps to Spark's per-format codec option.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

Transform = Callable[[DataFrame], DataFrame]


@dataclass(frozen=True)
class Serial:
    """One (extension -> spark format) binding.

    Reference parity: JSONSerial/CSVSerial/PlainTextSerial/
    ByteStringSerial (SerializationMethod.hs:273-574). ``options``
    carry header/delimiter/compression (CSVSerial's fields, :445-453).
    """

    ext: str
    format: str  # spark datasource name: parquet/json/csv/text/binaryFile
    options: dict = field(default_factory=dict)
    pre_write: Transform | None = None  # lmap: applied before writing
    post_read: Transform | None = None  # rmap: applied after reading
    writable: bool = True
    readable: bool = True

    def with_options(self, **opts) -> "Serial":
        return replace(self, options={**self.options, **opts})

    def lmap(self, f: Transform) -> "Serial":
        """Prepend a pre-write transform (reference ``lmap``)."""
        prev = self.pre_write
        g = f if prev is None else (lambda df: prev(f(df)))
        return replace(self, pre_write=g)

    def rmap(self, f: Transform) -> "Serial":
        """Append a post-read transform (reference ``rmap``)."""
        prev = self.post_read
        g = f if prev is None else (lambda df: f(prev(df)))
        return replace(self, post_read=g)

    def read(self, spark: SparkSession, path: str, schema=None) -> DataFrame:
        if not self.readable:
            raise ValueError(f"serial for .{self.ext} is write-only")
        reader: DataFrameReader = spark.read.format(self.format)
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        df = reader.load(path)
        return self.post_read(df) if self.post_read else df

    def write(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        if not self.writable:
            raise ValueError(f"serial for .{self.ext} is read-only")
        if self.pre_write:
            df = self.pre_write(df)
        writer = df.write.format(self.format).mode(mode)
        for k, v in self.options.items():
            writer = writer.option(k, v)
        writer.save(path)


# the built-in serial constructors (reference: SerializationMethod.hs)
def parquet_serial(**opts) -> Serial:
    return Serial("parquet", "parquet", opts)


def json_serial(ext: str = "json", **opts) -> Serial:
    """JSONSerial / JSONSerialWithExt (SerializationMethod.hs:283-296):
    same codec bound to a custom extension when ``ext`` is given."""
    return Serial(ext, "json", opts)


def csv_serial(header: bool = True, sep: str = ",", ext: str = "csv", **opts) -> Serial:
    """CSVSerial: ext + header flag + delimiter (SerializationMethod.hs:445-453)."""
    return Serial(ext, "csv", {"header": str(header).lower(), "sep": sep, **opts})


def text_serial(ext: str = "txt", **opts) -> Serial:
    return Serial(ext, "text", opts)


def binary_serial(ext: str = "bin") -> Serial:
    """ByteStringSerial (:516-538): read-only in Spark (binaryFile has no writer)."""
    return Serial(ext, "binaryFile", {}, writable=False)


def with_compression(serial: Serial, codec: str = "gzip") -> Serial:
    """addZlibSerials analog (:708-723): same serial, compressed payload,
    extension suffixed (<ext><codec-short>)."""
    short = {"gzip": "gz", "snappy": "sz", "zstd": "zst"}.get(codec, codec)
    return replace(
        serial, ext=f"{serial.ext}{short}", options={**serial.options, "compression": codec}
    )


class SerialSet:
    """Semigroup of serials for one dataset; first is the default ext."""

    def __init__(self, *serials: Serial):
        self._by_ext: dict[str, Serial] = {}
        for s in serials:
            self.add(s)

    def add(self, serial: Serial) -> "SerialSet":
        if serial.ext not in self._by_ext:
            self._by_ext[serial.ext] = serial
        else:  # right-biased per-ext override, like the reference's <>
            self._by_ext[serial.ext] = serial
        return self

    def __or__(self, other: "SerialSet") -> "SerialSet":
        merged = SerialSet()
        for s in [*self._by_ext.values(), *other._by_ext.values()]:
            merged.add(s)
        return merged

    @property
    def default_ext(self) -> str:
        return next(iter(self._by_ext))

    def exts(self) -> list[str]:
        return list(self._by_ext)

    def for_ext(self, ext: str | None) -> Serial:
        if ext is None:
            ext = self.default_ext
        if ext not in self._by_ext:
            raise KeyError(
                f"no (de)serializer for extension {ext!r}; have {self.exts()} "
                "(reference behavior: resolveDataAccess fails ahead-of-time, "
                "PorcupineTree.hs:667-694)"
            )
        return self._by_ext[ext]

    def set_default(self, ext: str) -> "SerialSet":
        """setDefaultSerial analog."""
        if ext not in self._by_ext:
            raise KeyError(ext)
        reordered = SerialSet()
        reordered.add(self._by_ext[ext])
        for e, s in self._by_ext.items():
            if e != ext:
                reordered.add(s)
        return reordered


@dataclass(frozen=True)
class YamlSerial(Serial):
    """YAMLSerial (SerializationMethod.hs:309-383): YAML as a DATA
    serial, not just config. Spark has no YAML datasource, so this
    rides the text source both ways, staying distributed:

    - write: each row becomes one ``---``-prefixed YAML document
      (Arrow-batched mapInPandas, pyyaml on the executors); partition
      files concatenate into a standard multi-document YAML stream;
    - read: ``wholetext`` per-file scan, executors parse the stream
      with ``safe_load_all`` and re-emit records as JSON strings; with
      an explicit schema the result is a single pass of ``from_json``
      (the 100 TB path); without one, Spark's distributed JSON schema
      inference runs (one extra pass — fine for the small interchange
      files YAML is for).
    """

    def read(self, spark: SparkSession, path: str, schema=None) -> DataFrame:
        import pandas as pd

        # NB: the option must ride the text() kwarg — DataFrameReader
        # .option("wholeText")...text() drops it in pyspark classic
        raw = spark.read.text(path, wholetext=True)

        def to_json_lines(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {"value": [j for doc in pdf["value"] for j in yaml_stream_to_json_lines(doc)]}
                )

        jlines = raw.mapInPandas(to_json_lines, schema="value string")
        if schema is not None:
            from pyspark.sql import functions as F

            df = jlines.select(F.from_json("value", schema).alias("r")).select("r.*")
        else:
            df = spark.read.json(jlines.rdd.map(lambda r: r.value))
        return self.post_read(df) if self.post_read else df

    def write(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        import pandas as pd

        if self.pre_write:
            df = self.pre_write(df)

        def to_yaml_docs(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {"value": [record_to_yaml_doc(rec) for rec in pdf.to_dict("records")]}
                )

        df.mapInPandas(to_yaml_docs, schema="value string").write.mode(mode).text(path)


def record_to_yaml_doc(rec: dict) -> str:
    """One row as a ``---``-prefixed YAML document (the write kernel).

    Deliberately NOT ``allow_unicode``: YAML 1.1 treats NEL (U+0085)
    and the U+2028/29 separators as line breaks, so emitting them raw
    is lossy (they fold to a space on read — found by the hypothesis
    round-trip test); the escaped form round-trips every code point."""
    import yaml

    return "---\n" + yaml.safe_dump(rec, sort_keys=False).rstrip("\n")


def yaml_stream_to_json_lines(doc: str) -> list[str]:
    """A (multi-)document YAML stream as JSON strings, one per record
    (the read kernel); a top-level list doc yields one per element."""
    import json as _json

    import yaml

    out: list[str] = []
    for rec in yaml.safe_load_all(doc):
        if rec is None:
            continue
        if isinstance(rec, list):
            out.extend(_json.dumps(r) for r in rec)
        else:
            out.append(_json.dumps(rec))
    return out


def yaml_serial(ext: str = "yaml") -> Serial:
    return YamlSerial(ext, "text", {})


def orc_serial(**opts) -> Serial:
    """ORC: the second columnar format (engine-level only — the DuckDB
    oracle corpus cannot read ORC, so parity is covered by tests)."""
    return Serial("orc", "orc", opts)


_warn_log = __import__("logging").getLogger("porcupine_spark.serials")


def add_deserial_warnings(target, warn: Callable[[DataFrame], list[str]]):
    """addDeserialWarnings (SerializationMethod.hs:726-733): attach a
    post-read validation hook to every reader; each string the hook
    returns is logged at WARNING and the data passes through unchanged.

    At scale the hook should compute its warnings with ONE small
    aggregate over the DataFrame (e.g. ``df.filter(bad).count()``),
    not per-row driver work — it runs once per read, as a separate
    validation job.
    """

    def hook(df: DataFrame) -> DataFrame:
        for w in warn(df):
            _warn_log.warning(w)
        return df

    if isinstance(target, SerialSet):
        out = SerialSet()
        for s in target._by_ext.values():
            out.add(s.rmap(hook) if s.readable else s)
        return out
    return target.rmap(hook)
