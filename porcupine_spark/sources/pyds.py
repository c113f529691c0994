"""A Python DataSource (Spark 4 `pyspark.sql.datasource`) — the
Spark-NATIVE pluggable backend, completing the accessor story.

The reference plugs storage backends in through a typeclass registry
(porcupine-core/src/Data/Locations/Accessors.hs:82-131); this repo's
`accessors.register_accessor` mirrors that at the catalog layer. But
Spark 4 has its own first-class extension point — a DataSource written
in Python participates in planning (partitions), supports FILTER
PUSHDOWN into the Python reader, and serves batch AND streaming reads
through the ordinary `spark.read.format(...)` / `readStream` surface.
This module implements one end-to-end:

``porcupine_synth`` — a deterministic synthetic-documents source
(schema-compatible with the documents table) used for scale testing
and as the demo backend for a ``synth://`` catalog scheme:

- **partition planning**: `parts` option → that many InputPartitions,
  each generating its id range independently on executors (the same
  contract a real backend uses to parallelize a remote scan);
- **filter pushdown**: `doc_id` range predicates (>, >=, <, <=, =) are
  absorbed into the per-partition generation bounds, so
  `.filter(col("doc_id") < 100)` never generates the other rows at all
  — observable in the plan as PushedFilters and in the generator's row
  counts (pinned in tests);
- **streaming**: a SimpleDataSourceStreamReader serving the same rows
  in `batch` -sized offset steps — micro-batch planning against a
  Python source;
- **determinism**: row content is a pure function of (seed, doc_id)
  via md5 — no RNG state, so retries/speculative tasks are safe
  (Spark may re-run any partition; a stateful generator would fork).

Generation itself is trivial by design — the point is the PLUMBING
(partitions, pushdown, offsets, catalog routing), which is exactly
what a real database/REST/queue backend would reuse.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SYNTH_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
_LANGS = ("en", "de", "fr", "es", "zh")
_WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window query big small column join order data group stream"
).split()


def _h(seed: int, doc_id: int, salt: str) -> int:
    raw = hashlib.md5(f"{salt}:{seed}:{doc_id}".encode()).hexdigest()
    return int(raw[:15], 16)


def synth_row(seed: int, doc_id: int) -> tuple:
    """The one deterministic row function (pure in (seed, doc_id))."""
    n_words = 20 + _h(seed, doc_id, "len") % 61  # 20..80 words
    words = [
        _WORDS[_h(seed, doc_id * 1_000_003 + i, "w") % len(_WORDS)]
        for i in range(n_words)
    ]
    text = " ".join(words)
    lang = _LANGS[_h(seed, doc_id, "lang") % len(_LANGS)]
    source = f"src{_h(seed, doc_id, 'src') % 20}"
    return (doc_id, text, lang, source, len(text))


class _RangePartition(InputPartition):
    def __init__(self, seed: int, lo: int, hi: int):
        self.seed, self.lo, self.hi = seed, lo, hi


class SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))
        self.seed = int(options.get("seed", 0))
        self.lo, self.hi = 0, self.n  # doc_id half-open range

    def pushFilters(self, filters):
        """Absorb doc_id range predicates into the generation bounds;
        return the rest for Spark to evaluate post-scan."""
        for f in filters:
            col = getattr(f, "attribute", None)
            if col != ("doc_id",):
                yield f
                continue
            if isinstance(f, GreaterThan):
                self.lo = max(self.lo, f.value + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, f.value)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, f.value)
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, f.value + 1)
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, f.value)
                self.hi = min(self.hi, f.value + 1)
            else:
                yield f  # unsupported shape: Spark re-checks it

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        span = hi - lo
        per = max(1, -(-span // self.parts)) if span else 1
        out = []
        for i in range(self.parts):
            plo = lo + i * per
            phi = min(hi, plo + per)
            if plo >= phi:
                break
            out.append(_RangePartition(self.seed, plo, phi))
        return out or [_RangePartition(self.seed, 0, 0)]

    def read(self, part: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(part.lo, part.hi):
            yield synth_row(part.seed, doc_id)


class SynthStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 0))
        self.batch = int(options.get("batch", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(self.n, lo + self.batch)
        # iter(list), not a bare generator or list: the engine both
        # next()s the returned value AND copy.copy()s it to cache the
        # prefetched batch for replay — a list_iterator supports both
        # (generators aren't copyable; lists aren't iterators)
        rows = iter([synth_row(self.seed, i) for i in range(lo, hi)])
        return rows, {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # exact replay for recovery: same pure row function
        return iter([synth_row(self.seed, i)
                     for i in range(int(start["next"]), int(end["next"]))])


class SynthDocsDataSource(DataSource):
    """`spark.read.format("porcupine_synth").option("n", 1e6)...` —
    register with `register_synth_source(spark)`."""

    @classmethod
    def name(cls) -> str:
        return "porcupine_synth"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema: StructType) -> SynthReader:
        return SynthReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SynthStreamReader:
        return SynthStreamReader(self.options)


_REGISTERED: set[str] = set()


def register_synth_source(spark) -> None:
    """Idempotent per-session registration."""
    key = spark.sparkContext.applicationId
    if key in _REGISTERED:
        return
    spark.dataSource.register(SynthDocsDataSource)
    _REGISTERED.add(key)


def register_synth_scheme() -> None:
    """Route catalog locations `synth://docs?n=N&parts=P&seed=S` through
    the data source — a third-party backend plugging into BOTH the
    catalog accessor registry (the reference's extension point) and
    Spark's own DataSource machinery (the Spark-native one)."""
    from urllib.parse import parse_qsl, urlsplit

    from porcupine_spark.accessors import register_accessor

    def _read(spark, path, serial, schema):
        register_synth_source(spark)
        q = dict(parse_qsl(urlsplit(path).query))
        r = spark.read.format("porcupine_synth")
        for k in ("n", "parts", "seed"):
            if k in q:
                r = r.option(k, q[k])
        return r.load()

    register_accessor("synth", read=_read, formats=None)
