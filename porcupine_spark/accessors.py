"""Pluggable LocationAccessor registry.

The reference lets third parties add storage backends by declaring a
``LocationAccessor`` instance under a symbol label and exposing it to
the reader soup (porcupine-core/src/Data/Locations/Accessors.hs:82-131
— ``readBSS``/``writeBSS`` per label, discovered via
``MayProvideLocationAccessors``); the HTTP accessor itself plugs in
exactly that way (porcupine-http/src/Data/Locations/Accessors/
HTTP.hs:58-92). The Spark-native translation: an accessor is a
(scheme, read, write) triple registered under its URL scheme. Catalog
reads/writes route any ``scheme://`` location through the registry
first; locations whose scheme has no registered accessor fall through
to the serial layer, where Spark's Hadoop FS machinery handles every
filesystem scheme it knows (file, hdfs, s3a, ...). A custom Python
backend (a database, a REST service, an in-memory fixture store) is
one ``register_accessor`` call — no engine edits.

``http``/``https`` are no longer special-cased: sources/http.py
registers them here on first use (lazy bootstrap, no import cycle).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

# read(spark, path, serial, schema) -> DataFrame
ReadFn = Callable[[SparkSession, str, object, object], DataFrame]
# write(df, path, serial, mode) -> None
WriteFn = Callable[[DataFrame, str, object, str], None]


@dataclass(frozen=True)
class Accessor:
    """One registered storage backend (SomeLocationAccessor,
    Accessors.hs:120-123). ``formats`` restricts which serial formats
    the backend can carry (None = any): the ahead-of-time
    access/serial validation hook (resolveDataAccess's early failure,
    PorcupineTree.hs:647-697)."""

    scheme: str
    read: Optional[ReadFn] = None
    write: Optional[WriteFn] = None
    formats: Optional[frozenset] = None


_REGISTRY: dict[str, Accessor] = {}
_BOOTSTRAPPED = False


def register_accessor(
    scheme: str,
    read: ReadFn | None = None,
    write: WriteFn | None = None,
    formats=None,
) -> Accessor:
    """Register (or replace) the accessor for ``scheme`` (normalized to
    lowercase — lookups lowercase the URL head, so a mixed-case
    registration must land on the same key). Matches the reference's
    label-indexed accessor list: last registration for a label wins
    (baseContexts <> userContexts ordering)."""
    acc = Accessor(
        scheme=scheme.lower(),
        read=read,
        write=write,
        formats=frozenset(formats) if formats is not None else None,
    )
    _REGISTRY[acc.scheme] = acc
    return acc


def unregister_accessor(scheme: str) -> None:
    _REGISTRY.pop(scheme.lower(), None)


def scheme_of(path: str) -> str | None:
    """URL scheme of ``path``, or None for scheme-less (local) paths."""
    head, sep, _ = path.partition("://")
    if not sep or "/" in head or not head:
        return None
    return head.lower()


def _bootstrap() -> None:
    """Lazily register the built-in http(s) accessor the same way a
    third-party one would (HTTP.hs:58-92 plugs in through the generic
    machinery, not a special case)."""
    global _BOOTSTRAPPED
    if _BOOTSTRAPPED:
        return
    _BOOTSTRAPPED = True
    from porcupine_spark.sources.http import read_url_via_serial, write_df_to_url

    def _http_read(spark, path, serial, schema):
        return read_url_via_serial(spark, path, serial, schema)

    def _http_write(df, path, serial, mode):
        # http writes POST the body; mode has no meaning for a URL
        write_df_to_url(df, path, serial)

    # an http body is a single document: columnar formats need a
    # filesystem (the reference's resolveDataAccess mismatch error)
    http_formats = frozenset({"json", "csv", "text"})
    for scheme in ("http", "https"):
        if scheme not in _REGISTRY:
            register_accessor(
                scheme, read=_http_read, write=_http_write, formats=http_formats
            )


def accessor_for(path: str) -> Accessor | None:
    """The accessor registered for ``path``'s scheme, or None (=> the
    serial layer / Hadoop FS handles it)."""
    scheme = scheme_of(path)
    if scheme is None:
        return None
    if not _BOOTSTRAPPED and scheme in ("http", "https"):
        _bootstrap()
    return _REGISTRY.get(scheme)
