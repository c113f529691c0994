"""porcupine_spark — a PySpark-native data-pipeline / analytics engine.

A from-scratch re-expression of the capabilities of YPares/porcupine
(a Haskell dataflow framework: composable tasks + virtual resource tree
+ pluggable serialization + folds + data-parallel repetition + typed
config + content-addressed caching) on top of Apache Spark.

Architecture (Spark-first, not a port):

- the reference's ``VirtualFile`` resource tree  -> ``catalog.Dataset`` /
  ``catalog.Catalog`` (logical name -> format + schema + path template,
  resolved against a config before execution);
- ``PTask`` arrows                               -> ``task.Task`` nodes that
  compose with ``>>`` and *statically* accumulate their requirements
  (the set of datasets they may touch), then emit DataFrame plans;
- ``SerialsFor`` serialization bundles           -> ``serials`` format
  registry driving ``spark.read`` / ``df.write``;
- ``FoldA`` arrow-folds                          -> ``folds.Fold`` compiling
  Applicative-composed folds into ONE ``df.agg(...)`` pass;
- task repetition (``parMapTask``)               -> ``repetition`` index
  columns / partitioned layouts (data parallelism is Spark's);
- docrecords typed config + CLI                  -> ``config`` dataclass-like
  option records with YAML + argparse and CLI>YAML>default priority;
- funflow content-addressed caching              -> ``cache`` content-hash
  keyed Parquet checkpoint store;
- LocationAccessors (local/S3/HTTP)              -> Hadoop FS schemes +
  ``sources.http`` driver-side parallel fetch.

Everything on the hot path stays in Spark builtins (Catalyst/Tungsten);
Pandas UDFs are reserved for genuinely non-relational kernels.
"""

from porcupine_spark.session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "Catalog",
    "Dataset",
    "Fold",
    "Task",
    "arr",
    "load",
    "write",
    "run_pipeline",
    "make_cli",
    "__version__",
]


def __getattr__(name):
    # lazy re-exports: importing porcupine_spark must not drag the whole
    # engine (or a SparkSession) in for callers that want one piece
    if name in ("Catalog", "Dataset"):
        from porcupine_spark import catalog as _m

        return getattr(_m, name)
    if name == "Fold":
        from porcupine_spark.folds import Fold

        return Fold
    if name in ("Task", "arr", "load", "write"):
        from porcupine_spark import task as _m

        return getattr(_m, name)
    if name in ("run_pipeline", "make_cli"):
        from porcupine_spark import run as _m

        return getattr(_m, name)
    raise AttributeError(name)
