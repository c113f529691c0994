"""Streaming writes into catalog datasets — foreachBatch with
epoch-idempotent layout.

The file/memory sinks cover tests; real pipelines need streams landing
in the SAME catalog datasets batch pipelines read. ``stream_to_dataset``
bridges: every micro-batch is written through the bound catalog's
serial into an ``epoch=<id>`` subdirectory — re-delivered epochs
overwrite their own directory and nothing else, giving exactly-once
output for an at-least-once engine (the standard foreachBatch
idempotence pattern). Readers see one dataset (the epoch column is
partition metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from porcupine_spark.catalog import BoundCatalog


def stream_to_dataset(
    stream: DataFrame,
    bound: BoundCatalog,
    name: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Start (and for trigger_once: drain) a stream into dataset
    ``name``. Returns the StreamingQuery (stopped if trigger_once)."""
    ds = bound.catalog[name]
    locs = bound.locations(name)
    if locs is None:
        raise ValueError(f"{name!r} is unmapped; streaming sink needs a location")

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        for loc in locs:
            serial = ds.serials.for_ext(loc.ext)
            out = serial.pre_write(batch_df) if serial.pre_write else batch_df
            (
                out.write.format(serial.format)
                .mode("overwrite")  # scoped to this epoch's directory
                .options(**serial.options)
                .save(f"{loc.path}/epoch={epoch_id}")
            )

    writer = stream.writeStream.foreachBatch(write_epoch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
