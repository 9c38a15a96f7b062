"""Streaming → table sinks: the production pattern for landing streams.

``foreachBatch`` hands each micro-batch to a normal batch writer, which is
where exactly-once lands in practice: the checkpoint gives at-least-once
batch REPLAY, so the batch write must be idempotent per ``batch_id``.

- ``complete`` (aggregate tables): each batch holds the full updated
  result — overwrite the table; a replayed batch rewrites identical bytes.
- ``append`` (event streams): each batch writes its own
  ``batch_id=<id>`` partition with overwrite — a replayed batch replaces
  its exact previous output instead of duplicating it. Readers see the
  union via normal partition discovery (and can prune on batch_id).

Same discipline as the batch side's per-interval dynamic overwrite
(sources/json_ingest.py::append_raw): retries need idempotent sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_to_table(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    query_name: str,
    output_mode: str = "append",
    timeout_s: float = 120.0,
) -> None:
    """Drain ``stream_df`` into a parquet table at ``path`` with
    availableNow, via an idempotent per-batch ``foreachBatch`` writer.
    Raises on timeout rather than silently returning a partial table."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if output_mode == "complete":
            batch_df.write.mode("overwrite").parquet(path)
        else:
            # one subdir per micro-batch: replay overwrites, never duplicates
            batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"stream {query_name!r} did not drain within {timeout_s}s")
