"""Streaming validation: run the fused suite per micro-batch.

The reference has no streaming surface at all (SURVEY.md §2.9 — nothing in
its execution engines references Structured Streaming); this module is our
forward-port of the fused-aggregation design to streams, as anticipated in
SURVEY.md §2.9: each micro-batch is validated with the SAME single-pass
engine via ``foreachBatch``, and verdict rows are committed idempotently per
``batch_id`` — Structured Streaming replays a failed batch with the same id,
so the per-batch parquet file name makes recovery exactly-once for the
verdict store (the same idempotence trick as checkpoint.py's group files).

This keeps one code path for batch + streaming semantics: `mostly`,
result formats, and EVR fields are identical to the batch engine.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame

from .runner import ValidationRun
from .types import ExpectationSuite

STREAM_VERDICT_FIELDS = [
    "batch_id", "suite_name", "expectation_type", "domain", "success",
    "element_count", "unexpected_count", "processed_at",
]


class StreamValidator:
    """Attach a validation suite to a streaming DataFrame.

    Usage::

        sv = StreamValidator(suite, store_path="/path/verdicts")
        query = sv.start(stream_df, checkpoint_dir="/path/ckpt")
        ...
        sv.verdicts(spark)   # one row per (batch, expectation)
    """

    def __init__(self, suite: ExpectationSuite, *, store_path: str,
                 tables: dict[str, DataFrame] | None = None,
                 result_format: str = "BASIC",
                 unique_strategy: str = "exact") -> None:
        self.suite = suite
        self.store_path = store_path
        self.tables = tables or {}
        self.result_format = result_format
        self.unique_strategy = unique_strategy
        os.makedirs(store_path, exist_ok=True)

    # -- foreachBatch sink -------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        run = ValidationRun(
            batch_df, tables=self.tables, result_format=self.result_format,
            unique_strategy=self.unique_strategy)
        result = run.run(self.suite)
        rows = {f: [] for f in STREAM_VERDICT_FIELDS}
        now = time.time()
        for evr in result.results:
            kw = evr.expectation_config.kwargs
            rows["batch_id"].append(int(batch_id))
            rows["suite_name"].append(self.suite.expectation_suite_name)
            rows["expectation_type"].append(evr.expectation_config.expectation_type)
            rows["domain"].append(
                kw.get("column") or ",".join(kw.get("column_list", [])) or "")
            rows["success"].append(bool(evr.success))
            rows["element_count"].append(int(evr.result.get("element_count") or 0))
            rows["unexpected_count"].append(int(evr.result.get("unexpected_count") or 0))
            rows["processed_at"].append(now)
        # idempotent per-batch file: a replayed batch overwrites its own file
        pq.write_table(pa.table(rows),
                       os.path.join(self.store_path, f"batch-{int(batch_id):012d}.parquet"))

    def start(self, stream_df: DataFrame, *, checkpoint_dir: str,
              trigger_seconds: float | None = None, query_name: str | None = None):
        writer = (stream_df.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("append"))
        if trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        if query_name:
            writer = writer.queryName(query_name)
        return writer.start()

    # -- results -----------------------------------------------------------

    def verdicts(self, spark) -> DataFrame:
        return spark.read.parquet(self.store_path)

    def summary(self, spark) -> DataFrame:
        from pyspark.sql import functions as F
        v = self.verdicts(spark)
        return (v.groupBy("expectation_type", "domain")
                .agg(F.count(F.lit(1)).alias("n_batches"),
                     F.sum(F.when(~F.col("success"), 1).otherwise(0)).alias("failed_batches"),
                     F.sum("element_count").alias("element_count"),
                     F.sum("unexpected_count").alias("unexpected_count")))


def validate_stream(stream_df: DataFrame, suite: ExpectationSuite, *,
                    store_path: str, checkpoint_dir: str,
                    tables: dict[str, DataFrame] | None = None,
                    result_format: str = "BASIC"):
    """Convenience wrapper: start a streaming validation query."""
    sv = StreamValidator(suite, store_path=store_path, tables=tables,
                         result_format=result_format)
    return sv, sv.start(stream_df, checkpoint_dir=checkpoint_dir)
