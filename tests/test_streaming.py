"""Streaming validation: per-micro-batch fused suite via foreachBatch."""

import time

from sparkcheck.streaming import StreamValidator
from sparkcheck.types import ExpectationSuite


def test_stream_validation_rate_source(spark, tmp_path):
    # rate source -> synthetic clip-ish columns with deterministic violations
    stream = (spark.readStream.format("rate")
              .option("rowsPerSecond", "500").load()
              .selectExpr(
                  "CASE WHEN value % 50 = 7 THEN NULL "
                  "ELSE concat('clip-', lpad(CAST(value AS STRING), 10, '0')) END AS clip_id",
                  "CASE WHEN value % 40 = 3 THEN 1234 ELSE 16000 END AS sr_hz"))
    suite = (ExpectationSuite("stream")
             .add("expect_column_values_to_not_be_null", column="clip_id", mostly=0.9)
             .add("expect_column_values_to_be_between",
                  column="sr_hz", min_value=8000, max_value=48000, mostly=0.9))
    sv = StreamValidator(suite, store_path=str(tmp_path / "verdicts"))
    q = sv.start(stream, checkpoint_dir=str(tmp_path / "ckpt"),
                 trigger_seconds=1, query_name="sparkcheck-test")
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            time.sleep(2)
            try:
                v = sv.verdicts(spark)
                rows = v.collect()
            except Exception:
                continue
            if len(rows) >= 4 and sum(r["element_count"] for r in rows) > 200:
                break
    finally:
        q.stop()
    v = sv.verdicts(spark).collect()
    assert len(v) >= 4  # >=2 batches x 2 expectations
    batches = {r["batch_id"] for r in v}
    assert len(batches) >= 2
    # every (batch, expectation) appears exactly once (idempotent commits)
    seen = [(r["batch_id"], r["expectation_type"]) for r in v]
    assert len(seen) == len(set(seen))
    # violation counts roll up and the summary matches the stored rows
    summ = {(r["expectation_type"]): r for r in sv.summary(spark).collect()}
    nn = summ["expect_column_values_to_not_be_null"]
    assert nn["element_count"] > 0
    total_null = sum(r["unexpected_count"] for r in v
                     if r["expectation_type"] == "expect_column_values_to_not_be_null")
    assert nn["unexpected_count"] == total_null
