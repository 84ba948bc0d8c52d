#!/usr/bin/env python
"""spark-submit smoke job (north rule: runs via `spark-submit --py-files`).

Usage:
    python scripts/make_pyfiles.py
    spark-submit --master local[8] --py-files dist/sparkcheck.zip \
        scripts/submit_smoke.py

Validates a generated batch using ONLY the shipped zip — the job asserts the
repo directory itself is not on sys.path, so success proves the packaged
engine is self-contained (pure python, no native deps)."""

import sys

assert not any(p.rstrip("/").endswith("repo") for p in sys.path if p), sys.path

from pyspark.sql import SparkSession  # noqa: E402

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from sparkcheck import ExpectationSuite, validate  # noqa: E402
from sparkcheck.io import generate_audio_clips  # noqa: E402

clips = generate_audio_clips(spark, 20_000, with_bytes=False, num_partitions=8)
suite = (ExpectationSuite("submit")
         .add("expect_column_values_to_not_be_null", column="clip_id", mostly=0.99)
         .add("expect_column_values_to_be_between", column="sr_hz",
              min_value=8000, max_value=48000, mostly=0.99))
res = validate(clips, suite, per_partition=True)
print("SUBMIT_OK", res.success, res.statistics["evaluated_expectations"],
      len(res.meta["partition_verdicts"]))
