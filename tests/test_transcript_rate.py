"""Audio x transcript consistency: words-per-second plausibility.

A pure-Catalyst pair map condition (no binary read, fused into the metadata
pass) with closed-form violation counts from the deterministic fixture."""

import pytest
from pyspark.sql import functions as F

from sparkcheck import ExpectationSuite, validate
from sparkcheck.fixture_math import expected_transcript_rate_summary
from sparkcheck.io import generate_audio_clips


def test_counts_match_closed_form(spark):
    n = 20_000
    dirty = generate_audio_clips(spark, n, with_bytes=False, num_partitions=8)
    r = validate(dirty, ExpectationSuite("wps").add(
        "expect_transcript_words_per_second_to_be_between",
        min_wps=1.0, max_wps=40.0)).results[0]
    exp = expected_transcript_rate_summary(n, min_wps=1.0, max_wps=40.0)
    assert r.result["element_count"] == exp["element_count"]
    assert r.result["missing_count"] == exp["missing_count"]
    assert r.result["unexpected_count"] == exp["unexpected_count"]
    assert r.success == exp["success"]


def test_mostly_and_vacuous_bounds(spark):
    dirty = generate_audio_clips(spark, 5000, with_bytes=False,
                                 num_partitions=4)
    # bounds covering the fixture's full natural wps range: zero unexpected
    wide = validate(dirty, ExpectationSuite("w").add(
        "expect_transcript_words_per_second_to_be_between",
        min_wps=0.05, max_wps=200.0)).results[0]
    assert wide.success and wide.result["unexpected_count"] == 0
    # mostly absorbs the tail that strict bounds reject
    tight = validate(dirty, ExpectationSuite("t").add(
        "expect_transcript_words_per_second_to_be_between",
        min_wps=1.0, max_wps=40.0, mostly=0.5)).results[0]
    assert tight.success and tight.result["unexpected_count"] > 0


def test_nonpositive_duration_is_a_violation_not_missing(spark):
    df = spark.createDataFrame(
        [("three words here", 1000), ("zero duration clip", 0),
         ("negative", -5), (None, 1000), ("ok words", None)],
        "transcript string, dur_ms int")
    r = validate(df, ExpectationSuite("z").add(
        "expect_transcript_words_per_second_to_be_between",
        min_wps=0.5, max_wps=10.0)).results[0]
    # null transcript / null duration -> missing; 0 and -5 dur -> unexpected
    assert r.result["element_count"] == 5
    assert r.result["missing_count"] == 2
    assert r.result["unexpected_count"] == 2
    assert r.success is False


def test_empty_transcript_counts_zero_words(spark):
    df = spark.createDataFrame([("", 1000), ("   ", 1000), ("one", 1000)],
                               "transcript string, dur_ms int")
    r = validate(df, ExpectationSuite("e").add(
        "expect_transcript_words_per_second_to_be_between",
        min_wps=0.5, max_wps=10.0)).results[0]
    # "" and "   " -> 0 words -> wps 0 -> below min_wps -> unexpected
    assert r.result["unexpected_count"] == 2


def test_fused_and_mergeable(spark, tmp_path):
    """The check must stay inside the fused metadata pass (no extra job
    reading bytes) and merge across snapshots in incremental mode."""
    from sparkcheck.incremental import IncrementalCheckpoint
    from sparkcheck.io import write_table
    suite = ExpectationSuite("wps").add(
        "expect_transcript_words_per_second_to_be_between",
        min_wps=1.0, max_wps=40.0)
    inc = IncrementalCheckpoint(suite, str(tmp_path / "store"))
    assert inc.unsupported() == []
    path = str(tmp_path / "t")
    write_table(generate_audio_clips(spark, 3000, with_bytes=False,
                                     num_partitions=4), path,
                snapshot_id="s1")
    write_table(generate_audio_clips(spark, 2000, with_bytes=False,
                                     num_partitions=4)
                .withColumn("dur_ms", F.col("dur_ms")), path,
                snapshot_id="s2", mode="append")
    inc.validate_table(spark, path)
    m = inc.merged_result().results[0]
    # the two snapshots replay indexes 0..2999 and 0..1999 of the generator
    e1 = expected_transcript_rate_summary(3000)
    e2 = expected_transcript_rate_summary(2000)
    assert m.result["element_count"] == 5000
    assert m.result["unexpected_count"] == (
        e1["unexpected_count"] + e2["unexpected_count"])
