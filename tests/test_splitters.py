"""Splitters/samplers (SURVEY.md §2.1): partition-complete, disjoint,
deterministic — checked against closed-form counts on a literal table."""

from pyspark.sql import functions as F

from sparkcheck import splitters as S


def _df(spark, n=1000):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).alias("g"),
        F.concat(F.lit("u"), (F.col("id") % 3)).alias("tag"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 86400).alias("ts"))


def test_mod_splitter_is_a_partition(spark):
    df = _df(spark)
    counts = [df.filter(S.split_on_mod_integer("id", 4, v)).count() for v in range(4)]
    assert sum(counts) == 1000
    assert counts == [250, 250, 250, 250]


def test_divided_integer_splitter(spark):
    df = _df(spark)
    assert df.filter(S.split_on_divided_integer("id", 100, 3)).count() == 100
    total = sum(df.filter(S.split_on_divided_integer("id", 100, v)).count()
                for v in range(10))
    assert total == 1000


def test_column_value_and_multi_column(spark):
    df = _df(spark)
    assert df.filter(S.split_on_column_value("tag", "u1")).count() == \
        df.filter("tag = 'u1'").count()
    both = df.filter(S.split_on_multi_column_values({"tag": "u0", "g": 0}))
    assert both.count() == df.filter("tag = 'u0' AND g = 0").count()


def test_converted_datetime_splitter(spark):
    df = _df(spark, 40)
    one_day = df.filter(S.split_on_converted_datetime("ts", "yyyy-MM-dd", "2023-11-15"))
    assert one_day.count() == 1


def test_hashed_splitter_partitions_and_matches_sha2(spark):
    df = _df(spark, 2000)
    counts = [df.filter(S.split_on_hashed_column("id", 1, h)).count()
              for h in "0123456789abcdef"]
    assert sum(counts) == 2000           # complete partition
    assert max(counts) < 2000 * 0.2      # roughly uniform


def test_samplers(spark):
    df = _df(spark, 2000)
    r = S.sample_using_random(df, 0.25, seed=7).count()
    assert 350 < r < 650                 # ~500 expected
    assert df.filter(S.sample_using_mod("id", 10, 3)).count() == 200
    assert df.filter(S.sample_using_a_list("g", [0, 1])).count() == \
        df.filter("g IN (0, 1)").count()
    h = df.filter(S.sample_using_hash("id", 1, "f")).count()
    assert 60 < h < 190                  # ~1/16 of 2000


def test_hashed_sampler_deterministic(spark):
    df = _df(spark, 500)
    a = sorted(r["id"] for r in df.filter(S.sample_using_hash("id")).collect())
    b = sorted(r["id"] for r in df.filter(S.sample_using_hash("id")).collect())
    assert a == b and len(a) > 0
