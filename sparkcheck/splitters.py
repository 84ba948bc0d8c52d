"""Batch splitters & samplers (SURVEY.md §2.1).

The reference materializes batches by filtering a DataFrame with a splitter
and/or sampler (sparkdf_execution_engine.py:696-867). Ours are the same
semantics as pure ``Column`` predicate builders composed with ``df.filter``
— every one is a native Catalyst expression that pushes down to the scan
(the reference's hashed splitter/sampler use per-row Python hashlib UDFs,
:766-796 and :809-867; we use built-in sha2/xxhash64 instead, which also
makes them partition-prunable and deterministic across engines).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ----------------------------------------------------------------- splitters


def split_on_whole_table(df: DataFrame) -> DataFrame:
    # sparkdf_execution_engine.py:696-700 — identity
    return df


def split_on_column_value(column: str, value) -> Column:
    # :702-704
    return F.col(column) == F.lit(value)


def split_on_converted_datetime(column: str, date_format: str, value: str) -> Column:
    # :706-721 — format the (timestamp) column and filter on the string form
    return F.date_format(F.col(column), date_format) == F.lit(value)


def split_on_divided_integer(column: str, divisor: int, value: int) -> Column:
    # :723-737
    return F.floor(F.col(column) / F.lit(int(divisor))).cast("long") == int(value)


def split_on_mod_integer(column: str, mod: int, value: int) -> Column:
    # :739-750
    return F.pmod(F.col(column).cast("long"), F.lit(int(mod))) == int(value)


def split_on_multi_column_values(values: dict) -> Column:
    # :752-764 — conjunctive equality
    conds = [F.col(c) == F.lit(v) for c, v in values.items()]
    return reduce(lambda a, b: a & b, conds) if conds else F.lit(True)


def split_on_hashed_column(column: str, hash_digits: int, value: str) -> Column:
    """:766-796 uses a python hashlib UDF; ours: built-in sha2-256, matching
    the last `hash_digits` hex chars of the digest."""
    digest = F.sha2(F.col(column).cast("string"), 256)
    return F.substring(digest, -int(hash_digits), int(hash_digits)) == F.lit(value)


# ------------------------------------------------------------------ samplers


def sample_using_random(df: DataFrame, p: float, seed: int = 1) -> DataFrame:
    # :799-807 — F.rand(seed) < p; df.sample is the built-in equivalent
    return df.filter(F.rand(seed) < float(p))


def sample_using_mod(column: str, mod: int, value: int) -> Column:
    # :809-823
    return F.pmod(F.col(column).cast("long"), F.lit(int(mod))) == int(value)


def sample_using_a_list(column: str, value_list) -> Column:
    # :825-839
    return F.col(column).isin(list(value_list))


def sample_using_hash(column: str, hash_digits: int = 1,
                      hash_value: str = "f") -> Column:
    # :841-867 (hashlib UDF) -> built-in sha2
    digest = F.sha2(F.col(column).cast("string"), 256)
    return F.substring(digest, -int(hash_digits), int(hash_digits)) == F.lit(hash_value)
