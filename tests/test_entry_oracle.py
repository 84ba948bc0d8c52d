"""Replicates the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values."""

import math
import sys
from decimal import Decimal
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows_to_multiset(col_names, rows):
    idx = sorted(range(len(col_names)), key=lambda i: col_names[i])
    return sorted(
        tuple(_norm(r[i]) for i in idx) for r in rows
    ), sorted(col_names)


QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = qfn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    cur = ddb.execute(sql)
    dpdf = cur.df()
    drows = [tuple(r) for r in dpdf.itertuples(index=False)]
    dcols = list(dpdf.columns)
    # Driver hash check is type-sensitive (it compares serialized values, so
    # DuckDB HUGEINT->float64 vs Spark BIGINT->int64 mismatches). Gate on
    # pandas dtype *kind* equality per column.
    spdf = sdf.toPandas()
    skinds = {c: spdf[c].dtype.kind for c in spdf.columns}
    dkinds = {c: dpdf[c].dtype.kind for c in dpdf.columns}
    kind_diffs = {c: (skinds.get(c), dkinds.get(c))
                  for c in set(skinds) | set(dkinds)
                  if skinds.get(c) != dkinds.get(c)}
    assert not kind_diffs, f"{name}: dtype-kind mismatch {kind_diffs}"
    sset, scolnames = _rows_to_multiset(scols, srows)
    dset, dcolnames = _rows_to_multiset(dcols, drows)
    assert scolnames == dcolnames, f"{name}: column mismatch {scolnames} vs {dcolnames}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert sset == dset, f"{name}: value mismatch\nspark={sset[:5]}\nduck={dset[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"expectation_type", "success"} <= set(df.columns)
