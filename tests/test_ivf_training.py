"""Distributed-Lloyd IVF training: E-step assignment is a pure Catalyst
expression against broadcast centroid literals, M-step is the existing
posexplode groupBy. Exactness vs a driver-side numpy Lloyd with identical
init and tie-breaks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkcheck.pipeline.similarity import (assign_ivf_cells, cosine_topk,
                                            ivf_topk, train_ivf_centroids)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _numpy_lloyd(vecs, ids, k, max_iter=10, tol=1e-6, round_digits=6):
    order = np.argsort(ids)
    cents = vecs[order[:k]].astype(np.float64).copy()
    for _ in range(max_iter):
        d = ((vecs[:, None, :].astype(np.float64) - cents[None, :, :]) ** 2
             ).sum(axis=2).round(round_digits)
        lab = d.argmin(axis=1)  # first min == lowest cell index, like Spark
        new = np.stack([
            vecs[lab == i].astype(np.float64).mean(axis=0)
            if (lab == i).any() else cents[i] for i in range(k)])
        shift = np.sqrt(((new - cents) ** 2).sum(axis=1)).max()
        cents = new
        if shift < tol:
            break
    return cents, lab


def test_training_matches_numpy_lloyd(spark, emb):
    k = 6
    cents = train_ivf_centroids(emb, k=k, max_iter=8)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float32)
    exp, _ = _numpy_lloyd(vecs, ids, k, max_iter=8)
    got = np.array(cents)
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-9)


def test_assignment_is_deterministic_across_parallelism(spark, emb):
    cents = train_ivf_centroids(emb, k=4, max_iter=4)
    a1 = {r["vec_id"]: r["label"] for r in
          assign_ivf_cells(emb.repartition(1), cents).collect()}
    a8 = {r["vec_id"]: r["label"] for r in
          assign_ivf_cells(emb.repartition(8), cents).collect()}
    assert a1 == a8
    assert set(a1.values()) <= set(range(4))


def test_assignment_plan_is_map_side_only(spark, emb):
    cents = train_ivf_centroids(emb, k=3, max_iter=2)
    plan = assign_ivf_cells(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # zero shuffles: pure projection


def test_trained_cells_power_ivf_search(spark, emb):
    """End-to-end: train -> assign -> ivf_topk probes the query's cell and
    agrees with brute force on the query's own nearest neighbor."""
    cents = train_ivf_centroids(emb, k=4, max_iter=6)
    assigned = assign_ivf_cells(emb, cents, out_col="cell")
    query = assigned.filter(F.col("vec_id") == 7).select("embedding", "cell")
    top = ivf_topk(assigned, query, cell_col="cell", k=1).collect()
    assert top[0]["vec_id"] == 7 and top[0]["sim"] == pytest.approx(1.0)
    brute = cosine_topk(emb, query.select("embedding"), k=1).collect()
    assert brute[0]["vec_id"] == 7


def test_empty_and_degenerate_inputs(spark, emb):
    with pytest.raises(ValueError, match="at least k"):
        train_ivf_centroids(emb.limit(2), k=5)
    with pytest.raises(ValueError, match="non-empty"):
        assign_ivf_cells(emb, [])
    with pytest.raises(ValueError, match="exactly k"):
        train_ivf_centroids(emb, k=3, init=[[0.0] * 64])
