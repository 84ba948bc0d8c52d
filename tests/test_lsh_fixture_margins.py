"""ADVICE r3 #3: the sim_lsh_hyperplane oracle's parity relies on Spark's
left-fold float64 accumulation and DuckDB's list_dot_product rounding to the
same 6-digit value. These tests prove the FIXTURE keeps every value far from
any engine-dependent boundary, so the bit pattern / ranking is provably
engine-independent:

- sign bits: min |dot(embedding, plane)| must exceed the worst-case
  cross-engine summation divergence (64-dim float64 fold: ~1e-13) by a wide
  margin, or a dot near 0 could flip a signature bit between engines.
- re-rank: every cosine's distance to its nearest 6-digit rounding boundary
  (the x.5e-6 midpoints, where round() output changes) must exceed the same
  divergence, or round(cos, 6) could differ and flip a rank.

No Spark needed — numpy + the identical plane literals via fixture_math.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

duckdb = pytest.importorskip("duckdb")

from sparkcheck.fixture_math import make_hyperplanes  # noqa: E402

# worst-case cross-engine float64 divergence for a 64-term dot product is
# ~64 * eps * |partials| ~ 1e-14; require 1000x headroom
_MIN_MARGIN = 1e-11

_SF_DIRS = [d for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
            if os.path.exists(os.path.join(d, "embeddings.parquet"))]


def _load(sf_dir: str) -> np.ndarray:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_signature_dot_margin_exceeds_engine_divergence(sf_dir):
    emb = _load(sf_dir)
    planes = np.array(make_hyperplanes(64, 16, seed=42), dtype=np.float64)
    dots = emb @ planes.T
    min_abs = float(np.abs(dots).min())
    # measured: 3.3e-4 (sf0.01), 5.4e-5 (sf0.1) — a sign flip would need a
    # cross-engine divergence 9+ orders of magnitude above reality
    assert min_abs > _MIN_MARGIN, (
        f"fixture dot margin {min_abs:.2e} too close to 0: a signature bit "
        "could differ between Spark and DuckDB; regenerate planes/seed")


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_cosine_rounding_boundary_margin(sf_dir):
    emb = _load(sf_dir)
    q = emb[0]  # the fixture query is vec_id = 0
    cos = (emb @ q) / (np.sqrt((emb * emb).sum(1)) * np.sqrt(q @ q))
    # distance (in units of 1e-6) from each cosine to the nearest midpoint
    # between adjacent 6-digit rounded values — where round(x, 6) changes
    frac = np.abs((cos * 1e6) % 1.0 - 0.5)
    min_margin = float(frac.min()) * 1e-6
    assert min_margin > _MIN_MARGIN, (
        f"a cosine sits {min_margin:.2e} from a 6-digit rounding boundary: "
        "round(cos, 6) could differ between engines and flip a rank")
