"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast of the query
vector + one map-side pass + a top-k (no shuffle beyond the final limit).
The scale path is IVF: a coarse quantizer assigns each vector to a cell
(here the `label` column stands in for a trained centroid assignment, i.e.
the cells are precomputed — exactly how a production IVF index stores them);
search probes only the query's cell, cutting the scan by ~#cells.

Everything is native Catalyst (`aggregate`/`zip_with` fold for the dot
product — JVM-side, codegen'd); no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# re-export: lives in fixture_math so the LSH oracle SQL builds without pyspark
from ..fixture_math import make_hyperplanes  # noqa: F401

_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), "
        "0D, (acc, v) -> acc + v)")


def _with_cosine(df: DataFrame, vec_col: str, qvec_col: str) -> DataFrame:
    dot = F.expr(_DOT.format(a=vec_col, b=qvec_col))
    n1 = F.expr(_DOT.format(a=vec_col, b=vec_col))
    n2 = F.expr(_DOT.format(a=qvec_col, b=qvec_col))
    return df.withColumn("cosine", dot / F.sqrt(n1 * n2))


def cosine_topk(df: DataFrame, query: DataFrame, *, id_col: str = "vec_id",
                vec_col: str = "embedding", k: int = 10,
                round_digits: int = 6) -> DataFrame:
    """Exact brute-force top-k by cosine to the (single-row) query DataFrame.
    Ranking is on the ROUNDED score with the id as tie-break, so results are
    deterministic across partitionings and engines."""
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec")))
    scored = _with_cosine(df.crossJoin(q), vec_col, "__qvec")
    scored = scored.withColumn("sim", F.round(F.col("cosine"), round_digits))
    return (scored
            .select(id_col, "sim")
            .orderBy(F.desc("sim"), F.col(id_col))
            .limit(k))


def ivf_topk(df: DataFrame, query: DataFrame, *, id_col: str = "vec_id",
             vec_col: str = "embedding", cell_col: str = "label",
             k: int = 5, round_digits: int = 6) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse cell.
    `cell_col` is the precomputed quantizer assignment; at 100 TB the table is
    partitioned by it, so the probe is a partition-pruned scan."""
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec"),
                                 F.col(cell_col).alias("__qcell")))
    probe = df.join(q, on=df[cell_col] == F.col("__qcell"), how="inner")
    scored = _with_cosine(probe, vec_col, "__qvec")
    scored = scored.withColumn("sim", F.round(F.col("cosine"), round_digits))
    return (scored.select(id_col, "sim")
            .orderBy(F.desc("sim"), F.col(id_col))
            .limit(k))


def pairwise_topk_per_cell(df: DataFrame, *, id_col: str = "vec_id",
                           vec_col: str = "embedding", cell_col: str = "label",
                           k: int = 3, round_digits: int = 6,
                           max_cell_size: int | None = 10_000) -> DataFrame:
    """All-pairs nearest neighbors WITHIN each IVF cell (self-join pruned by
    the cell equi-join — the O(n^2) blow-up is bounded per cell).

    ``max_cell_size`` guards the per-cell quadratic cost: one degenerate
    coarse cell (a catch-all label, all-zero embeddings) would otherwise
    dominate the whole job. Cells above the cap are dropped — at scale,
    re-cluster them with a finer quantizer rather than brute-forcing
    (mirrors `embedding_near_dup_pairs`' cap). Pass None to disable."""
    from pyspark.sql import Window
    a = df.select(F.col(id_col).alias("id_a"), F.col(cell_col).alias("cell"),
                  F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(cell_col).alias("cell"),
                  F.col(vec_col).alias("vb"))
    if max_cell_size is not None:
        keep = (df.groupBy(F.col(cell_col).alias("cell"))
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") <= max_cell_size).select("cell"))
        a = a.join(keep, "cell", "left_semi")
        b = b.join(keep, "cell", "left_semi")
    pairs = a.join(b, "cell").filter(F.col("id_a") != F.col("id_b"))
    dot = F.expr(_DOT.format(a="va", b="vb"))
    na = F.expr(_DOT.format(a="va", b="va"))
    nb = F.expr(_DOT.format(a="vb", b="vb"))
    scored = pairs.withColumn("sim", F.round(dot / F.sqrt(na * nb), round_digits))
    w = Window.partitionBy("id_a").orderBy(F.desc("sim"), F.col("id_b"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("id_a", "id_b", "sim", "rn"))


def cell_centroids(df: DataFrame, *, vec_col: str = "embedding",
                   cell_col: str = "label") -> DataFrame:
    """Per-cell centroid = element-wise mean of the cell's vectors, computed
    natively: explode to (cell, pos, value), average per (cell, pos), then
    reassemble ordered arrays. One shuffle on (cell, pos) — mergeable and
    skew-free (positions are uniform)."""
    exploded = df.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"))
    means = (exploded.groupBy("cell", "pos")
             .agg(F.avg(F.col("v").cast("double")).alias("m")))
    return (means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.expr("transform(pm, x -> x.m)").alias("centroid")))


def ivf_topk_multiprobe(df: DataFrame, query: DataFrame, *,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        cell_col: str = "label", k: int = 5, nprobe: int = 2,
                        centroids: DataFrame | None = None,
                        round_digits: int = 6) -> DataFrame:
    """Multi-probe IVF: rank cells by centroid cosine to the query and scan
    the top `nprobe` cells — recovering neighbors that fall just outside the
    query's own cell (the standard recall/cost dial of an IVF index).
    `centroids` may be precomputed (at 100 TB it lives with the index;
    recomputing it here is one extra aggregation). The probed-cell list is a
    tiny broadcast, so the main scan stays partition-prunable by cell."""
    cents = centroids if centroids is not None else cell_centroids(
        df, vec_col=vec_col, cell_col=cell_col)
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec")))
    ranked = _with_cosine(cents.crossJoin(q), "centroid", "__qvec")
    probed = F.broadcast(
        ranked.orderBy(F.desc(F.round(F.col("cosine"), round_digits)),
                       F.col("cell"))
        .limit(nprobe).select("cell"))
    probe = df.join(probed, on=df[cell_col] == probed["cell"], how="inner")
    scored = _with_cosine(probe.crossJoin(q), vec_col, "__qvec")
    scored = scored.withColumn("sim", F.round(F.col("cosine"), round_digits))
    return (scored.select(id_col, "sim")
            .orderBy(F.desc("sim"), F.col(id_col))
            .limit(k))




def hyperplane_signature(df: DataFrame, planes: list[list[float]], *,
                         vec_col: str = "embedding",
                         out_col: str = "sig",
                         round_digits: int = 6) -> DataFrame:
    """Append the n-bit sign signature: bit j = 1 iff dot(vec, plane_j) >= 0.
    Map-side only (no shuffle); each dot is a codegen'd Catalyst fold over the
    array. The dot is ROUNDED before the sign test so the bit is reproducible
    across engines/summation widths (ties at exactly 0 count as positive,
    matching SQL `>= 0`)."""
    bits = []
    for j, plane in enumerate(planes):
        arr = "array(" + ",".join(f"{c}D" for c in plane) + ")"
        dot = F.round(F.expr(_DOT.format(a=vec_col, b=arr)), round_digits)
        bits.append(F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return df.withColumn(out_col, sig.cast("bigint"))


def hyperplane_lsh_topk(df: DataFrame, query: DataFrame, *,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        planes: list[list[float]] | None = None,
                        n_planes: int = 16, n_bands: int = 4,
                        k: int = 10, round_digits: int = 6,
                        seed: int = 42) -> DataFrame:
    """ANN via banded sign-random-projection LSH: a vector is a candidate iff
    it agrees with the query on ALL bits of at least one band (n_bands bands
    of n_planes/n_bands bits). Exact cosine re-ranks the candidates.

    Scale shape: signatures are map-side; the query's band values are a
    broadcast of n_bands rows, so candidate generation is a broadcast
    semi-join — no shuffle of the corpus. At 100 TB the signature (or the
    exploded (band, band_val) index) is precomputed and stored sorted/bucketed
    by band value, making the probe a partition-pruned lookup; recall is dialed
    by n_bands (more bands -> more candidates) exactly like LSH band theory
    for minhash. Candidates are distinct'd before the exact re-rank, so the
    expensive cosine runs once per candidate."""
    if planes is None:
        # dim inference costs one extra driver job; pass `planes` (or use
        # make_hyperplanes yourself) on repeated searches to skip it
        head = df.select(vec_col).head()
        if head is None or head[0] is None:
            raise ValueError(
                "cannot infer the embedding dimension from an empty corpus "
                f"(or a NULL leading {vec_col!r}); pass planes= explicitly")
        planes = make_hyperplanes(len(head[0]), n_planes, seed=seed,
                                  round_digits=round_digits)
    if len(planes) % n_bands:
        raise ValueError(
            f"n_bands={n_bands} must divide the plane count {len(planes)}: "
            "truncated band width would silently ignore the high signature "
            "bits and lower recall below what the signature pays for")
    width = len(planes) // n_bands
    mask = (1 << width) - 1
    sig = hyperplane_signature(df, planes, vec_col=vec_col,
                               round_digits=round_digits)
    qsig = hyperplane_signature(query, planes, vec_col=vec_col,
                                round_digits=round_digits)
    band_vals = F.array(*[
        F.shiftright(F.col("sig"), b * width).bitwiseAND(F.lit(mask))
        for b in range(n_bands)])
    corpus = sig.select(F.col(id_col), F.col(vec_col),
                        F.posexplode(band_vals).alias("band", "bval"))
    qbands = F.broadcast(
        qsig.select(F.col(vec_col).alias("__qvec"),
                    F.posexplode(band_vals).alias("band", "bval")))
    cand = (corpus.join(qbands, ["band", "bval"])
            .select(id_col, vec_col, "__qvec")
            .dropDuplicates([id_col]))
    scored = _with_cosine(cand, vec_col, "__qvec")
    scored = scored.withColumn("sim", F.round(F.col("cosine"), round_digits))
    return (scored.select(id_col, "sim")
            .orderBy(F.desc("sim"), F.col(id_col))
            .limit(k))


# ------------------------------------------------------------ IVF training

def assign_ivf_cells(df: DataFrame, centroids: list[list[float]], *,
                     vec_col: str = "embedding", out_col: str = "label",
                     round_digits: int = 6) -> DataFrame:
    """Nearest-centroid assignment as a pure Catalyst expression: squared-L2
    distance to each broadcast centroid literal via a `transform` over the
    literal centroid array (zip_with/aggregate fold, JVM codegen, no UDF),
    label = first index of the minimum ROUNDED distance (deterministic
    across partitionings and engines; ties break to the lowest cell index).
    Map-side only — the assignment adds zero shuffles, so at 100 TB it
    pipelines into whatever write/repartition follows."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    cents = ("array(" + ", ".join(
        "array(" + ", ".join(f"{float(v)!r}D" for v in c) + ")"
        for c in centroids) + ")")
    dists = (f"transform({cents}, c -> round(aggregate("
             f"zip_with(c, {vec_col}, (x, y) -> (x - cast(y AS double)) "
             f"* (x - cast(y AS double))), 0D, (acc, v) -> acc + v), "
             f"{round_digits}))")
    label = (f"cast(array_position({dists}, array_min({dists})) AS int) - 1")
    return df.withColumn(out_col, F.expr(label))


def train_ivf_centroids(df: DataFrame, *, k: int = 8,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        max_iter: int = 10, tol: float = 1e-6,
                        init: list[list[float]] | None = None) -> list[list[float]]:
    """Train the IVF coarse quantizer with DISTRIBUTED Lloyd iterations:

    - E-step: `assign_ivf_cells` — nearest-centroid labels computed map-side
      against the broadcast centroid literals (no UDF, no shuffle).
    - M-step: `cell_centroids` — per-cell element-wise means via
      posexplode + groupBy(cell, pos), ONE (cell, pos)-key shuffle whose
      reduce input is k x dim partial sums per partition (map-side combine),
      independent of row count.

    Each iteration therefore costs one scan + one tiny shuffle, and only
    k x dim doubles ever reach the driver — the update loop is
    driver-coordinated but the data never is, which is the shape that holds
    at 10^12 rows. Init defaults to the k vectors with the smallest
    `id_col` (deterministic and replayable by any engine; pass `init` to
    seed differently, e.g. a kmeans++ sample). An empty cell keeps its
    previous centroid (standard Lloyd degeneracy handling). Returns the
    centroid list — feed it to `assign_ivf_cells` / embed it as literals in
    an oracle, exactly like the LSH plane literals."""
    if init is None:
        rows = (df.select(id_col, vec_col).orderBy(id_col).limit(k).collect())
        if len(rows) < k:
            raise ValueError(f"need at least k={k} rows to initialize")
        cents = [[float(v) for v in r[vec_col]] for r in rows]
    else:
        cents = [[float(v) for v in c] for c in init]
        if len(cents) != k:
            raise ValueError("init must supply exactly k centroids")
    for _ in range(max_iter):
        assigned = assign_ivf_cells(df, cents, vec_col=vec_col,
                                    out_col="__cell")
        means = {int(r["cell"]): [float(v) for v in r["centroid"]]
                 for r in cell_centroids(assigned, vec_col=vec_col,
                                         cell_col="__cell").collect()}
        new = [means.get(i, cents[i]) for i in range(k)]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(cn, co)) ** 0.5
            for cn, co in zip(new, cents))
        cents = new
        if shift < tol:
            break
    return cents
