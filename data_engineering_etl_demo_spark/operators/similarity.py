"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline.  Queries are broadcast
  (a handful of vectors); the corpus side streams — no shuffle of the
  corpus at all, so the plan scales linearly to any corpus size.
- sign-LSH near-dup: random-hyperplane signature buckets restrict the
  O(n²) pair space; exact cosine verifies candidates.  The "random"
  hyperplanes are seeded from md5 of (plane, dim) so every run/engine
  derives identical planes — no state to ship.

Cross-engine exactness: dot products and norms are computed per-element in
double and summed as DECIMAL(38,12) (exact, order-independent), because the
DuckDB oracle cannot be made to sum doubles in Spark's order.  The decimal
work is per-candidate only — top-k keeps it off the hot path at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SIM_SCALE = 9  # truncation scale for the similarity value


def trunc9(x: Column) -> Column:
    """Truncate a double to 9 decimal places via floor(x·1e9)/1e9.  Unlike
    ROUND(double, 9) — whose last-ulp behavior is engine-defined — every step
    here (multiply, floor, divide) is an IEEE-754 correctly-rounded double op,
    so Spark and the DuckDB oracle produce bit-identical values."""
    return F.floor(x * F.lit(1e9)).cast("double") / F.lit(1e9)


PROD_SCALE = 1e12  # per-term fixed-point scale for dot products / norms


def scaled_dot(a: Column, b: Column) -> Column:
    """Σ floor(aᵢ·bᵢ·1e12) as BIGINT — a fixed-point dot product.

    Why not decimal: decimal→double conversion is not guaranteed correctly
    rounded in every engine, so two engines can disagree by an ulp even on
    the exact same decimal sum.  Here every step — float→double widen,
    double multiply, floor — is an IEEE-754-exact operation, and the BIGINT
    sum is exact and order-independent, so Spark and the DuckDB oracle
    produce bit-identical values at any parallelism."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(PROD_SCALE))
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    """sqrt of the fixed-point self-dot rescaled back to value units."""
    return F.sqrt(scaled_dot(a, a).cast("double") / F.lit(PROD_SCALE))


def cosine(a: Column, b: Column) -> Column:
    # The 1e12 scales cancel: dot_s / (sqrt(ss_a)·sqrt(ss_b)) == cosine.
    return trunc9(
        scaled_dot(a, b).cast("double")
        / (
            F.sqrt(scaled_dot(a, a).cast("double"))
            * F.sqrt(scaled_dot(b, b).cast("double"))
        )
    )


def sign_word(vec: Column | str, start: int, n: int) -> Column:
    """Binary (1-bit) quantization: pack the sign bits of ``n`` consecutive
    dimensions starting at 0-based ``start`` into one non-negative BIGINT
    (bit j = 1 iff vec[start+j] >= 0).  n ≤ 63 keeps the word positive —
    a 64-dim embedding packs into TWO 32-bit words, dodging BIGINT's sign
    bit, and Hamming distance is bit_count(w0⊕w0') + bit_count(w1⊕w1').
    Pure codegen expressions (shift/IF/aggregate), identical in DuckDB."""
    if not 0 < n <= 63:
        raise ValueError(f"sign_word packs 1..63 bits per word, got {n}")
    name = vec if isinstance(vec, str) else None
    if name is None:
        raise TypeError("sign_word needs the column NAME (SQL-expr build)")
    return F.expr(
        f"aggregate(zip_with(slice({name}, {start + 1}, {n}), "
        f"sequence(0, {n - 1}), "
        "(v, i) -> IF(v >= cast(0 as float), shiftleft(1L, i), 0L)), "
        "0L, (a, b) -> a + b)"
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, cand_id, cosine_sim, rank): exact top-k neighbors of each
    query vector, self-matches excluded, ties broken by cand_id."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        scaled_dot(F.col(vec_col), F.col(vec_col)).alias("qss"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        scaled_dot(F.col(vec_col), F.col(vec_col)).alias("css"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            trunc9(
                scaled_dot(F.col("qvec"), F.col("cvec")).cast("double")
                / (
                    F.sqrt(F.col("qss").cast("double"))
                    * F.sqrt(F.col("css").cast("double"))
                )
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantize → probe one cell
# ---------------------------------------------------------------------------

IVF_CELLS = 16


def ivf_assign(
    corpus: DataFrame,
    n_cells: int = IVF_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_vec: bool = False,
    centroids=None,
) -> DataFrame:
    """(id, cell) — nearest-centroid assignment by cosine, ties → lowest
    cell; ``with_vec=True`` passes the vector through so downstream steps
    (probe scoring, Lloyd mean-update) skip a re-join with the corpus.

    Centroid 'training' is a deterministic stand-in — the first ``n_cells``
    vectors (vec_id < n_cells) seed the cells, so the oracle can reproduce
    the assignment exactly; a production build would run k-means (e.g.
    pyspark.ml.clustering.KMeans) and broadcast the fitted centroids the
    same way.  The n_cells-row collect IS that broadcast (a fitted-model
    constant, not data); the corpus itself streams through an Arrow-batched
    numpy kernel — no shuffle at all.  The kernel mirrors scaled_dot/trunc9
    IEEE op-for-op (widen, multiply, ·1e12, floor, exact int64 sum, divide,
    floor(·1e9)/1e9), so assignments are bit-identical to the previous
    Catalyst expression form and to the DuckDB oracle — but ~10× cheaper
    than n_cells interpreted HOF cosines per row."""
    cents = centroids or _collect_centroids(corpus, n_cells, id_col, vec_col)
    return _assign_to_centroids(corpus, cents, id_col, vec_col, with_vec)


def _collect_centroids(corpus: DataFrame, n_cells: int, id_col: str, vec_col: str):
    """(cells, cmat, sqrt_css) numpy triple for the n_cells seed vectors —
    the fitted-model constant every assignment task closes over."""
    import numpy as np

    rows = sorted(
        corpus.filter(F.col(id_col) < n_cells).select(id_col, vec_col).collect(),
        key=lambda r: r[id_col],
    )
    cells = np.array([r[id_col] for r in rows], dtype=np.int64)
    cmat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    return _finish_centroids(cells, cmat)


def centroids_from_parquet(path: str, n_cells: int = IVF_CELLS,
                           id_col: str = "vec_id", vec_col: str = "embedding"):
    """Same centroid constant, read driver-side straight from the parquet
    file (predicate-pushdown on the id) — skips the extra Spark job a
    collect() schedules.  Loading a fitted model's K vectors is driver
    work, not a distributed scan; float32→float64 widening is exact, so
    the triple is bit-identical to _collect_centroids'."""
    import numpy as np
    import pyarrow.dataset as pads

    ds = pads.dataset(path, format="parquet")
    tbl = ds.to_table(
        columns=[id_col, vec_col], filter=pads.field(id_col) < n_cells
    )
    order = np.argsort(tbl[id_col].to_numpy())
    cells = tbl[id_col].to_numpy()[order]
    flat = tbl[vec_col].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    cmat = flat.astype(np.float64).reshape(len(cells), -1)[order]
    return _finish_centroids(cells, cmat)


def _finish_centroids(cells, cmat):
    import numpy as np

    css = np.floor((cmat * cmat) * PROD_SCALE).astype(np.int64).sum(axis=1)
    return cells, cmat, np.sqrt(css.astype(np.float64))


def _nearest_cells(mat, cents):
    """best cell per row of ``mat`` (float64) — the shared Lloyd-assignment
    arithmetic: fixed-point cosine vs each centroid, ascending cells with a
    strict > so ties keep the LOWEST cell (the order the old window
    (cos DESC, cell ASC) picked).  Used identically by the distributed
    kernel and the driver-side query-assignment fast path."""
    import numpy as np

    cells, cmat, sqrt_css = cents
    ss = np.floor((mat * mat) * PROD_SCALE).astype(np.int64).sum(axis=1)
    sqrt_ss = np.sqrt(ss.astype(np.float64))
    best_cos = np.full(len(mat), -np.inf)
    best_cell = np.zeros(len(mat), dtype=np.int64)
    for ci in range(len(cells)):
        dots = np.floor(mat * cmat[ci] * PROD_SCALE).astype(np.int64).sum(axis=1)
        cos = np.floor(dots.astype(np.float64) / (sqrt_ss * sqrt_css[ci]) * 1e9) / 1e9
        upd = cos > best_cos
        best_cos[upd] = cos[upd]
        best_cell[upd] = cells[ci]
    return best_cell


def _cell_ranking(mat, cents, nprobe: int):
    """(n, nprobe) array of each row's nprobe nearest cells, ordered by
    (cosine DESC, cell ASC) — the multi-probe generalization of
    _nearest_cells (identical arithmetic; stable argsort over the
    ascending-sorted cell axis reproduces the lowest-cell tiebreak)."""
    import numpy as np

    cells, cmat, sqrt_css = cents
    ss = np.floor((mat * mat) * PROD_SCALE).astype(np.int64).sum(axis=1)
    sqrt_ss = np.sqrt(ss.astype(np.float64))
    cosm = np.empty((len(mat), len(cells)))
    for ci in range(len(cells)):
        dots = np.floor(mat * cmat[ci] * PROD_SCALE).astype(np.int64).sum(axis=1)
        cosm[:, ci] = (
            np.floor(dots.astype(np.float64) / (sqrt_ss * sqrt_css[ci]) * 1e9)
            / 1e9
        )
    order = np.argsort(-cosm, axis=1, kind="stable")[:, :nprobe]
    return cells[order]


def vectors_from_parquet(path: str, lo: int, hi: int,
                         id_col: str = "vec_id", vec_col: str = "embedding"):
    """(ids, mat float64) for id ∈ [lo, hi), read driver-side with
    predicate pushdown — for broadcast-sized sides (query vectors) where a
    distributed scan is all fixed cost."""
    import numpy as np
    import pyarrow.dataset as pads

    ds = pads.dataset(path, format="parquet")
    fld = pads.field(id_col)
    tbl = ds.to_table(columns=[id_col, vec_col], filter=(fld >= lo) & (fld < hi))
    order = np.argsort(tbl[id_col].to_numpy())
    ids = tbl[id_col].to_numpy()[order]
    flat = tbl[vec_col].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    mat = flat.astype(np.float64).reshape(len(ids), -1)[order]
    return ids, mat


def _assign_to_centroids(
    df: DataFrame, cents, id_col: str, vec_col: str, with_vec: bool
) -> DataFrame:
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    cells, cmat, sqrt_css = cents
    in_fields = {f.name: f for f in df.schema.fields}
    fields = [in_fields[id_col], StructField("cell", LongType())]
    if with_vec:
        fields.insert(1, in_fields[vec_col])
    out_schema = StructType(fields)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            best_cell = _nearest_cells(mat, (cells, cmat, sqrt_css))
            out = {id_col: pdf[id_col].to_numpy(), "cell": best_cell}
            if with_vec:
                out[vec_col] = pdf[vec_col].to_numpy()
            yield pd.DataFrame(out)[[f.name for f in fields]]

    return df.select(id_col, vec_col).mapInPandas(kernel, out_schema)


def pairwise_cosine(
    df: DataFrame,
    id_a: str,
    id_b: str,
    vec_a: str,
    vec_b: str,
    out: str = "cosine_sim",
) -> DataFrame:
    """(id_a, id_b, cosine) for rows carrying BOTH vectors side by side
    (the shape a broadcast join produces) — one vectorized Arrow batch
    instead of an interpreted 3×zip_with/aggregate lambda chain per row.
    Same fixed-point op sequence as scaled_dot/trunc9, so values are
    bit-identical to the expression form and the DuckDB oracle."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [in_fields[id_a], in_fields[id_b], StructField(out, DoubleType())]
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack(pdf[vec_a].to_numpy()).astype(np.float64)
            b = np.stack(pdf[vec_b].to_numpy()).astype(np.float64)
            dots = np.floor(a * b * PROD_SCALE).astype(np.int64).sum(axis=1)
            ssa = np.floor(a * a * PROD_SCALE).astype(np.int64).sum(axis=1)
            ssb = np.floor(b * b * PROD_SCALE).astype(np.int64).sum(axis=1)
            cos = (
                np.floor(
                    dots.astype(np.float64)
                    / (np.sqrt(ssa.astype(np.float64)) * np.sqrt(ssb.astype(np.float64)))
                    * 1e9
                )
                / 1e9
            )
            yield pd.DataFrame(
                {
                    id_a: pdf[id_a].to_numpy(),
                    id_b: pdf[id_b].to_numpy(),
                    out: cos,
                }
            )

    return df.mapInPandas(kernel, out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = IVF_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    query_vectors=None,
    nprobe: int = 1,
) -> DataFrame:
    """(query_id, cand_id, cosine_sim, rank): approximate top-k — each query
    probes its ``nprobe`` nearest IVF cells (default 1).  The scale path vs
    brute force: candidate count drops by ~n_cells/nprobe×; nprobe is the
    recall-vs-cost knob (corpus work scales linearly in it, recall
    approaches exact as nprobe → n_cells).

    Single-pass probe: the query side is broadcast-sized BY CONTRACT (a
    handful of vectors), so it is assigned driver-side (same _nearest_cells
    arithmetic) and closed over by ONE corpus kernel that assigns each
    corpus row to its cell and scores it against that cell's queries in
    the same Arrow batch — one pass over the corpus, no join, no second
    Python stage.  All arithmetic mirrors scaled_dot/trunc9 op-for-op, so
    values are bit-identical to the expression form and the DuckDB oracle.

    ``query_vectors`` = (ids, mat float64) from vectors_from_parquet skips
    even the query-collect Spark job (driver-side parquet pushdown)."""
    import numpy as np
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cents = centroids or _collect_centroids(corpus, n_cells, id_col, vec_col)
    if query_vectors is not None:
        qids, qmat = query_vectors
    else:
        rows = sorted(
            queries.select(id_col, vec_col).collect(), key=lambda r: r[id_col]
        )
        qids = np.array([r[id_col] for r in rows], dtype=np.int64)
        qmat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    qcells = _cell_ranking(qmat, cents, nprobe)  # (n_queries, nprobe)
    qss = np.floor((qmat * qmat) * PROD_SCALE).astype(np.int64).sum(axis=1)
    # cell -> (qids, qmat, sqrt_qss): the per-cell probe sets each task
    # closes over — the broadcast side of the probe, as a plain constant.
    # With nprobe>1 a query appears in several cells' probe sets; each
    # (query, cand) pair still scores once because a candidate belongs to
    # exactly one cell.
    sqrt_qss = np.sqrt(qss.astype(np.float64))
    by_cell = {}
    for c in np.unique(qcells):
        m = (qcells == c).any(axis=1)
        by_cell[int(c)] = (qids[m], qmat[m], sqrt_qss[m])

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("cand_id", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            cell = _nearest_cells(mat, cents)
            ss = np.floor((mat * mat) * PROD_SCALE).astype(np.int64).sum(axis=1)
            sqrt_ss = np.sqrt(ss.astype(np.float64))
            outs = []
            for c, (qi, qm, sq) in by_cell.items():
                m = cell == c
                if not m.any():
                    continue
                cm, ci, cs = mat[m], ids[m], sqrt_ss[m]
                for j in range(len(qi)):
                    dots = (
                        np.floor(cm * qm[j] * PROD_SCALE)
                        .astype(np.int64)
                        .sum(axis=1)
                    )
                    cos = (
                        np.floor(dots.astype(np.float64) / (sq[j] * cs) * 1e9)
                        / 1e9
                    )
                    keep = ci != qi[j]
                    if keep.any():
                        outs.append(
                            pd.DataFrame(
                                {
                                    "query_id": np.full(
                                        int(keep.sum()), qi[j], dtype=np.int64
                                    ),
                                    "cand_id": ci[keep],
                                    "cosine_sim": cos[keep],
                                }
                            )
                        )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def lloyd_partials(
    corpus: DataFrame,
    centroids,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-Arrow-batch partial sums for one k-means Lloyd step:
    (cell, n, s0..s{dims-1}) where s_d = Σ floor(v[d]·1e9) as int64 — the
    map-side combine fused into the assignment kernel, so the final
    groupBy(cell).sum() exchanges ≤ n_cells rows per batch instead of the
    whole assigned corpus.  Fixed-point integer partials are exact and
    order-independent, so the fused form is bit-identical to assigning
    then aggregating."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("cell", LongType()), StructField("n", LongType())]
        + [StructField(f"s{d}", LongType()) for d in range(dims)]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cell = _nearest_cells(mat, centroids)
            comp = np.floor(mat[:, :dims] * 1e9).astype(np.int64)
            cells = np.unique(cell)
            out = {
                "cell": cells,
                "n": np.array([(cell == c).sum() for c in cells], dtype=np.int64),
            }
            for d in range(dims):
                out[f"s{d}"] = np.array(
                    [comp[cell == c, d].sum() for c in cells], dtype=np.int64
                )
            yield pd.DataFrame(out)

    return corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)


N_LLOYD_ITERS = 2  # Lloyd refinements baked into the IVF-PQ index build
# Deliberately UNLOCKED (unlike plans._plan_memo / llmdata._shared_memo,
# which hold persisted/plan handles): training is a deterministic pure
# function of the key (fixed-point int64 Lloyd sums), so a concurrent
# double-build stores byte-identical values and nothing is persisted —
# the only race cost is a wasted retrain, and every caller is
# single-threaded (driver/bench/tests).
_trained_cache: dict = {}


def train_centroids(
    corpus: DataFrame,
    path: str,
    n_cells: int = IVF_CELLS,
    n_iters: int = N_LLOYD_ITERS,
    dims: int | None = None,  # default EMBEDDING_DIM (defined below)
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """K-MEANS-TRAINED centroid triple for the IVF index build: seed with
    the first ``n_cells`` corpus vectors, then run ``n_iters`` distributed
    Lloyd steps (``lloyd_partials`` fused assign+partial-sum kernel →
    one ≤n_cells-row exchange → driver-side mean).  Centroid quality is
    what makes cell-restricted ANN recall survive a real corpus (VERDICT
    r5 item 2): untrained seeds give Voronoi cells of wildly uneven mass,
    and every query probing a junk cell misses its true neighbors.

    Deterministic and engine-reproducible: component sums are fixed-point
    int64 (Σ floor(v_d·1e9) — exact, order-independent at any
    parallelism), and the mean is the ONE double division
    sum / (n·1e9), so the DuckDB oracle re-derives bit-identical
    centroids from the same seed by replaying the same algebra in SQL
    (plans/llmdata._SQL_IVF_PQ_CTES).  A cell left empty by a step keeps
    its previous centroid (both engines).  int64 sums stay exact below
    ~9e6 assigned vectors per cell per the |term| ≤ 1e9 bound; beyond
    that a production build would widen to decimal partials.

    State is K×(dims+1) longs per step — a fitted-model constant on the
    driver, like any broadcast ML model; the corpus only ever streams
    through the Arrow kernel.  Cached per (file identity, n_cells,
    n_iters): three queries share one index build, and a regenerated
    corpus file re-trains."""
    import os

    import numpy as np

    if dims is None:
        dims = EMBEDDING_DIM
    st = os.stat(path)
    key = (
        os.path.realpath(path), st.st_size, st.st_mtime_ns,
        n_cells, n_iters, dims,
    )
    hit = _trained_cache.get(key)
    if hit is not None:
        return hit
    cells, cmat, sqrt_css = centroids_from_parquet(
        path, n_cells, id_col, vec_col
    )
    for _ in range(n_iters):
        agg = (
            lloyd_partials(
                corpus, (cells, cmat, sqrt_css), dims, id_col, vec_col
            )
            .groupBy("cell")
            .agg(
                F.sum("n").alias("n"),
                *[F.sum(f"s{d}").alias(f"s{d}") for d in range(dims)],
            )
            .collect()
        )
        new = cmat.copy()  # empty cell -> previous centroid survives
        for row in agg:
            ci = int(np.nonzero(cells == row["cell"])[0][0])
            sums = np.array(
                [row[f"s{d}"] for d in range(dims)], dtype=np.float64
            )
            new[ci] = sums / (float(row["n"]) * 1e9)
        cells, cmat, sqrt_css = _finish_centroids(cells, new)
    _trained_cache[key] = (cells, cmat, sqrt_css)
    return cells, cmat, sqrt_css


# ---------------------------------------------------------------------------
# sign-LSH (random hyperplanes) for embedding near-dup at scale
# ---------------------------------------------------------------------------

N_PLANES = 16
EMBEDDING_DIM = 64  # TESTDATA embedding dimensionality


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5('p{plane}:{dim}') → first 8 hex chars → uint32 → scale.  Computed
    driver-side ONCE — the planes are constants, so evaluating the md5 chain
    per data row (the naive expression form) wastes n_rows × n_planes × dim
    hash calls."""
    import hashlib

    h = int(hashlib.md5(f"p{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return h / float(2**31) - 1.0


def sign_lsh_signature(
    vec: Column, n_planes: int = N_PLANES, dim: int = EMBEDDING_DIM
) -> Column:
    """Bit i = sign(v · plane_i); equal signatures ⇒ likely-close vectors.
    Planes are literal arrays (broadcast as part of the plan).  The dot is
    fixed-point (Σ floor(vᵢ·wᵢ·1e12) as BIGINT, exactly scaled_dot's op
    sequence) so the sign — and therefore every bucket assignment — is
    bit-identical across Spark / numpy / the DuckDB oracle, no matter the
    summation order."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(_plane_component(p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(
                vec,
                plane,
                lambda x, w: F.floor(x.cast("double") * w * F.lit(PROD_SCALE)),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


#  Unlocked by design: immutable value per key, idempotent re-read on a
#  lost race, and executor Python workers are separate processes anyway.
_SIDE_CACHE: dict = {}  # executor-local: parquet path → (ids, matrix, ss)


def _load_side(path: str, id_col: str, vec_col: str):
    """Read the full corpus side of the pair join from parquet, once per
    executor (module-level cache).  The map side streams past it — the
    classic block-nested-loop with a side file, no driver collect.  On a
    cluster the same read hits shared storage; blocking the side file is
    the knob when it outgrows executor memory."""
    import numpy as np
    import pyarrow.parquet as pq

    got = _SIDE_CACHE.get(path)
    if got is None:
        tbl = pq.read_table(path, columns=[id_col, vec_col])
        ids = tbl[id_col].to_numpy()
        flat = tbl[vec_col].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        mat = flat.astype(np.float64).reshape(len(ids), -1)
        # fixed-point self-dots: floor((x·x)·1e12) summed as int64 — the
        # exact op sequence of scaled_dot, so sqrt(ss) matches JVM/DuckDB.
        ss = np.floor((mat * mat) * PROD_SCALE).astype(np.int64).sum(axis=1)
        got = _SIDE_CACHE[path] = (ids, mat, ss)
    return got


# Loud bound for the all-pairs ground truth: n_side rows × n_corpus rows of
# fixed-point dot products is O(n²) by definition.  50k² = 2.5e9 pair-dots is
# the most a "baseline run" can justify; anything larger is someone using the
# ground truth as the scale path — refuse, pointing at sign_lsh_near_dup.
EXACT_BASELINE_MAX_ROWS = 50_000


def exact_near_dup(
    corpus: DataFrame,
    corpus_path: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine_sim) for ALL pairs with cosine ≥ threshold —
    the exact ground truth the LSH variant approximates (use it to measure
    recall, or directly when n is small enough for O(n²)).  Refuses side
    files above ``EXACT_BASELINE_MAX_ROWS`` (parquet-footer row count, no
    data read) so the baseline can't silently become the production path.

    mapInPandas block-nested-loop: each task numpy-multiplies its rows
    against the side-file matrix.  Every arithmetic step mirrors
    scaled_dot/trunc9 IEEE op-for-op — float→double widen, per-term
    double multiply, ·1e12, floor, exact int64 sum, double divide,
    floor(·1e9)/1e9 — so results hash-match the DuckDB oracle despite
    three different runtimes (numpy / JVM / DuckDB) computing them."""
    import pyarrow.dataset as pads

    # footer-only count; handles both a single file and a Spark-written dir
    n_side = pads.dataset(corpus_path, format="parquet").count_rows()
    if n_side > EXACT_BASELINE_MAX_ROWS:
        raise ValueError(
            f"exact_near_dup is the O(n²) ground-truth baseline; side file "
            f"{corpus_path} has {n_side} rows (> {EXACT_BASELINE_MAX_ROWS}). "
            "Use sign_lsh_near_dup for near-dup detection at scale."
        )

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        ids_b, mat_b, ss_b = _load_side(corpus_path, id_col, vec_col)
        sqrt_ss_b = np.sqrt(ss_b.astype(np.float64))
        for pdf in batches:
            ids_a = pdf[id_col].to_numpy()
            if len(ids_a) == 0:
                continue
            mat_a = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ss_a = np.floor((mat_a * mat_a) * PROD_SCALE).astype(np.int64).sum(axis=1)
            outs = []
            for i in range(len(ids_a)):
                dots = (
                    np.floor((mat_a[i] * mat_b) * PROD_SCALE)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                cos = (
                    np.floor(
                        dots.astype(np.float64)
                        / (np.sqrt(float(ss_a[i])) * sqrt_ss_b)
                        * 1e9
                    )
                    / 1e9
                )
                mask = (cos >= threshold) & (ids_a[i] < ids_b)
                if mask.any():
                    outs.append(
                        pd.DataFrame(
                            {
                                "id_a": np.full(int(mask.sum()), ids_a[i]),
                                "id_b": ids_b[mask],
                                "cosine_sim": cos[mask],
                            }
                        )
                    )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)


LSH_BANDS = 4  # 16 planes → 4 bands × 4 planes


def sign_lsh_band_buckets(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    n_bands: int = LSH_BANDS,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """(id, vec, band, bucket): the signature split into ``n_bands`` buckets
    of ``n_planes/n_bands`` sign bits each (same band structure as
    MinHash-LSH in operators/dedup.py).  Banding is what makes the recall
    math work: at cosine 0.95 one 16-bit signature matches with prob
    (1−θ/π)^16 ≈ 0.18, while any-of-4 4-bit bands ≈ 0.985."""
    band_bits = n_planes // n_bands
    sig = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        sign_lsh_signature(F.col(vec_col), n_planes, dim).alias("sig"),
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("sig"), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(id_col, vec_col, F.explode(bands).alias("bb")).select(
        id_col,
        vec_col,
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


_PLANES_CACHE: dict = {}


def _planes_matrix(n_planes: int, dim: int):
    """(n_planes, dim) float64 matrix of the deterministic hyperplanes —
    the same _plane_component values the Catalyst literals carry."""
    import numpy as np

    key = (n_planes, dim)
    got = _PLANES_CACHE.get(key)
    if got is None:
        got = _PLANES_CACHE[key] = np.array(
            [[_plane_component(p, d) for d in range(dim)] for p in range(n_planes)],
            dtype=np.float64,
        )
    return got


def sign_lsh_band_buckets_kernel(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    n_bands: int = LSH_BANDS,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Vectorized twin of sign_lsh_band_buckets: identical (band, bucket)
    assignments (a test pins kernel == Catalyst), but the sign dots run as
    numpy ops per Arrow batch instead of n_planes interpreted HOF lambdas
    per row — the n_planes×dim literal expression tree costs more to
    analyze+interpret than the data costs to scan."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    in_fields = {f.name: f for f in corpus.schema.fields}
    out_schema = StructType(
        [
            in_fields[id_col],
            in_fields[vec_col],
            StructField("band", IntegerType()),
            StructField("bucket", LongType()),
        ]
    )
    band_bits = n_planes // n_bands
    mask = (1 << band_bits) - 1

    def kernel(batches):
        import numpy as np
        import pandas as pd

        planes = _planes_matrix(n_planes, dim)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sig = np.zeros(len(mat), dtype=np.int64)
            # per-plane fixed-point dot: floor per term, exact int64 sum —
            # the identical op sequence as sign_lsh_signature
            for p in range(n_planes):
                d = (
                    np.floor(mat * planes[p] * PROD_SCALE)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                sig |= (d >= 0).astype(np.int64) << p
            frames = []
            for b in range(n_bands):
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: pdf[id_col].to_numpy(),
                            vec_col: pdf[vec_col].to_numpy(),
                            "band": np.full(len(mat), b, dtype=np.int32),
                            "bucket": (sig >> (b * band_bits)) & mask,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    n_bands: int = LSH_BANDS,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """(id_a, id_b, cosine_sim) for pairs with cosine >= threshold among
    pairs that collide in at least one sign-LSH band.

    Scale shape: the shuffle is keyed on (band, bucket) — never the full
    pair space — and the exact verify runs as a vectorized numpy gram
    matrix per bucket group (applyInPandas), not a per-pair interpreted
    expression: at sf0.1 that is the difference between 16 s and ~1 s.
    Bits-per-band is the knob that bounds bucket width as n grows.
    Because the planes (and the fixed-point sign dots) are deterministic,
    the collision set is reproducible — the DuckDB oracle replays the
    identical banding and verify, making even the *approximate* operator
    hash-checkable."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def bucket_pairs(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine_sim": "float64"}
            )
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        ss = np.floor((mat * mat) * PROD_SCALE).astype(np.int64).sum(axis=1)
        sqrt_ss = np.sqrt(ss.astype(np.float64))
        outs = []
        # row-blocked fixed-point gram: mirrors scaled_dot/trunc9 IEEE
        # op-for-op (widen, multiply, ·1e12, floor, exact int64 sum,
        # divide, floor(·1e9)/1e9) so values hash-match JVM and DuckDB
        for i in range(len(ids)):
            dots = np.floor((mat[i] * mat) * PROD_SCALE).astype(np.int64).sum(axis=1)
            cos = np.floor(dots.astype(np.float64) / (sqrt_ss[i] * sqrt_ss) * 1e9) / 1e9
            mask = (cos >= threshold) & (ids[i] < ids)
            if mask.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": np.full(int(mask.sum()), ids[i]),
                            "id_b": ids[mask],
                            "cosine_sim": cos[mask],
                        }
                    )
                )
        if not outs:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine_sim": "float64"}
            )
        return pd.concat(outs, ignore_index=True)

    bb = sign_lsh_band_buckets_kernel(corpus, id_col, vec_col, n_planes, n_bands, dim)
    pairs = bb.groupBy("band", "bucket").applyInPandas(bucket_pairs, out_schema)
    # a pair colliding in several bands yields identical rows — collapse
    return pairs.dropDuplicates(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# Product quantization: M subspaces × K codewords, fixed-point L2 assignment
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces (dim 64 → 16 dims each)
PQ_K = 16  # codewords per subspace → 4 bits/subspace, 16 bits/vector


def pq_encode(
    corpus: DataFrame,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = PQ_M,
    n_codes: int = PQ_K,
) -> DataFrame:
    """(id, pq_code, err_fixed): product-quantization codes + exact
    reconstruction error.

    ``codebook`` is the (n_codes × dim) float64 matrix whose row j is
    codeword j in EVERY subspace (deterministic stand-in codebook: the
    first n_codes corpus vectors, read driver-side like the IVF centroids
    — a fitted-model constant, not data).  Assignment metric is squared
    L2 in fixed point: per element floor((x-c)²·1e12) summed as int64 —
    every step (float32→float64 widen, subtract, multiply, floor) is an
    IEEE-exact or correctly-rounded deterministic op, so the DuckDB
    oracle reproduces codes AND errors bit-for-bit.  Ties keep the
    lowest code (np.argmin first-occurrence == the oracle's
    ROW_NUMBER ... ORDER BY d, code).

    Scale: the corpus streams through one Arrow-batched kernel — no
    shuffle, no join; the codebook is a closure constant (at 100 TB the
    same kernel runs per input split; n_codes·dim doubles broadcast).
    """
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    cmat = np.asarray(codebook, dtype=np.float64)
    dim = cmat.shape[1]
    sub_d = dim // n_sub
    in_fields = {f.name: f for f in corpus.schema.fields}
    out_schema = StructType(
        [
            in_fields[id_col],
            StructField("pq_code", LongType()),
            StructField("err_fixed", LongType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.zeros(len(mat), dtype=np.int64)
            errs = np.zeros(len(mat), dtype=np.int64)
            for m in range(n_sub):
                sl = slice(m * sub_d, (m + 1) * sub_d)
                diff = mat[:, None, sl] - cmat[None, :, sl]
                d = np.floor(diff * diff * PROD_SCALE).astype(np.int64).sum(
                    axis=2
                )
                best = np.argmin(d, axis=1)  # first occurrence = lowest code
                codes += best.astype(np.int64) * (n_codes ** m)
                errs += d[np.arange(len(mat)), best]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "pq_code": codes,
                    "err_fixed": errs,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)


def exact_l2_rerank(
    cands: DataFrame,
    corpus: DataFrame,
    query_ids,
    query_mat,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, cand_id, exact_fixed): exact fixed-point squared-L2
    between each surviving (query, candidate) pair — the re-rank stage of
    an IVF-PQ search.

    ``cands`` is the small ADC-survivor relation (query_id, cand_id),
    |Q|·R rows: it broadcasts to the corpus scan, so only candidate
    vectors leave the scan and the exact math runs on R rows per query —
    never on the corpus.  Query vectors ride in the kernel closure
    (fitted-model-scale constants, like the centroids/codebook).
    Arithmetic mirrors pq_encode element-for-element — float32→float64
    widen, subtract, square, ·1e12, floor, int64 sum — every step
    IEEE-exact or correctly rounded, so the DuckDB oracle reproduces
    exact_fixed bit-for-bit."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    qmat = np.asarray(query_mat, dtype=np.float64)
    qrow = {int(q): i for i, q in enumerate(query_ids)}
    joined = (
        corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("_vec"))
        .join(F.broadcast(cands), "cand_id")
        .select("query_id", "cand_id", "_vec")
    )
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("cand_id", LongType()),
            StructField("exact_fixed", LongType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            qi = np.array([qrow[int(q)] for q in pdf["query_id"]], dtype=np.int64)
            diff = qmat[qi] - mat
            exact = (
                np.floor(diff * diff * PROD_SCALE).astype(np.int64).sum(axis=1)
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "cand_id": pdf["cand_id"].to_numpy(),
                    "exact_fixed": exact,
                }
            )

    return joined.mapInPandas(kernel, out_schema)


def brute_force_l2_topk(
    corpus: DataFrame,
    query_ids,
    query_mat,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, cand_id, exact_fixed, rank): exact squared-L2 top-k of
    each query over the WHOLE corpus — the ground-truth side of an ANN
    recall evaluation (the metric an index's quality is graded by).

    Scale shape: one corpus pass; query vectors ride in the kernel
    closure (fitted-model-scale constants).  Each Arrow batch pre-reduces
    to its own top-k per query — monotone, so the global top-k is
    preserved — and only those ≤ |Q|·k survivor rows per batch reach the
    final window, never the |corpus|·|Q| score relation.  Arithmetic
    mirrors exact_l2_rerank element-for-element (float64 widen, subtract,
    square, ·1e12, floor, int64 sum), ties broken by cand_id, so the
    DuckDB oracle replays it bit-for-bit."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    qmat = np.asarray(query_mat, dtype=np.float64)
    qids = np.asarray([int(q) for q in query_ids], dtype=np.int64)
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("cand_id", LongType()),
            StructField("exact_fixed", LongType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy().astype(np.int64)
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            for qi, qid in enumerate(qids):
                keep = ids != qid  # self-match excluded
                if not keep.any():
                    continue
                diff = qmat[qi] - mat[keep]
                fx = np.floor(diff * diff * PROD_SCALE).astype(np.int64).sum(axis=1)
                cids = ids[keep]
                order = np.lexsort((cids, fx))[:k]  # (exact_fixed, cand_id)
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(order), qid, dtype=np.int64),
                        "cand_id": cids[order],
                        "exact_fixed": fx[order],
                    }
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("exact_fixed"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def pq_adc_lut(
    query_ids,
    query_mat,
    codebook,
    n_sub: int = PQ_M,
    n_codes: int = PQ_K,
):
    """Asymmetric-distance lookup table rows [(query_id, m, code, d_fixed)].

    For each query vector: the fixed-point squared-L2 distance from its
    m-th subvector to every codeword of subspace m — the |Q|·M·K table an
    ADC scan adds per corpus code.  Driver-side numpy with the SAME op
    order as pq_encode, so table entries equal the oracle's per-subspace
    distances bit-for-bit."""
    import numpy as np

    cmat = np.asarray(codebook, dtype=np.float64)
    qmat = np.asarray(query_mat, dtype=np.float64)
    sub_d = cmat.shape[1] // n_sub
    rows = []
    for qi, qid in enumerate(query_ids):
        for m in range(n_sub):
            sl = slice(m * sub_d, (m + 1) * sub_d)
            diff = qmat[qi, None, sl] - cmat[:, sl]
            d = np.floor(diff * diff * PROD_SCALE).astype(np.int64).sum(axis=1)
            for code in range(n_codes):
                rows.append((int(qid), m, code, int(d[code])))
    return rows


def ivf_pq_encode(
    corpus: DataFrame,
    cents,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = PQ_M,
    n_codes: int = PQ_K,
) -> DataFrame:
    """(id, cell, pq_code): IVF cell assignment AND PQ encoding in ONE
    Arrow-batched pass — the index-build step of an IVF-PQ index.  Both
    model constants (centroids, codebook) are closure broadcasts; the
    corpus is never joined with itself (the naive compose of ivf_assign +
    pq_encode costs a corpus-sized shuffle join).  Arithmetic is the same
    IEEE-exact fixed-point as the two standalone kernels, so cell and
    code agree bit-for-bit with their oracles."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    cmat = np.asarray(codebook, dtype=np.float64)
    sub_d = cmat.shape[1] // n_sub
    in_fields = {f.name: f for f in corpus.schema.fields}
    out_schema = StructType(
        [
            in_fields[id_col],
            StructField("cell", LongType()),
            StructField("pq_code", LongType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cell = _nearest_cells(mat, cents)
            codes = np.zeros(len(mat), dtype=np.int64)
            for m in range(n_sub):
                sl = slice(m * sub_d, (m + 1) * sub_d)
                diff = mat[:, None, sl] - cmat[None, :, sl]
                d = np.floor(diff * diff * PROD_SCALE).astype(np.int64).sum(
                    axis=2
                )
                codes += np.argmin(d, axis=1).astype(np.int64) * (n_codes ** m)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": cell,
                    "pq_code": codes,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)


def cell_assignments(
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell, cos_e9): every corpus vector's Voronoi cell under
    ``centroids`` plus its fixed-point cosine to that centroid as an
    INTEGER (floor(cos·1e9) — computed on the int64 partial dots BEFORE
    any float division leaves the kernel, the same algebra as
    ``_nearest_cells`` so assignment and score agree bit-for-bit with
    the Lloyd/IVF kernels and with the SQL oracle's ``ag``/``ass``
    CTEs).  One corpus streaming pass, no shuffle; the downstream
    balance report aggregates on the ≤n_cells key."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("cell", LongType()),
            StructField("cos_e9", LongType()),
        ]
    )
    cells, cmat, sqrt_css = centroids

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ss = np.floor((mat * mat) * PROD_SCALE).astype(np.int64).sum(axis=1)
            sqrt_ss = np.sqrt(ss.astype(np.float64))
            best_e9 = np.full(len(mat), np.iinfo(np.int64).min, dtype=np.int64)
            best_cell = np.zeros(len(mat), dtype=np.int64)
            for ci in range(len(cells)):
                dots = (
                    np.floor(mat * cmat[ci] * PROD_SCALE)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                cos_e9 = np.floor(
                    dots.astype(np.float64) / (sqrt_ss * sqrt_css[ci]) * 1e9
                ).astype(np.int64)
                upd = cos_e9 > best_e9
                best_e9[upd] = cos_e9[upd]
                best_cell[upd] = cells[ci]
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "cell": best_cell,
                    "cos_e9": best_e9,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)
