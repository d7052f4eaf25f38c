"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute force — one pass over N vectors per
  query, JVM-side dot products (F.zip_with/F.aggregate). The
  correctness baseline.
- ``lsh_topk``: sign-random-hyperplane LSH — deterministic
  pseudo-random hyperplanes derived from xxhash64, vectors bucketed
  by sign bits; a query probes only its bucket (optionally
  Hamming-1 neighbors). The 100 TB path: bucket column is
  partition/cluster-by-able so a query touches one bucket's files.
- ``embedding_near_dup_pairs``: exact cosine ≥ threshold all-pairs
  (embedding-space near-dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot_sql_names(a: str, b: str, dim: int) -> str:
    """Unrolled dot product as ONE SQL string over two array-column
    NAMES: a[0]*b[0] + a[1]*b[1] + … . Parsing a single string is one
    py4j round trip; building the same tree with Column operators is
    ~4·dim JVM calls (~2.5 s of driver time per query at dim=64,
    measured) for an identical plan. Left-to-right summation order —
    bit-identical doubles to the Column-built fold."""
    terms = [
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
        for i in range(dim)
    ]
    return "(" + " + ".join(terms) + ")"


def _dot_q_sql(a: str, query_vec: list[float], dim: int) -> str:
    """Unrolled dot of an array column against a CONSTANT query vector,
    with the constants inlined as double literals (no literal-array
    node, no per-component py4j call)."""
    terms = [
        f"(CAST({a}[{i}] AS DOUBLE) * {float(query_vec[i])!r}D)"
        for i in range(dim)
    ]
    return "(" + " + ".join(terms) + ")"


def _norm_sql_name(a: str, dim: int) -> str:
    return f"SQRT({_dot_sql_names(a, a, dim)})"


def _fold_norm(vec: list[float]) -> float:
    """Python-side norm with the same left-to-right fold order as the
    SQL expressions (bit-identical double)."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """vec·vec. With ``dim`` known, emit an unrolled flat expression
    (a[0]*b[0] + a[1]*b[1] + ...) — pure whole-stage-codegen arithmetic,
    ~10× the interpreted higher-order-function fold, with the SAME
    left-to-right summation order (bit-identical doubles). Without
    ``dim``, fall back to the lambda fold (interpreted; cold paths only).
    """
    if dim is not None:
        terms = [
            a.getItem(i).cast("double") * b.getItem(i).cast("double")
            for i in range(dim)
        ]
        out = terms[0]
        for term in terms[1:]:
            out = out + term
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_lit(a: Column, plane: list[float]) -> Column:
    """vec·constant-plane via the interpreted fold on a literal array.

    Deliberately NOT unrolled: ``F.array(lit, …)`` constant-folds to a
    single Literal node, so a 48-plane banding projection stays a
    ~50-node plan. Unrolling each plane into 64 GetArrayItem×Multiply
    nodes makes a ~3000-node tree whose whole-stage codegen allocates
    hundreds of MB compiling — enough to OOM a default-1g driver
    (measured). Banding touches only N rows (one pass, map-only), so
    the interpreted fold is not a hot path; pair VERIFICATION is, and
    that uses the unrolled ``_dot(…, dim)``."""
    return _dot(a, F.array(*[F.lit(float(c)) for c in plane]))


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot(a, a, dim))


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Shared input-parallelism guard — see operators/spread.py
    (repartition only when the scan would under-parallelize; no-op at
    cluster scale)."""
    from .spread import ensure_parallelism

    return ensure_parallelism(df)


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a constant query vector;
    deterministic tiebreak on id. Returns (id, cos_sim, rank).

    Scale path: ``orderBy().limit(k)`` compiles to
    ``TakeOrderedAndProject`` — each partition keeps its local top-k
    and only k rows per partition reach the driver-side merge, so no
    global sort/shuffle of the N scored rows ever happens. The rank
    window afterwards runs over exactly k rows (inert).

    The score is ONE parsed SQL expression: unrolled dot with the query
    constants inlined and the query norm pre-folded in Python (same
    left-to-right fold ⇒ bit-identical doubles to the Column-built
    tree it replaces, at ~1/10th the driver-side plan-build cost)."""
    dim = len(query_vec)
    qnorm = _fold_norm(query_vec)
    order = [F.desc("cos_sim"), F.asc(id_col)]
    score_sql = (
        f"ROUND({_dot_q_sql(vec_col, query_vec, dim)} / "
        f"({_norm_sql_name(vec_col, dim)} * {qnorm!r}D), 6)"
    )
    scored = embeddings.select(
        F.col(id_col), F.expr(score_sql).alias("cos_sim")
    )
    top = scored.orderBy(*order).limit(k)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane: component j =
    centered hash of (seed, j). Stable across engines and runs."""
    import numpy as np

    rng = np.random.RandomState(seed * 1000003 % (2**31))
    v = rng.standard_normal(dim)
    return [float(x) for x in (v / np.linalg.norm(v))]


def sign_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: bit i = sign(vec · plane_i). Column-expression
    form — fine for one table; for many tables use
    ``sign_buckets_all`` (vectorized, one numpy matmul per batch)."""
    bits = [
        F.when(
            _dot_lit(vec, plane) > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def sign_buckets_all(tables: list[list[list[float]]]):
    """Vectorized bucket ids for ALL tables at once: a pandas UDF that
    computes the (batch × dim) @ (dim × tables·planes) matmul in numpy
    and packs sign bits per table → ``array<long>`` of length
    ``n_tables``.

    Why a Python stage: 48 plane-dots per row is 48 interpreted
    higher-order folds (~39 µs each, measured) as Column lambdas, or a
    ~3000-node unrolled tree whose codegen OOMs a default-1g driver.
    One Arrow-batched matmul is ~1000× the interpreted fold and keeps
    the plan at a single node. Per-row map-only → embarrassingly
    parallel at cluster scale.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mats = np.asarray(tables, dtype="float64")  # (T, P, D)
    n_tables_, n_planes_, _ = mats.shape
    flat = mats.reshape(n_tables_ * n_planes_, -1).T.copy()  # (D, T*P)
    powers = (1 << np.arange(n_planes_, dtype="int64"))

    @pandas_udf("array<long>")
    def _buckets(v):  # pd.Series[list[float]] -> pd.Series[list[int]]
        import numpy as _np
        import pandas as _pd

        if len(v) == 0:
            return _pd.Series([], dtype="object")
        x = _np.stack([_np.asarray(e, dtype="float64") for e in v])
        bits = (x @ flat) > 0  # (N, T*P)
        b = bits.reshape(len(v), n_tables_, n_planes_) @ powers  # (N, T)
        return _pd.Series(list(b.astype("int64")))

    # asNondeterministic (round-12, guide §4.4): the function IS
    # deterministic, but downstream posexplode/bucket filters get
    # pushed below the projection and the optimizer then evaluates the
    # UDF TWICE per row (two ArrowEvalPython nodes in the near-dup
    # plan, measured) — marking it non-deterministic forbids the
    # duplication, halving the Python-boundary matmul work.  Results
    # are unchanged; the only blocked rewrites are filter pushdowns
    # through this projection, which its callers never rely on.
    return _buckets.asNondeterministic()


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming1: bool = True,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors that collide with the
    query in at least one of ``n_tables`` independent sign-hyperplane
    tables (each table probes the query's bucket plus its Hamming-1
    neighbors by default). Scores inside the candidate set are exact.

    Recall tuning: per-table collision odds for a vector at angle θ
    from the query are (1-θ/π)^n_planes (Hamming-1 probing adds the
    one-bit-off mass); tables union independently. High-similarity
    neighbors (small θ) survive aggressive banding; a corpus whose
    nearest neighbors are only weakly similar (θ → 90°, e.g. random
    synthetic vectors) needs loose banding — few planes, many
    tables — to keep them, at the cost of scanning most of the
    corpus. That trade is inherent to sign-LSH, not this
    implementation.

    Scale: bucket ids come from one vectorized Arrow-batched matmul
    per batch (``sign_buckets_all``) — precompute them as a stored
    column and CLUSTER BY bucket so a query reads only its probed
    buckets' files; the filter below is the query-time form of the
    same pruning."""
    import numpy as np

    dim = len(query_vec)
    qv = np.array(query_vec, dtype="float64")
    tables = [
        [hyperplane(dim, 7919 * t + i + 1) for i in range(n_planes)]
        for t in range(n_tables)
    ]
    buckets_udf = sign_buckets_all(tables)
    cond = None
    for t, planes in enumerate(tables):
        qbucket = 0
        for i, plane in enumerate(planes):
            if float(qv @ np.array(plane)) > 0:
                qbucket |= 1 << i
        probe = {qbucket}
        if probe_hamming1:
            probe |= {qbucket ^ (1 << i) for i in range(n_planes)}
        hit = F.col("__bk").getItem(t).isin([int(b) for b in probe])
        cond = hit if cond is None else (cond | hit)

    cand = (
        embeddings.withColumn("__bk", buckets_udf(F.col(vec_col)))
        .filter(cond)
        .drop("__bk")
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def _collect_training_sample(
    embeddings: DataFrame, vec_col: str, sample_cap: int, seed: int
):
    """Bounded driver-side unit-norm sample matrix for quantizer
    training (the FAISS recipe — coarse/sub quantizers train on
    ≤ ~100k sampled vectors regardless of corpus size, so training is
    O(sample), not O(N), at 100 TB)."""
    import numpy as np

    n = embeddings.count()
    frac = min(1.0, sample_cap / max(n, 1))
    sample = (
        embeddings.select(vec_col).sample(frac, seed=seed).collect()
        if frac < 1.0
        else embeddings.select(vec_col).collect()
    )
    if not sample:
        return np.zeros((0, 0))
    x = np.stack([np.asarray(r[0], dtype="float64") for r in sample])
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _spherical_kmeans(x, k: int, n_iter: int, seed: int):
    """Seeded spherical k-means over a driver-side (n × dim) unit-norm
    matrix.  Deterministic: seeded init, fixed iteration count,
    re-normalized mean update ⇒ assignment by max cosine.  The mean
    update is a per-dimension ``bincount`` segment sum — O(n·dim) with
    no per-cell Python loop, which matters at 100-TB-realistic coarse
    counts (the r11 4096-cell build spent most of its 854 s wall in
    the training loop; the per-cell masked-mean loop alone was O(k·n)
    mask scans per iteration)."""
    import numpy as np

    k = min(k, len(x))  # never ask for more cells than sample vectors
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(n_iter):
        assign = (x @ cent.T).argmax(axis=1)
        counts = np.bincount(assign, minlength=k).astype("float64")
        sums = np.empty_like(cent)
        for d in range(x.shape[1]):
            sums[:, d] = np.bincount(
                assign, weights=x[:, d], minlength=k
            )
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    return cent


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    sample_cap: int = 100_000,
    n_iter: int = 10,
    seed: int = 7,
):
    """Train IVF coarse-quantizer centroids: seeded spherical k-means
    on a bounded driver-side sample (:func:`_spherical_kmeans`; the
    FAISS recipe — O(sample) at any corpus size).

    Returns an (n_cells × dim) numpy array of unit-norm centroids.
    """
    import numpy as np

    x = _collect_training_sample(embeddings, vec_col, sample_cap, seed)
    if x.size == 0:
        return np.zeros((0, 0))
    return _spherical_kmeans(x, n_cells, n_iter, seed)


def train_ivf_centroids_two_level(
    embeddings: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    sample_cap: int = 100_000,
    n_iter: int = 10,
    seed: int = 7,
    branch: int | None = None,
):
    """Hierarchical (two-level) coarse-quantizer training — the
    100-TB-scale path for large cell counts.  Flat k-means training
    costs O(sample · n_cells · dim) per Lloyd iteration and flat
    per-row assignment costs O(n_cells · dim): at n_cells ~ √N
    (tens of thousands of cells for 10⁹+ vectors) both become the
    build bottleneck — SCALE.md r11 measured 854 s at just 4096 flat
    cells on 5M vectors, dominated by exactly these terms.  The
    standard fix (FAISS IMI / hierarchical coarse quantizers): train
    k1 ≈ √n_cells level-1 centers, then k2 sub-centers INSIDE each
    level-1 region, giving n_cells = k1·k2 leaf cells for
    O(sample · (k1 + k2) · dim) training and O((k1 + k2) · dim)
    per-row assignment — √n_cells-factor cheaper on both sides.

    Level-2 sub-centers are trained on each level-1 region's RAW
    member vectors (unit-norm, spherical), so every leaf center is a
    unit vector in the ORIGINAL space and the flat concatenated list
    drops into the existing query-side machinery unchanged
    (``probe_cells`` ranks leaves exactly; only per-ROW assignment is
    hierarchical-approximate).  Regions with ≤ k2 sample members keep
    the members themselves as centers, padded with the level-1 center
    (deterministic; duplicate centers lose argmax ties to the lower
    index and simply leave some leaves empty).

    Returns ``(flat, l1, k2)``: ``flat`` the (k1·k2 × dim) leaf
    centers with leaf id = l1_cell · k2 + sub_cell, ``l1`` the
    (k1 × dim) level-1 centers, ``k2`` the branch width.  Note
    k1·k2 ≥ n_cells (rounded up to a full grid)."""
    import math

    import numpy as np

    x = _collect_training_sample(embeddings, vec_col, sample_cap, seed)
    if x.size == 0:
        return np.zeros((0, 0)), np.zeros((0, 0)), 1
    k1 = branch or max(1, int(round(math.sqrt(n_cells))))
    k1 = min(k1, len(x))
    k2 = max(1, math.ceil(n_cells / k1))
    l1 = _spherical_kmeans(x, k1, n_iter, seed)
    k1 = len(l1)
    assign = (x @ l1.T).argmax(axis=1)
    flat = np.empty((k1 * k2, x.shape[1]), dtype="float64")
    for c in range(k1):
        members = x[assign == c]
        if len(members) == 0:
            flat[c * k2 : (c + 1) * k2] = l1[c]
        elif len(members) <= k2:
            flat[c * k2 : c * k2 + len(members)] = members
            flat[c * k2 + len(members) : (c + 1) * k2] = l1[c]
        else:
            flat[c * k2 : (c + 1) * k2] = _spherical_kmeans(
                members, k2, n_iter, seed + 1 + c
            )
    return flat, l1, k2


def assign_ivf_cells(
    embeddings: DataFrame,
    centroids,
    vec_col: str = "embedding",
    l1_centroids=None,
    branch_k2: int | None = None,
) -> DataFrame:
    """Add an ``ivf_cell`` column: argmax-cosine centroid id, via one
    Arrow-batched matmul per batch (map-only; embarrassingly parallel).
    At rest, CLUSTER BY ivf_cell so a query's probed cells
    partition-prune to a handful of files.

    With ``l1_centroids``/``branch_k2`` (a
    :func:`train_ivf_centroids_two_level` hierarchy) assignment is
    TWO small argmaxes — level-1 center, then that region's ``k2``
    leaf centers — O((k1 + k2) · dim) per row instead of the flat
    O(n_cells · dim) matmul, the term that dominates encode cost at
    100-TB-realistic cell counts.  The returned leaf id indexes the
    same flat centroid list, so everything downstream (partition
    layout, probing, screens) is unchanged."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cent = np.asarray(centroids, dtype="float64")
    if l1_centroids is not None:
        l1_t = np.asarray(l1_centroids, dtype="float64").T.copy()
        k1 = l1_t.shape[1]
        k2 = int(branch_k2)
        sub = cent.reshape(k1, k2, cent.shape[1])  # (k1, k2, D)

        @pandas_udf("int")
        def _cell(v):
            import numpy as _np
            import pandas as _pd

            if len(v) == 0:
                return _pd.Series([], dtype="int32")
            x = _np.stack([_np.asarray(e, dtype="float64") for e in v])
            x = x / _np.linalg.norm(x, axis=1, keepdims=True)
            top = (x @ l1_t).argmax(axis=1)
            scores = _np.einsum("nd,nkd->nk", x, sub[top])
            return _pd.Series(
                (top * k2 + scores.argmax(axis=1)).astype("int32")
            )

    else:
        cent_t = cent.T.copy()  # (D, C)

        @pandas_udf("int")
        def _cell(v):
            import numpy as _np
            import pandas as _pd

            if len(v) == 0:
                return _pd.Series([], dtype="int32")
            x = _np.stack([_np.asarray(e, dtype="float64") for e in v])
            x = x / _np.linalg.norm(x, axis=1, keepdims=True)
            return _pd.Series((x @ cent_t).argmax(axis=1).astype("int32"))

    return embeddings.withColumn("ivf_cell", _cell(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """IVF approximate nearest neighbors: score only the vectors whose
    coarse-quantizer cell is among the ``n_probe`` cells nearest the
    query (exact cosine inside the candidate set).

    This is the second scale path next to sign-LSH (``lsh_topk``):
    IVF adapts to the data distribution (learned cells ≈ equal-mass
    Voronoi regions) where LSH is data-oblivious, so it keeps recall
    on corpora whose neighbors are only weakly similar. n_probe/n_cells
    is the scan fraction: at 100 TB with stored+clustered cell ids a
    query reads ~n_probe/n_cells of the files and nothing else.
    """
    import numpy as np

    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_cells, vec_col)
    if len(centroids) == 0:  # empty corpus: exact scan degrades fine
        return cosine_topk(embeddings, query_vec, k, id_col, vec_col)
    q = np.asarray(query_vec, dtype="float64")
    q = q / np.linalg.norm(q)
    probe = np.argsort(-(centroids @ q))[:n_probe]
    assigned = assign_ivf_cells(
        _ensure_parallelism(embeddings), centroids, vec_col
    )
    cand = assigned.filter(
        F.col("ivf_cell").isin([int(c) for c in probe])
    ).drop("ivf_cell")
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def build_ivf_index(
    embeddings: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    vec_col: str = "embedding",
    sample_cap: int = 100_000,
    seed: int = 7,
) -> None:
    """Materialize a persistent IVF index: the corpus written
    Hive-partitioned BY CELL (``ivf_cell=<c>/`` directories — the
    at-rest CLUSTER BY the ``ivf_topk`` docstring promises) plus the
    trained centroids as a small parquet table.

    The partition layout is what turns n_probe/n_cells from a row
    FILTER into a FILE-pruning guarantee: a query's
    ``ivf_cell IN (probes)`` predicate is a partition filter, so the
    scan lists and reads ONLY the probed cells' directories —
    ~n_probe/n_cells of the bytes at any corpus size. Pinned by
    ``tests/test_ivf_index.py`` via the scan's numFiles metric.

    ``repartition(ivf_cell)`` before the write gives one task (so one
    part-file) per cell instead of every task writing into every
    cell's directory (the small-files anti-pattern).
    """
    spark = embeddings.sparkSession
    cent = train_ivf_centroids(
        embeddings, n_cells, vec_col, sample_cap=sample_cap, seed=seed
    )
    assigned = assign_ivf_cells(embeddings, cent, vec_col)
    (
        assigned.repartition(F.col("ivf_cell"))
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(f"{index_dir}/vectors")
    )
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cent)],
        "cell INT, centroid ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")


_IVF_CENT_CACHE: dict[str, tuple] = {}


def ivf_topk_indexed(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN query over a ``build_ivf_index`` layout: pick the
    ``n_probe`` cells nearest the query from the (tiny) centroid
    table driver-side, then scan ONLY those cells' partitions and
    rescore exactly.  The ``ivf_cell`` predicate prunes at the file
    level (Hive partition filter), so query cost is
    ~n_probe/n_cells of the corpus regardless of its size."""
    import os

    import numpy as np

    # per-process centroid cache (round-12): the tiny quantizer table
    # is immutable after build_ivf_index (the only writer, mode
    # overwrite — which recreates the directory and bumps its mtime,
    # invalidating the entry), yet every query was paying a Spark
    # collect job to re-read it.  Caches the INDEX metadata a serving
    # tier holds in RAM — never query results.
    cdir = os.path.realpath(f"{index_dir}/centroids")
    key = os.stat(cdir).st_mtime_ns
    hit = _IVF_CENT_CACHE.get(cdir)
    if hit is not None and hit[0] == key:
        cent = hit[1]
    else:
        rows = spark.read.parquet(f"{index_dir}/centroids").collect()
        cent = np.zeros((len(rows), len(rows[0]["centroid"])))
        for r in rows:
            cent[r["cell"]] = r["centroid"]
        _IVF_CENT_CACHE[cdir] = (key, cent)
    q = np.asarray(query_vec, dtype="float64")
    q = q / np.linalg.norm(q)
    probe = np.argsort(-(cent @ q))[:n_probe]
    vecs = spark.read.parquet(f"{index_dir}/vectors").filter(
        F.col("ivf_cell").isin([int(c) for c in probe])
    )
    return cosine_topk(vecs.drop("ivf_cell"), query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 8,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    strategy: str = "pair_join",
) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs, exact-verified — the
    100 TB path next to ``embedding_near_dup_pairs`` (exact all-pairs,
    O(N²)).

    ``n_tables`` independent sign-hyperplane tables of ``n_planes``
    bits each; two vectors collide in one table iff all bit signs
    agree. Candidates = pairs sharing any table's bucket; each
    candidate is verified with the exact cosine, so precision is 1.0
    and recall = 1-(1-(1-θ/π)^n_planes)^n_tables for angle θ =
    arccos(threshold). For the defaults at θ≈18° (sim 0.95) that
    formula gives recall ≈0.80 (measured ≈0.85 on planted near-dups);
    raise ``n_tables`` for tighter guarantees.

    Two verification strategies, both exact:

    - ``"pair_join"`` (default): bucket rows carry ONLY (id, table,
      bucket) into the equality self-join shuffle; id pairs are
      deduped FIRST (16-byte rows), then vectors re-join just for
      unique candidates and a codegen'd unrolled dot verifies each.
      Right when banding is tight (many small buckets, few collisions
      per pair) — the shuffle stays narrow and per-pair work is rare.
    - ``"bucket_local"``: vectors ride the (table, bucket) shuffle and
      each bucket verifies ALL its pairs in one vectorized numpy block
      (``applyInPandas`` per bucket, dimension-sequential accumulation
      → bit-identical to the JVM fold); only surviving pairs leave
      the bucket, then a tiny global distinct. Right when banding is
      loose (big buckets, heavy pair duplication across tables) —
      there is no 10M+-row pair-join machinery at all; measured 10×
      the pair_join path at sf0.1 under recall-1.0 gate banding.
      Guardrail at scale: per-bucket work is O(|bucket|²·dim), so cap
      bucket size (more planes) before reaching for this path.
    """
    if dim is None:
        first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            return embeddings.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cos_sim double"
            )
        dim = int(first["d"])
    tables = [
        [hyperplane(dim, 7919 * t + i + 1) for i in range(n_planes)]
        for t in range(n_tables)
    ]
    buckets_udf = sign_buckets_all(tables)

    if strategy == "bucket_local":
        # (tbl, bucket, doc_id, vec): vectors ride the bucket shuffle;
        # each group verifies its own pairs in one numpy block. The
        # accumulation is dimension-sequential (a Python loop of
        # vectorized outer-product adds), i.e. the same left-to-right
        # fold as the JVM expression path — bit-identical doubles, so
        # the exact twin's oracle equality carries over. Pairs are
        # pre-filtered inside the bucket with a half-ulp-loose bound
        # and exact-filtered after JVM-side HALF_UP rounding.
        banded_v = (
            _ensure_parallelism(embeddings)
            .select(
                F.col(id_col).alias("doc_id"),
                F.col(vec_col).alias("vec"),
                buckets_udf(F.col(vec_col)).alias("bk"),
            )
            .select(
                "doc_id", "vec", F.posexplode("bk").alias("tbl", "bucket")
            )
        )

        def _bucket_pairs(pdf):
            import numpy as np
            import pandas as pd

            empty = pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "cos_raw": pd.Series([], dtype="float64"),
                }
            )
            if len(pdf) < 2:
                return empty
            pdf = pdf.sort_values("doc_id")
            ids = pdf["doc_id"].to_numpy()
            mat = np.stack(
                [np.asarray(v, dtype="float64") for v in pdf["vec"]]
            )
            # Two-phase verify: a BLAS gram matrix screens the O(m²)
            # pairs at memory bandwidth, then ONLY the survivors (a
            # loose half-ulp band below the threshold) are recomputed
            # with the dimension-sequential fold — the same
            # left-to-right accumulation as the JVM expression path,
            # so the exact twin's oracle equality carries over while
            # the quadratic phase runs ~d× faster than the old
            # full-matrix fold loop.
            gram = mat @ mat.T
            norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            cos_blas = gram / (norms[:, None] * norms[None, :])
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = cos_blas[ia, ib] >= (threshold - 1e-6)
            ia, ib = ia[keep], ib[keep]
            if len(ia) == 0:
                return empty
            va, vb = mat[ia], mat[ib]
            acc = np.zeros(len(ia))
            nsa = np.zeros(len(ia))
            nsb = np.zeros(len(ia))
            for j in range(mat.shape[1]):
                acc += va[:, j] * vb[:, j]
                nsa += va[:, j] * va[:, j]
                nsb += vb[:, j] * vb[:, j]
            cos = acc / (np.sqrt(nsa) * np.sqrt(nsb))
            fin = cos >= (threshold - 5.1e-7)
            return pd.DataFrame(
                {
                    "id_a": ids[ia[fin]],
                    "id_b": ids[ib[fin]],
                    "cos_raw": cos[fin],
                }
            )

        survivors = banded_v.groupBy("tbl", "bucket").applyInPandas(
            _bucket_pairs, "id_a long, id_b long, cos_raw double"
        )
        return (
            survivors.select(
                "id_a",
                "id_b",
                F.round(F.col("cos_raw"), 6).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
            .distinct()
        )

    banded = (
        _ensure_parallelism(embeddings)
        .select(
            F.col(id_col).alias("doc_id"),
            buckets_udf(F.col(vec_col)).alias("bk"),
        )
        .select(
            "doc_id", F.posexplode("bk").alias("tbl", "bucket")
        )
    )

    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )

    # pair_join: dedup the narrow id pairs FIRST (16-byte rows), then
    # re-join the vectors just for unique candidates. Per-side norms
    # are computed ONCE over N rows; the per-pair verification is a
    # single unrolled codegen'd dot. cos = dot/(norm_a*norm_b) is
    # bit-identical to the full per-pair cosine (same fold order).
    va = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.expr(_norm_sql_name(vec_col, dim)).alias("norm_a"),
    )
    vb = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.expr(_norm_sql_name(vec_col, dim)).alias("norm_b"),
    )
    verified = (
        cand.distinct()
        .join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr(
                f"ROUND({_dot_sql_names('va', 'vb', dim)}"
                " / (norm_a * norm_b), 6)"
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    return verified


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine-similarity near-duplicate pairs (id_a < id_b)."""
    if dim is None:
        first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(first["d"]) if first is not None else None
    norm_expr = (
        F.expr(_norm_sql_name(vec_col, dim))
        if dim is not None
        else _norm(F.col(vec_col))
    )
    a = _ensure_parallelism(embeddings).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm_expr.alias("norm_a"),
    ).alias("a")
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm_expr.alias("norm_b"),
    ).alias("b")
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = (
        F.expr(_dot_sql_names("va", "vb", dim))
        if dim is not None
        else _dot(F.col("va"), F.col("vb"))
    ) / (F.col("norm_a") * F.col("norm_b"))
    return pairs.select(
        "id_a", "id_b", F.round(sim, 6).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


# ── scalar-quantized (int8) ANN ──────────────────────────────────────


def sq8_params(
    embeddings: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> list[tuple[float, float]]:
    """Per-dimension (min, scale) for 8-bit scalar quantization, from
    ONE exact min/max aggregate pass (128 doubles to the driver --
    the same driver-literal pattern as the k-means centroids).
    scale = (max - min) / 255; a constant dimension gets scale 1.0 so
    every code is 0 and dequantization returns the constant."""
    aggs = []
    for i in range(dim):
        aggs.append(F.expr(f"min(CAST({vec_col}[{i}] AS DOUBLE))"))
        aggs.append(F.expr(f"max(CAST({vec_col}[{i}] AS DOUBLE))"))
    row = embeddings.agg(*aggs).collect()[0]
    out = []
    for i in range(dim):
        lo, hi = float(row[2 * i]), float(row[2 * i + 1])
        scale = (hi - lo) / 255.0 if hi > lo else 1.0
        out.append((lo, scale))
    return out


def _sq8_code_sql(vec_col: str, i: int, lo: float, scale: float) -> str:
    """Engine-portable code expression: floor(v + 0.5) half-up rounding
    (identical in Spark and DuckDB, unlike ROUND's HALF_EVEN vs
    HALF_UP spread), clamped to [0, 255]."""
    return (
        f"least(floor((CAST({vec_col}[{i}] AS DOUBLE) - {lo!r}D)"
        f" / {scale!r}D + 0.5D), 255.0D)"
    )


def sq8_encode(
    embeddings: DataFrame,
    params: list[tuple[float, float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) -- the at-rest form: int8-range codes,
    4x fewer bytes than float32 when persisted (tinyint parquet), so
    the ANN scan reads a quarter of the data. Map-only."""
    codes = ", ".join(
        f"CAST({_sq8_code_sql(vec_col, i, lo, scale)} AS INT)"
        for i, (lo, scale) in enumerate(params)
    )
    return embeddings.select(
        F.col(id_col), F.expr(f"array({codes})").alias("codes")
    )


def sq8_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    overfetch: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    params: list[tuple[float, float]] | None = None,
) -> DataFrame:
    """Two-phase scalar-quantized ANN (the SQ flavor of Faiss's
    IndexScalarQuantizer): screen on the dequantized-dot approximate
    score computed from int8 codes, exact-rescore the top
    ``k * overfetch`` candidates at full precision.

    Output matches ``cosine_topk``: (id, cos_sim, rank) -- cos_sim is
    the EXACT rescored similarity (rounded 6), rank over the final k.

    Scale story at 100 TB: phase 1 reads the 4x-smaller code column
    (``sq8_encode`` persisted) and is a map-only scored scan +
    TakeOrdered (k*overfetch rows per partition to the driver merge,
    no shuffle); phase 2 rescans only the candidate ids' full vectors
    (broadcast semi-join on k*overfetch ids). The approximate score is
    affine in the codes -- sum_i code_i * (scale_i * q_i) + sum_i
    (lo_i * q_i) -- one unrolled integer-weighted dot, same
    whole-stage-codegen shape as the exact path but over a quarter of
    the bytes. Recall is corpus-dependent (quantization error vs
    neighbor gaps); the gate corpus measures recall 1.0 vs exact
    top-10 (pinned by test), and the exact rescore makes precision 1.0
    within the candidate set by construction.

    CAVEAT (norm bias): the screen ranks by approximate DOT product
    while the rescore is COSINE, so on corpora with heterogeneous
    vector norms the screen systematically favors large-norm vectors
    and true cosine neighbors can fall outside the k*overfetch cut —
    a recall loss independent of quantization error. Unit-normalize
    inputs before encoding for cosine ANN, or use the PQ path
    (operators/pq.py), whose ADC screen divides by the code-derived
    reconstruction norm and has no such bias. Determinism: codes use
    floor(v+0.5) half-up (engine-portable), approx score folds
    left-to-right, ties break on id."""
    dim = len(query_vec)
    if params is None:
        params = sq8_params(embeddings, vec_col=vec_col, dim=dim)
    # approx = sum_i code_i * (scale_i * q_i) + offset
    terms = []
    offset = 0.0
    for i, (lo, scale) in enumerate(params):
        w = scale * float(query_vec[i])
        terms.append(f"({_sq8_code_sql(vec_col, i, lo, scale)} * {w!r}D)")
        offset += lo * float(query_vec[i])
    approx_sql = "(" + " + ".join(terms) + f" + {offset!r}D)"
    cand = (
        embeddings.select(F.col(id_col), F.expr(approx_sql).alias("__approx"))
        .orderBy(F.desc("__approx"), F.asc(id_col))
        .limit(k * overfetch)
        .select(id_col)
    )
    qnorm = _fold_norm(query_vec)
    score_sql = (
        f"ROUND({_dot_q_sql(vec_col, query_vec, dim)} / "
        f"({_norm_sql_name(vec_col, dim)} * {qnorm!r}D), 6)"
    )
    order = [F.desc("cos_sim"), F.asc(id_col)]
    rescored = (
        embeddings.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), F.expr(score_sql).alias("cos_sim"))
        .orderBy(*order)
        .limit(k)
    )
    return rescored.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )


def sq8_topk_indexed(
    codes: DataFrame,
    embeddings: DataFrame,
    query_vec: list[float],
    params: list[tuple[float, float]],
    k: int = 10,
    overfetch: int = 4,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
) -> DataFrame:
    """The at-rest form of :func:`sq8_topk`: the screen scans a
    PERSISTED ``sq8_encode`` codes table instead of re-quantizing the
    float column — this is where the scan saving actually lives
    (byte-range ints dictionary/ZSTD-compress far below float32;
    measured in SCALE.md r7), while :func:`sq8_topk` pays the float
    scan twice. The approximate score is the identical affine fold
    over the identical code values (same term order, same literals),
    so results are bit-for-bit the same as the inline path — one
    algorithm, two storage layouts (the ivf_knn / ivf_knn_indexed
    pattern). The dot-screen norm-bias caveat on :func:`sq8_topk`
    applies here too: unit-normalize inputs for cosine ANN, or use
    the norm-corrected PQ screen (operators/pq.py)."""
    dim = len(query_vec)
    terms = []
    offset = 0.0
    for i, (lo, scale) in enumerate(params):
        w = scale * float(query_vec[i])
        terms.append(f"(CAST({codes_col}[{i}] AS DOUBLE) * {w!r}D)")
        offset += lo * float(query_vec[i])
    approx_sql = "(" + " + ".join(terms) + f" + {offset!r}D)"
    cand = (
        codes.select(F.col(id_col), F.expr(approx_sql).alias("__approx"))
        .orderBy(F.desc("__approx"), F.asc(id_col))
        .limit(k * overfetch)
        .select(id_col)
    )
    qnorm = _fold_norm(query_vec)
    score_sql = (
        f"ROUND({_dot_q_sql(vec_col, query_vec, dim)} / "
        f"({_norm_sql_name(vec_col, dim)} * {qnorm!r}D), 6)"
    )
    order = [F.desc("cos_sim"), F.asc(id_col)]
    rescored = (
        embeddings.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), F.expr(score_sql).alias("cos_sim"))
        .orderBy(*order)
        .limit(k)
    )
    return rescored.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )
