"""Product-quantization (PQ) ANN over an embedding column.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split each dim-``D`` vector into ``m``
contiguous subvectors of ``D/m`` dims, k-means each subspace to
``ksub`` centroids, and store only the per-subspace centroid ids —
``m`` small ints per vector.  At ``m=8`` over float32 dim-64 input
that is 8 bytes vs 256: ~32× smaller at rest (vs SQ8's 4×), the
standard billion-scale at-rest ANN format.  Queries screen with
Asymmetric Distance Computation (ADC): a per-query lookup table of
``m × ksub`` centroid·query partial dots, so the approximate score of
a vector is ``m`` table lookups — no float vector is touched until
the exact rescore of the top ``k·overfetch`` candidates.

Execution shape, built for the 100 TB corpus:

- **Training** is Lloyd's over all ``m`` subspaces JOINTLY: one
  map-only pass computes every subspace's argmin against driver-held
  literal centroids (the k-means centroid-literal pattern,
  ``operators/kmeans.py``), and ONE ``posexplode`` shuffle per
  iteration updates all ``m × ksub × dsub`` centroid components —
  not ``m`` separate k-means jobs.
- **Encoding** is map-only: the argmin expressions fold into one
  whole-stage-codegen projection; codes persist as ``array<int>``
  (``build_pq_index``) and dictionary/ZSTD-compress far below the
  float column.
- **Query** reads only the codes relation for the screen (ADC via
  ``element_at`` on ``m`` literal lookup arrays), TakeOrdered cuts
  ``k·overfetch`` ids per partition, and the rescore joins the float
  vectors for those ids only (broadcast semi-join).
- **Constant tables dispatch on size** (round 11): anchor/LUT tables
  inline as constant-folded literals in the small regimes and switch
  to broadcast-joined relations past ``_ANCHOR_LITERAL_MAX_CELLS`` /
  ``_SCREEN_LITERAL_MAX_PROBE`` — bit-identical arithmetic, plan text
  O(1) in cell/probe count (the literal screen measurably breaks
  Janino's 64 KB method limit and OOMs a default-heap driver at 300
  branches).  ``ivfpq_topk_batch`` extends the joined-LUT design per
  query: Q queries in ONE pruned pass, 4.6-6.9× the solo walls at 5M
  (SCALE.md r11).

Screen score: unlike the SQ8 screen (raw dequantized dot — biased
toward large-norm vectors when rescoring by cosine), the PQ screen is
a norm-corrected approximate COSINE: the reconstruction's squared
norm is itself a code lookup (``Σ_j ‖c_{j,code_j}‖²`` — subspace
cross-terms vanish because reconstructions are blockwise), so

    approx_cos(v) = Σ_j lut_dot[j][code_j]
                    / (sqrt(Σ_j lut_norm2[j][code_j]) · ‖q‖)

costs the same ``m`` lookups and removes the norm bias.

Determinism contract (what the differential gate replays):

- centroid init per subspace = the ``ksub`` DISTINCT subvectors with
  the smallest ids (duplicate-safe, no sampling);
- squared-L2 assignment distances are fixed left-to-right folds,
  ROUNDed to 6 before the argmin; ties break on the lowest code;
- centroid updates (averages) are ROUNDed to 6, so both engines
  iterate from identical doubles; ``iters`` is pinned ≤ 2 for the
  same empty-cluster-semantics reason as ``_kmeans_ctes``;
- ADC lookup values are folded left-to-right driver-side with the
  same op order as the oracle's SQL folds (bit-identical doubles);
  the approximate cosine is ROUNDed to 6 before the candidate cut and
  ties break on id.

Reference behavioral parity: the reference engine exposes only exact
scans (`src/webapp/query_service.py`); PQ extends the repo's ANN
ladder (brute → LSH → IVF → SQ8 → PQ) for the training-data pipeline
suite.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kmeans import _dlit


def _fold_dot_py(a: list[float], b: list[float]) -> float:
    """Left-to-right Python fold, same op order as the SQL unrolls."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _sub_dist_sql(vec_col: str, centroid: list[float], j: int, dsub: int) -> str:
    """Unrolled squared-L2 of subspace ``j``'s slice against a literal
    centroid: left-to-right fold over the dsub dims, ROUND 6 (the
    argmin then compares identical doubles on both engines)."""
    base = j * dsub
    terms = [
        f"(CAST({vec_col}[{base + t}] AS DOUBLE) - ({_dlit(centroid[t])}))"
        f" * (CAST({vec_col}[{base + t}] AS DOUBLE) - ({_dlit(centroid[t])}))"
        for t in range(dsub)
    ]
    return f"ROUND({' + '.join(terms)}, 6)"


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    oracle_parity: bool = True,
) -> list[list[list[float]]]:
    """Train the ``m`` subspace codebooks; returns
    ``codebooks[j][c] = dsub-vector`` (rounded doubles after the last
    update; iteration-0 centroids are raw data values).

    One init shuffle (per-subspace distinct subvectors, smallest-id
    wins), then per iteration: one map-only assign pass + one
    ``posexplode`` shuffle whose rows are (subspace, code, dim,
    partial-sum) — ``m·ksub·dsub`` rounded doubles back to the driver
    (8·16·8 = 1k for the defaults: bounded, like the k-means and IVF
    trainers).

    ``oracle_parity=True`` (the gate mode) pins ``iters <= 2``: the
    DuckDB relational replay drops empty clusters while this trainer
    keeps the stale centroid, and the two are provably identical only
    through iteration 2.  ``oracle_parity=False`` is the PRODUCTION
    mode — any ``iters >= 1`` — with
    determinism fully kept: min-id-ordered init, ROUND(avg, 6)
    updates each round (so the engine's float fold order cannot
    drift the codebook), and the empty-cluster rule unchanged (a code
    that captures no vectors KEEPS its previous centroid — the stale-
    centroid rule, stated here because the oracle cannot replay it
    past iter 2).  Per-iteration cluster cost is identical in either
    mode; only the cap differs.

    How many iterations?  Both corpus classes are now measured
    (SCALE.md r9 + r10, 5M × dim-64, 8-query mean) and the answer is
    that **iterations are never the recall lever**:

    - uniform/structureless (r9): MSE improves monotonically with
      iters while screen recall monotonically DROPS (0.475 → 0.263
      recall@10 at overfetch 16 going 2 → 20 iters) — MSE-optimal
      codebooks are not ranking-optimal; OVERFETCH is the lever.
    - clustered (r10, 64 and 16 centers): recall is pinned at 0.1 at
      EVERY training depth, even when Lloyd captures the centers
      perfectly (16 centers: MSE 0.0133, converged after one update).
      Whole clusters share one code, so the screen cannot rank inside
      the cluster where every true neighbor lives — the lever is the
      ENCODING: ``build_ivfpq_index(residual=True)`` quantizes
      within-cluster offsets instead (measured per-cluster code
      diversity 62/62 vs 7 median in tests/test_pq.py).

    The iters=2 default is therefore empirically defensible on both
    corpus classes; there is no measured regime where buying more
    Lloyd rounds buys recall."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if oracle_parity and iters > 2:
        raise ValueError(
            "oracle_parity=True pins 1 <= iters <= 2 (the relational "
            "replay drops empty clusters, the operator keeps stale "
            "centroids; provably identical only through iter 2). "
            "Pass oracle_parity=False for production training."
        )
    dsub = dim // m
    vec = F.col(vec_col)
    # init: for every subspace, the ksub DISTINCT subvectors with the
    # smallest ids — ONE query over an exploded (subspace, subvector)
    # relation instead of m separate scans
    sub_slices = F.array(*[F.slice(vec, j * dsub + 1, dsub) for j in range(m)])
    init_rows = (
        embeddings.select(
            F.col(id_col).alias("__id"),
            F.posexplode(sub_slices).alias("__j", "__sv"),
        )
        .groupBy("__j", "__sv")
        .agg(F.min("__id").alias("__minid"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__j").orderBy("__minid")
            ),
        )
        .filter(F.col("__rn") <= ksub)
        .collect()
    )
    codebooks: list[list[list[float] | None]] = [
        [None] * ksub for _ in range(m)
    ]
    counts = [0] * m
    for r in init_rows:
        codebooks[r["__j"]][r["__rn"] - 1] = [float(x) for x in r["__sv"]]
        counts[r["__j"]] += 1
    short = [j for j, c in enumerate(counts) if c < ksub]
    if short:
        raise ValueError(
            f"subspaces {short} have fewer than ksub={ksub} distinct "
            "subvectors; lower ksub"
        )

    for it in range(iters - 1):
        # update all m subspaces in ONE shuffle: explode vector
        # positions, derive (subspace, code, in-subspace dim), average
        upd = (
            _with_codes(
                embeddings, codebooks, dsub, keep=[vec_col], vec_col=vec_col
            )
            .select(
                F.posexplode(F.col(vec_col)).alias("__i", "__x"),
                F.array(*[F.col(f"__code{j}") for j in range(m)]).alias("__cs"),
            )
            .select(
                (F.col("__i") / dsub).cast("int").alias("__j"),
                F.element_at(
                    "__cs", ((F.col("__i") / dsub).cast("int") + 1)
                ).alias("__c"),
                (F.col("__i") % dsub).alias("__t"),
                F.col("__x").cast("double").alias("__x"),
            )
            .groupBy("__j", "__c", "__t")
            .agg(F.round(F.avg("__x"), 6).alias("__v"))
            .collect()
        )
        new: dict[tuple[int, int], dict[int, float]] = {}
        for r in upd:
            new.setdefault((r["__j"], r["__c"]), {})[r["__t"]] = r["__v"]
        codebooks = [
            [
                [new[(j, c)][t] for t in range(dsub)]
                if (j, c) in new
                else codebooks[j][c]
                for c in range(ksub)
            ]
            for j in range(m)
        ]
    return codebooks  # type: ignore[return-value]


def _with_codes(
    df: DataFrame,
    codebooks,
    dsub: int,
    keep: list[str],
    vec_col: str = "embedding",
) -> DataFrame:
    """``keep`` columns + one ``__code{j}`` INT column per subspace.

    Three STAGED projections (dists → argmin-as-attribute-compares),
    mirroring ``kmeans_fit_assign``: naming the m·ksub distance
    expressions keeps every later reference an attribute, so the plan
    stays ~m·ksub·dsub nodes.  A single-expression argmin (``least``
    re-inlined inside each ``when`` branch) squares that to a tree
    whole-stage codegen cannot compile at m=8/ksub=16 (observed
    driver-heap OOM — the ``_dot_lit`` failure mode)."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    d_cols = [
        F.expr(_sub_dist_sql(vec_col, c, j, dsub)).alias(f"__d{j}_{ci}")
        for j, cents in enumerate(codebooks)
        for ci, c in enumerate(cents)
    ]
    s1 = df.select(*keep, *d_cols)
    mn_cols = [
        (
            F.least(*[F.col(f"__d{j}_{c}") for c in range(ksub)])
            if ksub > 1
            else F.col(f"__d{j}_0")
        ).alias(f"__mn{j}")
        for j in range(m)
    ]
    s2 = s1.select("*", *mn_cols)
    codes = []
    for j in range(m):
        code = F.lit(None).cast("int")
        for c in reversed(range(ksub)):
            code = F.when(
                F.col(f"__d{j}_{c}") == F.col(f"__mn{j}"), c
            ).otherwise(code)
        codes.append(code.alias(f"__code{j}"))
    return s2.select(*keep, *codes)


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> length m) — the at-rest form: ~32× fewer
    bytes than float32 at m=8/ksub≤256 when persisted.  Map-only."""
    dsub = len(codebooks[0][0])
    m = len(codebooks)
    coded = _with_codes(
        embeddings, codebooks, dsub, keep=[id_col], vec_col=vec_col
    )
    return coded.select(
        F.col(id_col),
        F.array(*[F.col(f"__code{j}") for j in range(m)]).alias("codes"),
    )


def _adc_luts(
    codebooks: list[list[list[float]]], query_vec: list[float]
) -> tuple[list[list[float]], list[list[float]]]:
    """Per-subspace ADC lookup tables: lut_dot[j][c] = c_{j,c}·q_j and
    lut_norm2[j][c] = ‖c_{j,c}‖², folded left-to-right (bit-identical
    to the oracle's SQL folds over the same rounded centroids)."""
    dsub = len(codebooks[0][0])
    lut_dot, lut_norm2 = [], []
    for j, cents in enumerate(codebooks):
        qsub = [float(x) for x in query_vec[j * dsub : (j + 1) * dsub]]
        lut_dot.append([_fold_dot_py(c, qsub) for c in cents])
        lut_norm2.append([_fold_dot_py(c, c) for c in cents])
    return lut_dot, lut_norm2


def _approx_cos_sql(
    codes_col: str,
    lut_dot: list[list[float]],
    lut_norm2: list[list[float]],
    qnorm: float,
) -> str:
    """ADC approximate cosine over a codes array column: m literal-array
    lookups for the dot, m for the reconstruction norm², explicit
    left-to-right sums, ROUND 6 before the candidate cut."""
    m = len(lut_dot)

    def arr(vals: list[float]) -> str:
        return "array(" + ", ".join(_dlit(v) for v in vals) + ")"

    dot = " + ".join(
        f"element_at({arr(lut_dot[j])}, {codes_col}[{j}] + 1)"
        for j in range(m)
    )
    n2 = " + ".join(
        f"element_at({arr(lut_norm2[j])}, {codes_col}[{j}] + 1)"
        for j in range(m)
    )
    return f"ROUND(({dot}) / (SQRT({n2}) * {_dlit(qnorm)}), 6)"


def pq_topk_indexed(
    codes: DataFrame,
    embeddings: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    overfetch: int = 8,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-phase PQ ANN over a persisted codes relation: ADC screen on
    the approximate cosine (norm-corrected — see module doc), exact
    cosine rescore of the top ``k·overfetch`` ids, final top-k.
    Output matches ``cosine_topk``: (id, cos_sim, rank) with cos_sim
    the EXACT rescored similarity (rounded 6)."""
    from .similarity import _dot_q_sql, _fold_norm, _norm_sql_name

    dim = len(query_vec)
    qnorm = _fold_norm(query_vec)
    lut_dot, lut_norm2 = _adc_luts(codebooks, query_vec)
    approx = _approx_cos_sql(codes_col, lut_dot, lut_norm2, qnorm)
    cand = (
        codes.select(F.col(id_col), F.expr(approx).alias("__approx"))
        .orderBy(F.desc("__approx"), F.asc(id_col))
        .limit(k * overfetch)
        .select(id_col)
    )
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


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    overfetch: int = 8,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Inline PQ ANN: train (unless ``codebooks`` given), encode on the
    fly, ADC screen, exact rescore.  Identical code values and folds
    as the at-rest path, so results are bit-for-bit the same as
    ``pq_topk_indexed`` over ``pq_encode`` output — one algorithm, two
    storage layouts (the ivf/sq8 pattern)."""
    dim = len(query_vec)
    if codebooks is None:
        codebooks = pq_train(
            embeddings, m=m, ksub=ksub, iters=iters,
            id_col=id_col, vec_col=vec_col, dim=dim,
        )
    codes = pq_encode(embeddings, codebooks, id_col=id_col, vec_col=vec_col)
    return pq_topk_indexed(
        codes, embeddings, query_vec, codebooks,
        k=k, overfetch=overfetch, id_col=id_col, vec_col=vec_col,
    )


def build_pq_index(
    embeddings: DataFrame,
    out_dir: str,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[list[float]]]:
    """Persist the at-rest PQ index: ``codes/`` parquet (id +
    array<int> codes — ZSTD/dictionary compresses ~32× below the
    float column) and ``codebooks.json`` (m·ksub·dsub rounded doubles,
    a few KB).  Returns the codebooks.  ``load_pq_index`` restores
    both for query service."""
    codebooks = pq_train(
        embeddings, m=m, ksub=ksub, iters=iters,
        id_col=id_col, vec_col=vec_col, dim=dim,
    )
    codes = pq_encode(embeddings, codebooks, id_col=id_col, vec_col=vec_col)
    codes.write.mode("overwrite").parquet(os.path.join(out_dir, "codes"))
    meta = {
        "m": m,
        "ksub": ksub,
        "dim": dim,
        "iters": iters,
        "id_col": id_col,
        "codebooks": codebooks,
    }
    tmp = os.path.join(out_dir, "codebooks.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "codebooks.json"))
    return codebooks


def load_pq_index(spark, out_dir: str):
    """(codes DataFrame, codebooks, meta) from ``build_pq_index``."""
    with open(os.path.join(out_dir, "codebooks.json")) as f:
        meta = json.load(f)
    codes = spark.read.parquet(os.path.join(out_dir, "codes"))
    return codes, meta["codebooks"], meta


def pq_reconstruction_mse(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error over the corpus — the
    standard PQ quality diagnostic (one aggregate; the per-row error
    reuses the assignment distances, which for blockwise PQ sum to the
    full squared reconstruction error)."""
    dsub = len(codebooks[0][0])
    m = len(codebooks)
    ksub = len(codebooks[0])
    d_cols = [
        F.expr(_sub_dist_sql(vec_col, c, j, dsub)).alias(f"__d{j}_{ci}")
        for j, cents in enumerate(codebooks)
        for ci, c in enumerate(cents)
    ]
    s1 = embeddings.select(*d_cols)
    err = None
    for j in range(m):
        mn = (
            F.least(*[F.col(f"__d{j}_{c}") for c in range(ksub)])
            if ksub > 1
            else F.col(f"__d{j}_0")
        )
        err = mn if err is None else err + mn
    row = (
        s1.select((err / F.lit(float(m * dsub))).alias("e"))
        .agg(F.avg("e").alias("mse"))
        .collect()[0]
    )
    return float(row["mse"])


# ── IVF-PQ: coarse-cell pruning × PQ codes (the billion-scale layout) ─

# Cell counts at or below this inline the residual anchor table as
# literal SQL (constant-folded once; ≤ ~300 KB of text at dim 64).
# Above it the encode broadcast-joins a tiny anchors DataFrame instead:
# at 100-TB-realistic coarse counts (n_cells ~ √N — tens of thousands
# of cells for 10⁹+ vectors) the literal would be tens of MB of SQL
# whose Catalyst parse/analysis cost grows with it, while the join
# keeps plan size flat and the broadcast stays n_cells·dim doubles.
# Arithmetic is bit-identical either way (pinned by tests/test_pq.py).
_ANCHOR_LITERAL_MAX_CELLS = 256

# ``coarse="auto"`` builds switch from flat to two-level coarse
# quantization above this cell count: below it the flat
# O(n_cells·dim) training/assignment terms are cheap; above it they
# grow toward the measured 854 s wall at 4096 cells / 5M vectors
# (SCALE.md r11) and the hierarchical O(√n_cells·dim) path wins.
_TWO_LEVEL_MIN_CELLS = 1024


def _assign_index_cells(df, meta: dict, cent, vec_col: str):
    """Assign ``ivf_cell`` with an EXISTING index's frozen coarse
    quantizer, reproducing the build's assignment exactly — flat
    argmax or the two-level argmax pair, per the index's recorded
    ``coarse`` structure.  Every frozen-quantizer path
    (:func:`ivfpq_add`, :func:`ivfpq_drift_stats`) must route through
    this: assigning a two-level index's batch with the flat rule
    would silently place rows in different leaves than the build."""
    from .similarity import assign_ivf_cells

    if meta.get("coarse") == "two_level":
        return assign_ivf_cells(
            df, cent, vec_col,
            l1_centroids=meta["l1_centroids"],
            branch_k2=meta["branch_k2"],
        )  # fmt: skip
    return assign_ivf_cells(df, cent, vec_col)


def _cents_arr_sql(cent: list[list[float]]) -> str:
    """Literal array-of-arrays of the coarse centroids (n_cells × dim
    rounded doubles — a few KB of SQL text; constant-folded once)."""
    return (
        "array("
        + ", ".join(
            "array(" + ", ".join(_dlit(float(x)) for x in c) + ")"
            for c in cent
        )
        + ")"
    )


def _residual_sql(vec_col: str, anchors: list[list[float]]) -> str:
    """Residual array r = x − anchor(ivf_cell) as one ``zip_with``
    over the literal anchor table — a pure map expression, no join.
    The anchor is the CELL MEAN, not the spherical-kmeans direction:
    cell assignment is by cosine against UNIT centroids, but data
    vectors have norm ≫ 1, so x − c_unit ≈ x and the residuals would
    degenerate back to the raw vectors (measured: 1 distinct code per
    2000-vector cluster before this anchor).  Exact double arithmetic
    (float→double cast is exact; the anchor literals are the same
    rounded doubles on any engine), so encode at build, encode at
    ``ivfpq_add``, and an oracle replay all see bit-identical
    residuals."""
    return (
        f"zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), "
        f"element_at({_cents_arr_sql(anchors)}, ivf_cell + 1), "
        "(a, b) -> a - b)"
    )


def _with_residual(
    assigned: DataFrame, anchors: list[list[float]], vec_col: str,
    out_col: str,
) -> DataFrame:
    """``assigned`` + ``out_col`` = x − anchor(ivf_cell), dispatched on
    cell count.  At ≤ ``_ANCHOR_LITERAL_MAX_CELLS`` the anchor table
    inlines as a literal (:func:`_residual_sql` — a pure map
    expression, no join); above it a tiny (ivf_cell, anchor) DataFrame
    is broadcast-joined instead, so the plan's SQL text stays O(1) in
    n_cells while the broadcast carries the same n_cells·dim rounded
    doubles.  The subtraction is the same ``zip_with`` over the same
    doubles in both paths (Python floats land in the DataFrame as
    exact IEEE doubles, as the `_dlit` literals do), so the residuals
    — and therefore the codes — are bit-identical; tests/test_pq.py
    pins the equality."""
    if len(anchors) <= _ANCHOR_LITERAL_MAX_CELLS:
        return assigned.withColumn(
            out_col, F.expr(_residual_sql(vec_col, anchors))
        )
    adf = assigned.sparkSession.createDataFrame(
        [(int(c), [float(x) for x in a]) for c, a in enumerate(anchors)],
        "ivf_cell INT, __anchor ARRAY<DOUBLE>",
    )
    return (
        assigned.join(F.broadcast(adf), "ivf_cell")
        .withColumn(
            out_col,
            F.expr(
                f"zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), __anchor, "
                "(a, b) -> a - b)"
            ),
        )
        .drop("__anchor")
    )


def _cell_anchors(
    assigned: DataFrame, vec_col: str, n_cells: int
) -> list[list[float]]:
    """Per-cell mean vector (the residual anchor): ONE bounded
    posexplode shuffle → n_cells × dim rounded doubles back to the
    driver.  Cells with no members anchor at the zero vector (no rows
    will ever encode against them)."""
    dim_rows = (
        assigned.select(
            "ivf_cell",
            F.posexplode(F.expr(f"CAST({vec_col} AS ARRAY<DOUBLE>)")).alias(
                "__i", "__x"
            ),
        )
        .groupBy("ivf_cell", "__i")
        .agg(F.round(F.avg("__x"), 6).alias("__v"))
        .collect()
    )
    dim = 1 + max(r["__i"] for r in dim_rows)
    anchors = [[0.0] * dim for _ in range(n_cells)]
    for r in dim_rows:
        anchors[r["ivf_cell"]][r["__i"]] = float(r["__v"])
    return anchors


def _approx_cos_sql_residual(
    codes_col: str,
    cell_col: str,
    probe: list[int],
    anchors: list[list[float]],
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    qnorm: float,
    cell_luts: list[tuple[float, list[list[float]]]] | None = None,
) -> str:
    """ADC approximate cosine for RESIDUAL codes, x = a + recon(r)
    with ``a`` the cell's mean-vector anchor:

        dot    = a·q + Σ_j lut_dot[j][code_j]
        norm²  = ‖a‖² + 2·Σ_j lut_cross_a[j][code_j]
                      + Σ_j lut_norm2[j][code_j]

    where ``lut_dot`` / ``lut_norm2`` are the global residual-codeword
    tables and ``lut_cross_a[j][k] = a_subj · codeword_{j,k}`` is a
    PER-CELL table (the cross term of ‖a + recon‖²; subspace
    cross-terms vanish blockwise as in the global variant).  The
    expression is a CASE over the PROBED cells only — n_probe branches
    of 3·m lookups + 2 per-cell constants, all folded left-to-right
    and ROUNDed 6 before the cut (same determinism contract as
    :func:`_approx_cos_sql`).  Used up to
    ``_SCREEN_LITERAL_MAX_PROBE`` probes; past that the callers switch
    to :func:`_residual_screen_joined` (bit-identical scores, plan
    text O(1) in n_probe)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut_dot, lut_norm2 = _adc_luts(codebooks, query_vec)

    def arr(vals: list[float]) -> str:
        return "array(" + ", ".join(_dlit(v) for v in vals) + ")"

    dot_lu = " + ".join(
        f"element_at({arr(lut_dot[j])}, {codes_col}[{j}] + 1)"
        for j in range(m)
    )
    n2_lu = " + ".join(
        f"element_at({arr(lut_norm2[j])}, {codes_col}[{j}] + 1)"
        for j in range(m)
    )
    branches = []
    qd = [float(x) for x in query_vec]
    for c in probe:
        cvec = [float(x) for x in anchors[c]]
        cq = _fold_dot_py(cvec, qd)
        if cell_luts is not None:
            c2, lut_cross = cell_luts[c]
        else:
            c2 = _fold_dot_py(cvec, cvec)
            lut_cross = [
                [
                    _fold_dot_py(cvec[j * dsub : (j + 1) * dsub], cw)
                    for cw in codebooks[j]
                ]
                for j in range(m)
            ]
        cross_lu = " + ".join(
            f"element_at({arr(lut_cross[j])}, {codes_col}[{j}] + 1)"
            for j in range(m)
        )
        score = (
            f"({_dlit(cq)} + {dot_lu}) / "
            f"(SQRT({_dlit(c2)} + 2.0D * ({cross_lu}) + {n2_lu}) "
            f"* {_dlit(qnorm)})"
        )
        branches.append(f"WHEN {cell_col} = {c} THEN ROUND({score}, 6)")
    return "CASE " + " ".join(branches) + " END"


# Probe counts at or below this inline the per-cell LUTs as a literal
# CASE (n_probe branches of 3·m lookups — cheap to analyze and fully
# constant-folded).  Above it the literal expression grows
# O(n_probe·m·ksub) — at the full-probe/large-cell regimes it is MBs
# of SQL whose generated Java breaks Janino's 64 KB method limit and
# whose compile alone can exhaust a default-sized driver heap — so the
# screen switches to a broadcast-joined per-cell LUT relation instead
# (same folded doubles, bit-identical scores; pinned in
# tests/test_pq.py).
_SCREEN_LITERAL_MAX_PROBE = 64


def _residual_screen_joined(
    codes: DataFrame,
    probe: list[int],
    anchors: list[list[float]],
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    qnorm: float,
    id_col: str,
    codes_col: str = "codes",
    cell_col: str = "ivf_cell",
    cell_luts: list[tuple[float, list[list[float]]]] | None = None,
) -> DataFrame:
    """The large-``n_probe`` twin of :func:`_approx_cos_sql_residual`:
    per-cell constants (a·q, ‖a‖²) and the per-cell cross-term LUT
    ride a tiny broadcast relation joined on the cell id, so the plan
    text is O(m·ksub) regardless of probe count.  Every value is the
    SAME left-to-right-folded rounded double the literal path inlines
    (``_dlit`` literals repr-round-trip exactly; Python floats land in
    a DataFrame as the same IEEE doubles), and the score expression
    applies them in the same order — scores are bit-identical to the
    CASE screen.  Returns (id, __approx)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut_dot, lut_norm2 = _adc_luts(codebooks, query_vec)
    qd = [float(x) for x in query_vec]
    rows = []
    for c in probe:
        cvec = [float(x) for x in anchors[c]]
        if cell_luts is not None:
            c2, lut_cross = cell_luts[c]
        else:
            c2 = _fold_dot_py(cvec, cvec)
            lut_cross = [
                [
                    _fold_dot_py(cvec[j * dsub : (j + 1) * dsub], cw)
                    for cw in codebooks[j]
                ]
                for j in range(m)
            ]
        rows.append((
            int(c),
            _fold_dot_py(cvec, qd),
            c2,
            lut_cross,
        ))  # fmt: skip
    lut_df = codes.sparkSession.createDataFrame(
        rows,
        f"{cell_col} INT, __cq DOUBLE, __c2 DOUBLE, "
        "__lx ARRAY<ARRAY<DOUBLE>>",
    )

    def arr(vals: list[float]) -> str:
        return "array(" + ", ".join(_dlit(v) for v in vals) + ")"

    dot_lu = " + ".join(
        f"element_at({arr(lut_dot[j])}, {codes_col}[{j}] + 1)"
        for j in range(m)
    )
    n2_lu = " + ".join(
        f"element_at({arr(lut_norm2[j])}, {codes_col}[{j}] + 1)"
        for j in range(m)
    )
    cross_lu = " + ".join(
        f"element_at(element_at(__lx, {j + 1}), {codes_col}[{j}] + 1)"
        for j in range(m)
    )
    score = (
        f"ROUND((__cq + {dot_lu}) / "
        f"(SQRT(__c2 + 2.0D * ({cross_lu}) + {n2_lu}) * {_dlit(qnorm)}), 6)"
    )
    return codes.join(F.broadcast(lut_df), cell_col).select(
        F.col(id_col), F.expr(score).alias("__approx")
    )


def build_ivfpq_index(
    embeddings: DataFrame,
    index_dir: str,
    n_cells: int = 8,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    seed: int = 7,
    sample_cap: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    store_vectors: bool = False,
    residual: bool = False,
    coarse: str = "auto",
    branch: int | None = None,
) -> None:
    """Materialize the canonical billion-scale ANN layout (Jégou et
    al. 2011 §V; what FAISS calls IVFPQ).  ``residual=False`` trains
    GLOBAL codebooks over raw vectors — the variant whose codes are
    reusable across cells.  ``residual=True`` is FAISS's actual
    default: PQ is trained and encoded over r = x − centroid(cell),
    which restores WITHIN-cluster discrimination — SCALE.md's round-10
    probe measured the global variant collapsing to recall 0.1 on a
    5M clustered corpus (every within-cluster vector shares one code;
    the ADC screen cannot rank inside the cluster where all true
    neighbors live, and no amount of Lloyd training fixes it), the
    exact regime residual codebooks exist for.  Encoding stays one map
    stage either way (the residual is a ``zip_with`` against the
    literal centroid table).  The layout:

    - IVF coarse quantizer: seeded spherical k-means on a bounded
      driver-side sample (O(sample) at any corpus size);
    - PQ codebooks: ``pq_train`` (one assign pass + one posexplode
      shuffle per Lloyd iteration);
    - at rest: ``codes/`` parquet of (id, 8 int codes) written
      Hive-partitioned BY CELL (one file per cell via
      ``repartition(ivf_cell)``), ``centroids/`` parquet,
      ``codebooks.json``.

    Query cost at 100 TB: the ADC screen lists and reads ONLY the
    probed cells' directories (partition filter → file pruning) and
    those files hold ~32× fewer bytes than the float column — e.g.
    n_probe/n_cells = 1/2 of 1/32 ≈ 1.6 % of the corpus bytes, then
    an exact rescore of k·overfetch ids.

    Code budget (``m``): the recall-per-byte trade is measured
    (SCALE.md r11, 5M clustered corpus, 256 cells, residual): going
    m=8 → m=16 lifts recall@10 from 0.512/0.712/0.75 to
    0.637/0.837/0.862 across the n_probe×overfetch grid — closing
    ~45 % of the remaining gap — for 1.74× the at-rest code bytes
    (parquet-encoded; raw is 2×) and ~2.2× the build wall.  After
    cells and overfetch saturate, ``m`` is the remaining recall
    lever (Lloyd iterations never are — measured both corpus classes,
    r9/r10).

    Cell budget (``n_cells``): past ``_ANCHOR_LITERAL_MAX_CELLS`` the
    residual encode switches to the broadcast-joined anchors relation
    and the anchors persist in ``anchors/`` parquet instead of inline
    JSON (plan text and meta size stay O(1) in cell count — at
    100-TB-realistic coarse counts, n_cells ~ √N, the literal SQL
    would be tens of MB).  Measured at 5M/4096 cells (SCALE.md r11):
    build 854 s, recall saturates at the 256-cell figure once
    n_probe covers the clusters — MORE cells than clusters buys
    pruning granularity, not recall, on this corpus.

    ``store_vectors=True`` additionally writes ``vectors/`` — the
    (id, float vector) pairs Hive-partitioned by the SAME cell key —
    so the exact-rescore / pool-fetch side of a query is ALSO
    file-pruned to the probed cells instead of scanning the source
    float corpus (the layout :func:`retrieval.mmr_topk_ivfpq` needs
    to be fully sub-scan; FAISS keeps the same cell-major raw-vector
    store when rescoring is enabled).  Costs one extra corpus pass at
    build and duplicates the float bytes cell-major at rest.

    ``coarse`` selects the coarse-quantizer structure: ``"flat"`` is
    single-level k-means (training O(sample·n_cells·dim)/iter, row
    assignment O(n_cells·dim)); ``"two_level"`` is the hierarchical
    quantizer (:func:`similarity.train_ivf_centroids_two_level`,
    FAISS-IMI-style, ``branch`` = level-1 width, default ≈ √n_cells)
    whose training AND per-row assignment cost O(√n_cells·dim) — the
    100-TB path, where n_cells ~ √N makes the flat terms the build
    bottleneck (854 s at just 4096 flat cells / 5M vectors, SCALE.md
    r11).  ``"auto"`` (default) picks two_level past
    ``_TWO_LEVEL_MIN_CELLS`` cells.  Leaf cells index the same flat
    centroid list either way, so the at-rest layout, probing, screens
    and oracles are identical; only per-row assignment becomes
    hierarchical-approximate (a row can land in the leaf of the
    second-best level-1 region — recall vs flat is measured in
    SCALE.md r12).  Note two_level rounds n_cells UP to the k1·k2
    grid."""
    from .similarity import (
        assign_ivf_cells,
        train_ivf_centroids,
        train_ivf_centroids_two_level,
    )

    spark = embeddings.sparkSession
    if coarse not in ("auto", "flat", "two_level"):
        raise ValueError(
            f"coarse must be 'auto', 'flat' or 'two_level', got {coarse!r}"
        )
    if coarse == "auto":
        coarse = "two_level" if n_cells > _TWO_LEVEL_MIN_CELLS else "flat"
    l1_cent = None
    branch_k2: int | None = None
    if coarse == "two_level":
        cent, l1_cent, branch_k2 = train_ivf_centroids_two_level(
            embeddings, n_cells, vec_col, sample_cap=sample_cap,
            seed=seed, branch=branch,
        )  # fmt: skip
    else:
        cent = train_ivf_centroids(
            embeddings, n_cells, vec_col, sample_cap=sample_cap, seed=seed
        )
    dsub = dim // m
    assigned = assign_ivf_cells(
        embeddings, cent, vec_col,
        l1_centroids=l1_cent, branch_k2=branch_k2,
    )  # fmt: skip
    enc_col = vec_col
    anchors: list[list[float]] | None = None
    if residual:
        enc_col = "__res"
        anchors = _cell_anchors(assigned, vec_col, len(cent))
        assigned = _with_residual(assigned, anchors, vec_col, enc_col)
    # non-residual training reads the raw corpus (no need to pay the
    # cell-assign matmul per Lloyd pass); residual training needs the
    # assigned + residual columns
    codebooks = pq_train(
        assigned if residual else embeddings, m=m, ksub=ksub, iters=iters,
        id_col=id_col, vec_col=enc_col, dim=dim,
    )
    if store_vectors:
        # codes/ and vectors/ must hold the SAME rows: persist the
        # assignment so a nondeterministic input lineage cannot diverge
        # between the two writes (ids in one dataset but not the other
        # silently vanish from downstream inner joins)
        assigned = assigned.persist()
    try:
        coded = _with_codes(
            assigned,
            codebooks,
            dsub,
            keep=[id_col, "ivf_cell"],
            vec_col=enc_col,
        ).select(
            F.col(id_col),
            F.col("ivf_cell"),
            F.array(*[F.col(f"__code{j}") for j in range(m)]).alias("codes"),
        )
        (
            coded.repartition(F.col("ivf_cell"))
            .write.mode("overwrite")
            .partitionBy("ivf_cell")
            .parquet(os.path.join(index_dir, "codes"))
        )
        if store_vectors:
            (
                assigned.select(
                    F.col(id_col), F.col("ivf_cell"), F.col(vec_col)
                )
                .repartition(F.col("ivf_cell"))
                .write.mode("overwrite")
                .partitionBy("ivf_cell")
                .parquet(os.path.join(index_dir, "vectors"))
            )
    finally:
        if store_vectors:
            assigned.unpersist()
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cent)],
        "cell INT, centroid ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids")
    )
    # build-time reconstruction MSE: the reference point
    # ivfpq_drift_stats compares incoming batches against (one extra
    # bounded aggregate over the corpus at build time)
    # residual indexes measure MSE over the residuals (what the
    # codebooks actually quantize) — drift batches are scored the same
    build_mse = pq_reconstruction_mse(
        assigned if residual else embeddings,
        codebooks,
        id_col=id_col,
        vec_col=enc_col,
    )
    # large-cell-count residual indexes keep the anchors OUT of the
    # inline JSON (a 4096-cell dim-64 table is ~4 MB of JSON parsed on
    # every meta load) — they live in a tiny anchors/ parquet next to
    # centroids/, read back by load_ivfpq_meta
    anchors_inline = anchors
    if residual and len(cent) > _ANCHOR_LITERAL_MAX_CELLS:
        spark.createDataFrame(
            [(int(c), [float(x) for x in a]) for c, a in enumerate(anchors)],
            "cell INT, anchor ARRAY<DOUBLE>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "anchors")
        )
        anchors_inline = None
    meta = {
        "m": m, "ksub": ksub, "dim": dim, "iters": iters,
        "n_cells": int(len(cent)), "seed": seed, "id_col": id_col,
        "vec_col": vec_col, "store_vectors": bool(store_vectors),
        "residual": bool(residual),
        "anchors": anchors_inline,
        "anchors_dataset": bool(residual and anchors_inline is None),
        "build_mse": build_mse,
        "codebooks": codebooks,
        # hierarchical coarse quantizer: the l1 centers are what the
        # frozen-quantizer paths (ivfpq_add / ivfpq_drift_stats) need
        # to reproduce the build's leaf assignment bit-for-bit; small
        # (k1 ≈ √n_cells rows) so inline JSON is fine at any scale
        "coarse": coarse,
        "branch_k2": branch_k2,
        "l1_centroids": (
            [[float(x) for x in c] for c in l1_cent]
            if l1_cent is not None
            else None
        ),
    }  # fmt: skip
    tmp = os.path.join(index_dir, "codebooks.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "codebooks.json"))


# Per-process quantizer-metadata cache (round-12, guide §1.2: the
# online query path was paying 1-2 Spark collect jobs PER QUERY just
# to re-read immutable index metadata).  Keyed on the realpath plus
# codebooks.json's (mtime_ns, size): builds are the only writers of
# codebooks.json/centroids/anchors — ``ivfpq_add``/``ivfpq_optimize``
# freeze the quantizers by contract — so a rebuild invalidates the
# entry and maintenance operations never stale it.  This caches the
# INDEX (what a serving tier holds in RAM), never query results:
# every query still scans the code/vector files for its answer.
_META_CACHE: dict[str, tuple] = {}


def load_ivfpq_meta(spark, index_dir: str) -> tuple[dict, list[list[float]]]:
    """Read the index's ``codebooks.json`` + the tiny centroid table
    (one driver-side read each, cached per process — see
    ``_META_CACHE``); returns ``(meta, centroids)`` with
    ``centroids[cell]`` the float list for that coarse cell.  Residual
    indexes built past ``_ANCHOR_LITERAL_MAX_CELLS`` store their
    anchors in an ``anchors/`` parquet instead of inline JSON; this
    loader folds them back into ``meta["anchors"]`` so callers never
    see the difference."""
    path = os.path.realpath(index_dir)
    st = os.stat(os.path.join(index_dir, "codebooks.json"))
    key = (st.st_mtime_ns, st.st_size)
    hit = _META_CACHE.get(path)
    if hit is not None and hit[0] == key:
        return hit[1], hit[2]
    with open(os.path.join(index_dir, "codebooks.json")) as f:
        meta = json.load(f)
    rows = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    cent: list[list[float]] = [[] for _ in rows]
    for r in rows:
        cent[r["cell"]] = [float(x) for x in r["centroid"]]
    if meta.get("anchors_dataset") and meta.get("anchors") is None:
        arows = spark.read.parquet(
            os.path.join(index_dir, "anchors")
        ).collect()
        anchors: list[list[float]] = [[] for _ in arows]
        for r in arows:
            anchors[r["cell"]] = [float(x) for x in r["anchor"]]
        meta["anchors"] = anchors
    _META_CACHE[path] = (key, meta, cent)
    return meta, cent


def _residual_cell_luts(meta: dict) -> list[tuple[float, list[list[float]]]]:
    """Query-INDEPENDENT residual screen constants per cell —
    ``(‖a‖², lut_cross)`` with ``lut_cross[j][k] = a_subj ·
    codeword_{j,k}`` — folded once per loaded index and stashed on the
    (cached) meta dict.  Every screen previously re-folded these
    m·ksub dot products per probed cell PER QUERY (the dominant
    driver-side cost of the large-probe paths); the values are the
    identical left-to-right Python folds, just computed once."""
    luts = meta.get("__res_cell_luts")
    if luts is None:
        codebooks = meta["codebooks"]
        m = len(codebooks)
        dsub = len(codebooks[0][0])
        luts = []
        for cvec0 in meta["anchors"]:
            cvec = [float(x) for x in cvec0]
            lut_cross = [
                [
                    _fold_dot_py(cvec[j * dsub : (j + 1) * dsub], cw)
                    for cw in codebooks[j]
                ]
                for j in range(m)
            ]
            luts.append((_fold_dot_py(cvec, cvec), lut_cross))
        meta["__res_cell_luts"] = luts
    return luts


def probe_cells(
    cent: list[list[float]], query_vec: list[float], n_probe: int
) -> list[int]:
    """The ``n_probe`` coarse cells nearest the query by cosine —
    driver-side over the tiny centroid table (n_cells rows)."""
    import numpy as np

    c = np.asarray(cent, dtype="float64")
    q = np.asarray(query_vec, dtype="float64")
    q = q / np.linalg.norm(q)
    return [int(i) for i in np.argsort(-(c @ q))[:n_probe]]


def ivfpq_topk(
    spark,
    index_dir: str,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    overfetch: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN query over a ``build_ivfpq_index`` layout: pick the
    ``n_probe`` cells nearest the query from the tiny centroid table
    driver-side, ADC-screen ONLY those cells' code files (partition
    pruning × 32× smaller bytes), exact-rescore the top
    ``k·overfetch`` ids against the float vectors (broadcast id
    join).  Output matches ``cosine_topk``: (id, cos_sim, rank).

    Recall = cell recall × ADC screen recall; both corpus-dependent.
    The gate corpus measures recall 1.0 at n_probe=4/8 cells,
    overfetch=16 (pinned by tests/test_pq.py); precision within the
    candidate set is 1.0 by exact rescore.  Residual indexes
    (``build_ivfpq_index(residual=True)``) screen with the per-cell
    residual ADC (:func:`_approx_cos_sql_residual`) — same two-phase
    shape, same file pruning, the codes just mean r = x − c."""
    from .similarity import _dot_q_sql, _fold_norm, _norm_sql_name

    meta, cent = load_ivfpq_meta(spark, index_dir)
    codebooks = meta["codebooks"]
    probe = probe_cells(cent, query_vec, n_probe)

    dim = len(query_vec)
    qnorm = _fold_norm(query_vec)
    codes = spark.read.parquet(os.path.join(index_dir, "codes")).filter(
        F.col("ivf_cell").isin(probe)
    )
    if meta.get("residual") and len(probe) > _SCREEN_LITERAL_MAX_PROBE:
        scored = _residual_screen_joined(
            codes, probe, meta["anchors"], codebooks, query_vec, qnorm,
            id_col, cell_luts=_residual_cell_luts(meta),
        )  # fmt: skip
    else:
        if meta.get("residual"):
            approx = _approx_cos_sql_residual(
                "codes", "ivf_cell", probe, meta["anchors"], codebooks,
                query_vec, qnorm, cell_luts=_residual_cell_luts(meta),
            )  # fmt: skip
        else:
            lut_dot, lut_norm2 = _adc_luts(codebooks, query_vec)
            approx = _approx_cos_sql("codes", lut_dot, lut_norm2, qnorm)
        scored = codes.select(F.col(id_col), F.expr(approx).alias("__approx"))
    cand = (
        scored.orderBy(F.desc("__approx"), F.asc(id_col))
        .limit(k * overfetch)
        .select(id_col)
    )
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

def ivfpq_add(
    spark,
    index_dir: str,
    new_embeddings: DataFrame,
    id_col: str | None = None,
    vec_col: str | None = None,
    write_token: str | None = None,
) -> int:
    """Incrementally add vectors to an existing ``build_ivfpq_index``
    layout — the index-maintenance twin of the incremental MinHash
    index (a growing training corpus appends embeddings daily; a full
    index rebuild is O(corpus), this is O(batch)).

    Cells are assigned and codes computed with the index's FROZEN
    coarse centroids and codebooks (the FAISS ``IVF.add`` contract):
    a pure map stage over the new batch (one Arrow-batched matmul for
    the cell + the staged argmin projections for the codes), then one
    per-cell repartition and an APPEND to ``codes/`` (and ``vectors/``
    when the index stores them) — one new file per touched cell per
    batch, nothing at rest is rewritten.  ``ivfpq_topk`` /
    ``retrieval.mmr_topk_ivfpq`` see the new vectors on their next
    query with no reload step (the directory listing IS the index).

    The standard trade: no retraining means cells and codebooks drift
    as the data distribution shifts — recall on the NEW data is only
    as good as the old quantizers' fit.  Monitor with
    :func:`ivfpq_drift_stats` and rebuild when it degrades; repeated
    adds accrete one file per touched cell per batch — compact with
    :func:`ivfpq_optimize`.  Determinism: same frozen-parameter encode
    as the build, so add-then-query equals
    build-everything-with-these-quantizers-then-query bit-for-bit.

    ``id_col``/``vec_col`` name the BATCH's source columns when they
    differ from the index's; the batch is aliased to the index's
    column names before encoding (appending foreign column names into
    ``codes/``/``vectors/`` would silently null-merge on later reads).

    The assigned batch is persisted across the two appends: ``codes/``
    and ``vectors/`` must see the SAME rows, and a nondeterministic or
    non-idempotent input lineage re-executed per write could otherwise
    disagree — an id present in codes but missing from vectors drops
    out of every downstream inner join with no error.

    ``write_token`` turns the append into an IDEMPOTENT commit — the
    exactly-once primitive :mod:`streaming.index_stream` is built on.
    Instead of ``mode=append`` part files with random names, each
    dataset is staged then each touched cell's file is moved to the
    DETERMINISTIC name ``ivf_cell=<c>/add-<token>.parquet`` via
    ``os.replace``.  Because the frozen-quantizer encode is itself
    deterministic, re-running the same (batch, token) — a replayed
    streaming micro-batch after a crash anywhere in the add — rewrites
    the SAME row sets onto the SAME file names instead of appending
    duplicates: row-level exactly-once by construction, no ledger or
    marker files whose own crash window would reopen the problem.
    Tokens must be unique per logical batch (the stream uses the
    checkpointed ``batch_id``) and token files must not be compacted
    until their batch's offsets are committed — ``index_stream`` runs
    ``ivfpq_optimize`` BEFORE the add, never after, for exactly that
    reason.

    Returns the number of vectors added."""
    meta, cent = load_ivfpq_meta(spark, index_dir)
    meta_id = meta["id_col"]
    meta_vec = meta.get("vec_col", "embedding")
    batch = new_embeddings.select(
        F.col(id_col or meta_id).alias(meta_id),
        F.col(vec_col or meta_vec).alias(meta_vec),
    )
    m = meta["m"]
    dsub = meta["dim"] // m
    assigned = _assign_index_cells(batch, meta, cent, meta_vec)
    enc_col = meta_vec
    if meta.get("residual"):
        enc_col = "__res"
        assigned = _with_residual(assigned, meta["anchors"], meta_vec, enc_col)
    assigned = assigned.persist()
    try:
        n_new = assigned.count()
        coded = _with_codes(
            assigned,
            meta["codebooks"],
            dsub,
            keep=[meta_id, "ivf_cell"],
            vec_col=enc_col,
        ).select(
            F.col(meta_id),
            F.col("ivf_cell"),
            F.array(*[F.col(f"__code{j}") for j in range(m)]).alias("codes"),
        )
        _add_write(coded, os.path.join(index_dir, "codes"), write_token)
        if meta.get("store_vectors"):
            _add_write(
                assigned.select(
                    F.col(meta_id), F.col("ivf_cell"), F.col(meta_vec)
                ),
                os.path.join(index_dir, "vectors"),
                write_token,
            )
    finally:
        assigned.unpersist()
    return int(n_new)


def _add_write(df: DataFrame, ds_dir: str, token: str | None) -> None:
    """One :func:`ivfpq_add` dataset write.  Without a token: plain
    ``mode=append`` (one new random-named file per touched cell).
    With a token: stage, then ``os.replace`` each cell's file onto the
    deterministic name ``add-<token>.parquet`` — the idempotent-commit
    path (see the ``write_token`` contract in :func:`ivfpq_add`).
    ``repartition(ivf_cell)`` puts every cell's rows in exactly one
    shuffle partition, so staging yields exactly one part file per
    cell; a defensive suffix keeps the move lossless (and still
    replay-stable: deterministic assignment ⇒ same per-cell row sets
    ⇒ same file count) if that invariant ever breaks."""
    import shutil

    out = df.repartition(F.col("ivf_cell")).write.partitionBy("ivf_cell")
    if token is None:
        out.mode("append").parquet(ds_dir)
        return
    staging = os.path.join(
        os.path.dirname(ds_dir),
        f"_add_tmp_{os.path.basename(ds_dir)}_{token}",
    )
    out.mode("overwrite").parquet(staging)
    for name in sorted(os.listdir(staging)):
        if not name.startswith("ivf_cell="):
            continue
        parts = sorted(
            f
            for f in os.listdir(os.path.join(staging, name))
            if f.endswith(".parquet")
        )
        live_cell = os.path.join(ds_dir, name)
        os.makedirs(live_cell, exist_ok=True)
        for i, p in enumerate(parts):
            suffix = f"-{i}" if i else ""
            os.replace(
                os.path.join(staging, name, p),
                os.path.join(live_cell, f"add-{token}{suffix}.parquet"),
            )
    shutil.rmtree(staging, ignore_errors=True)


def _cell_files(ds_dir: str) -> dict[int, list[str]]:
    """Per-cell parquet data files of a Hive-partitioned index dataset
    (driver-side listing; n_cells directories)."""
    out: dict[int, list[str]] = {}
    if not os.path.isdir(ds_dir):
        return out
    for name in os.listdir(ds_dir):
        if not name.startswith("ivf_cell="):
            continue
        cell = int(name.split("=", 1)[1])
        cdir = os.path.join(ds_dir, name)
        out[cell] = sorted(
            f for f in os.listdir(cdir) if f.endswith(".parquet")
        )
    return out


def _recover_optimize_tmp(index_dir: str, datasets: list[str]) -> int:
    """Crash recovery for :func:`ivfpq_optimize`: restore every cell
    directory a died-mid-swap run left parked under ``_optimize_tmp``.

    The swap window per cell is two renames — live → ``trash/``, then
    ``staged/`` → live — so a crash can leave a cell's ONLY copies
    under the tmp root.  For each cell dir found there whose live
    directory is missing, move back the staged copy when the staging
    write completed (its ``_SUCCESS`` marker exists — the compacted
    rows, identical content), else the trash copy (the pre-compaction
    original).  Cells whose live directory exists are already swapped
    (or were never touched) and their tmp copies are redundant.  Only
    after every missing cell is restored is the tmp root removed —
    deleting it first (the pre-round-11 behavior) destroyed the only
    remaining copy of a mid-swap cell.  Returns the number of cell
    directories restored."""
    import shutil

    tmp_root = os.path.join(index_dir, "_optimize_tmp")
    if not os.path.isdir(tmp_root):
        return 0
    restored = 0
    for ds in datasets:
        ds_dir = os.path.join(index_dir, ds)
        staged = os.path.join(tmp_root, ds, "staged")
        trash = os.path.join(tmp_root, ds, "trash")
        staged_ok = os.path.isfile(os.path.join(staged, "_SUCCESS"))
        names: set[str] = set()
        for d in (trash, staged if staged_ok else None):
            if d and os.path.isdir(d):
                names.update(
                    n for n in os.listdir(d) if n.startswith("ivf_cell=")
                )
        for name in sorted(names):
            live = os.path.join(ds_dir, name)
            if os.path.isdir(live):
                continue
            src = os.path.join(staged, name)
            if not (staged_ok and os.path.isdir(src)):
                src = os.path.join(trash, name)
            os.makedirs(ds_dir, exist_ok=True)
            os.rename(src, live)
            restored += 1
    shutil.rmtree(tmp_root, ignore_errors=True)
    return restored


def ivfpq_optimize(
    spark,
    index_dir: str,
    max_files_per_cell: int = 4,
) -> dict:
    """Compact an IVF-PQ index's per-cell file sets — the lifecycle
    twin of ``lake/txn_table.py``'s OPTIMIZE, applied to the plain-
    parquet index layout.  Every :func:`ivfpq_add` appends one new
    file per touched cell per batch, so a daily-growing index accretes
    ~365·n_cells files/year and the per-query listing + open overhead
    grows without bound.  This rewrites ONLY the cells whose file
    count exceeds ``max_files_per_cell`` (each back to one file via a
    cell-key repartition), for ``codes/`` and — when the index stores
    them — ``vectors/``.  Cost is O(bytes of the over-threshold
    cells), not O(index).

    Row content is untouched: queries before and after compaction are
    identical (pinned by tests/test_pq.py).  Crash contract: compacted
    data is fully staged first, then each cell directory is swapped
    with two renames; a crash inside one cell's swap window leaves
    that single cell relocated under ``_optimize_tmp`` — RE-RUNNING
    the optimize is the safe recovery: on entry every such parked cell
    is restored into the live dataset (:func:`_recover_optimize_tmp`,
    preferring the fully-staged compacted copy, falling back to the
    pre-compaction original; crash-injected in tests/test_pq.py)
    BEFORE the tmp root is cleaned, so no state a crash can produce
    loses rows.  Concurrency: the swap is not reader-atomic — a query
    or ``ivfpq_add`` listing files inside one cell's two-rename window
    would see that cell absent (silently short results) or double-
    write it, so do NOT run ``ivfpq_optimize`` concurrently with
    queries or adds; it is an offline maintenance step, serialized
    with the rest of the lifecycle by the caller (``cli.py
    index-maintain`` runs it after the batch add, never alongside).
    This single-writer window is exactly the gap table formats close;
    the gold tables use ``lake/txn_table.py`` for that reason (SURVEY
    §2 S5), while the index trades that machinery for plain-directory
    reads.

    Returns ``{"recovered_cells": n, "datasets": {dataset:
    {"cells_compacted": n, "files_before": n, "files_after": n}}}`` —
    ``recovered_cells`` counts cell directories restored from a
    crashed prior run, kept OUTSIDE the per-dataset map so consumers
    iterating ``result["datasets"].items()`` see uniform dicts."""
    import shutil

    meta, _ = load_ivfpq_meta(spark, index_dir)
    datasets = ["codes"] + (["vectors"] if meta.get("store_vectors") else [])
    recovered = _recover_optimize_tmp(index_dir, datasets)
    tmp_root = os.path.join(index_dir, "_optimize_tmp")
    stats: dict[str, dict] = {}
    for ds in datasets:
        ds_dir = os.path.join(index_dir, ds)
        files = _cell_files(ds_dir)
        over = sorted(
            c for c, fs in files.items() if len(fs) > max_files_per_cell
        )
        before = sum(len(fs) for fs in files.values())
        if not over:
            stats[ds] = {
                "cells_compacted": 0,
                "files_before": before,
                "files_after": before,
            }
            continue
        staging = os.path.join(tmp_root, ds, "staged")
        (
            spark.read.parquet(ds_dir)
            .filter(F.col("ivf_cell").isin([int(c) for c in over]))
            .repartition(F.col("ivf_cell"))
            .write.mode("overwrite")
            .partitionBy("ivf_cell")
            .parquet(staging)
        )
        trash = os.path.join(tmp_root, ds, "trash")
        os.makedirs(trash, exist_ok=True)
        for c in over:
            live = os.path.join(ds_dir, f"ivf_cell={c}")
            os.rename(live, os.path.join(trash, f"ivf_cell={c}"))
            os.rename(os.path.join(staging, f"ivf_cell={c}"), live)
        after_files = _cell_files(ds_dir)
        stats[ds] = {
            "cells_compacted": len(over),
            "files_before": before,
            "files_after": sum(len(fs) for fs in after_files.values()),
        }
    shutil.rmtree(tmp_root, ignore_errors=True)
    return {"recovered_cells": recovered, "datasets": stats}


def ivfpq_drift_stats(
    spark,
    index_dir: str,
    batch: DataFrame,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> dict:
    """Quantify how far an incoming batch has drifted from the
    distribution the index's FROZEN quantizers were trained on — the
    rebuild trigger for the :func:`ivfpq_add` lifecycle (the manual
    recipe SCALE.md r9 described, as an operator).  Two bounded
    measurements, no index rewrite:

    - **cell occupancy shift**: assign the batch to the index's coarse
      cells (map-only) and compare its per-cell distribution against
      the at-rest index's (a GROUP BY over the Hive partition column —
      parquet footer counts, no column decode).  Reported as total
      variation distance in [0, 1] (``cell_tv_distance``) plus the
      batch's hottest cell share: drifted data piles into few cells,
      which erodes n_probe pruning.
    - **quantization residual**: the batch's mean PQ reconstruction
      error vs the corpus MSE recorded at build time (``build_mse`` in
      codebooks.json).  ``mse_ratio`` > ~1.5 means the codebooks no
      longer fit incoming data and ADC screen quality degrades.

    Thresholds are corpus-dependent — SCALE.md's round-10 probe charts
    both trajectories over 20 successive adds of increasingly shifted
    batches; rebuild when either stat trends past the level where
    measured recall at your n_probe drops below target.  ``id_col`` /
    ``vec_col`` name the batch's source columns when they differ from
    the index's (same contract as :func:`ivfpq_add`).

    Returns ``{"n_batch", "n_index", "cell_tv_distance",
    "batch_hottest_cell_share", "batch_mse", "build_mse",
    "mse_ratio"}`` (``build_mse``/``mse_ratio`` are None for indexes
    built before the field existed)."""
    meta, cent = load_ivfpq_meta(spark, index_dir)
    meta_id = meta["id_col"]
    meta_vec = meta.get("vec_col", "embedding")
    b = batch.select(
        F.col(id_col or meta_id).alias(meta_id),
        F.col(vec_col or meta_vec).alias(meta_vec),
    )
    n_cells = int(meta["n_cells"])
    assigned = _assign_index_cells(b, meta, cent, meta_vec)
    batch_rows = (
        assigned.groupBy("ivf_cell").agg(F.count("*").alias("n")).collect()
    )
    index_rows = (
        spark.read.parquet(os.path.join(index_dir, "codes"))
        .groupBy("ivf_cell")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    bc = {int(r["ivf_cell"]): int(r["n"]) for r in batch_rows}
    ic = {int(r["ivf_cell"]): int(r["n"]) for r in index_rows}
    n_batch = sum(bc.values())
    n_index = sum(ic.values())
    if n_batch == 0:
        raise ValueError("batch is empty")
    tv = 0.5 * sum(
        abs(bc.get(c, 0) / n_batch - ic.get(c, 0) / max(n_index, 1))
        for c in range(n_cells)
    )
    hottest = max(bc.values()) / n_batch
    # residual indexes quantize r = x − centroid(cell): the batch MSE
    # must be over the same representation build_mse was
    if meta.get("residual"):
        mse_df = _with_residual(assigned, meta["anchors"], meta_vec, "__res")
        mse_vec = "__res"
    else:
        mse_df, mse_vec = b, meta_vec
    batch_mse = pq_reconstruction_mse(
        mse_df, meta["codebooks"], id_col=meta_id, vec_col=mse_vec
    )
    build_mse = meta.get("build_mse")
    return {
        "n_batch": int(n_batch),
        "n_index": int(n_index),
        "cell_tv_distance": round(float(tv), 6),
        "batch_hottest_cell_share": round(float(hottest), 6),
        "batch_mse": round(float(batch_mse), 6),
        "build_mse": (
            round(float(build_mse), 6) if build_mse is not None else None
        ),
        "mse_ratio": (
            round(float(batch_mse / build_mse), 6)
            if build_mse
            else None
        ),
    }


def ivfpq_topk_batch(
    spark,
    index_dir: str,
    embeddings: DataFrame,
    queries: dict[int, list[float]],
    k: int = 10,
    n_probe: int = 4,
    overfetch: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_lut_doubles: int = 16_000_000,
) -> DataFrame:
    """Answer a BATCH of ANN queries in one shared pass over the index
    — the serving-tier amortization :func:`ivfpq_topk` cannot give.
    Per-query execution runs Q independent job chains, each re-listing
    and re-scanning its probed cells; at a serving tier's concurrency
    the scheduler time-slices Q full-width scans (measured in the
    SCALE.md r11 serving probes).  This operator reads the UNION of
    all queries' probed cells ONCE (still partition-pruned — a cell no
    query probes is never listed), fans each code row out to exactly
    the queries probing its cell via a broadcast (query, cell) LUT
    relation, cuts per-query candidates with ONE windowed shuffle on
    the query id, and exact-rescores all candidates in one broadcast
    join.  Plan count is O(1) in the batch size.

    Arithmetic is bit-identical to Q separate :func:`ivfpq_topk`
    calls, pinned in tests/test_pq.py: the per-query LUT values ride
    DataFrame columns instead of literals (the same IEEE doubles,
    folded in the same left-to-right order — the
    :func:`_residual_screen_joined` argument, extended per query), the
    candidate cut ranks by the same (ROUNDed approx DESC, id ASC) key,
    and the exact rescore unrolls the same per-dimension fold with the
    query vector as a joined array column.

    ``queries`` maps a query id to its vector (driver-held — a serving
    batch, bounded by construction; ~n_probe·m·ksub + dim doubles ride
    the broadcast per query, and the residual cross-term LUTs are
    folded driver-side per (query, probed cell)).  The LUT budget is
    GUARDED: past ``max_lut_doubles`` total broadcast doubles
    (default 16M ≈ 128 MB — e.g. Q=2048 at n_probe=64/m=8/ksub=16)
    the call raises instead of silently OOMing the driver — split the
    batch (amortization is already saturated well below the cap;
    SCALE.md r11 measures 4.6-6.9× at Q=8).  Works on global and
    residual indexes.
    Returns (query_id, id, cos_sim, rank) with rank 1..k per query —
    the per-query rows equal ``ivfpq_topk(...)`` for that query
    vector."""
    from .similarity import _dot_sql_names, _fold_norm

    if not queries:
        raise ValueError("queries must be a non-empty {qid: vector} dict")
    meta, cent = load_ivfpq_meta(spark, index_dir)
    codebooks = meta["codebooks"]
    m = len(codebooks)
    residual = bool(meta.get("residual"))
    anchors = meta.get("anchors") if residual else None

    ksub = len(codebooks[0])
    per_query = (3 if residual else 2) * m * ksub * max(
        min(n_probe, int(meta["n_cells"])), 1
    ) + meta["dim"]
    if len(queries) * per_query > max_lut_doubles:
        raise ValueError(
            f"batch of {len(queries)} queries at n_probe={n_probe} "
            f"needs ~{len(queries) * per_query} broadcast LUT doubles "
            f"(cap max_lut_doubles={max_lut_doubles}); split the "
            "batch — amortization saturates at small Q (SCALE.md r11)"
        )

    qid_rows = []      # per query: (qid, qv, qnorm, ld, ln2)
    probe_rows = []    # per (query, probed cell): + residual cq/c2/lx
    probed_cells: set[int] = set()
    cell_luts = _residual_cell_luts(meta) if residual else None
    for qid, qv in queries.items():
        qd = [float(x) for x in qv]
        probe = probe_cells(cent, qd, n_probe)
        probed_cells.update(probe)
        lut_dot, lut_norm2 = _adc_luts(codebooks, qd)
        qid_rows.append((int(qid), qd, _fold_norm(qd), lut_dot, lut_norm2))
        for c in probe:
            if residual:
                cvec = [float(x) for x in anchors[c]]
                c2, lut_cross = cell_luts[c]
                probe_rows.append((
                    int(qid), int(c),
                    _fold_dot_py(cvec, qd), c2,
                    lut_cross,
                ))  # fmt: skip
            else:
                probe_rows.append((int(qid), int(c), 0.0, 0.0, None))
    q_df = spark.createDataFrame(
        qid_rows,
        "__qid BIGINT, __qv ARRAY<DOUBLE>, __qnorm DOUBLE, "
        "__ld ARRAY<ARRAY<DOUBLE>>, __ln2 ARRAY<ARRAY<DOUBLE>>",
    )
    p_df = spark.createDataFrame(
        probe_rows,
        "__qid BIGINT, ivf_cell INT, __cq DOUBLE, __c2 DOUBLE, "
        "__lx ARRAY<ARRAY<DOUBLE>>",
    )

    def lu(arrs: str) -> str:
        return " + ".join(
            f"element_at(element_at({arrs}, {j + 1}), codes[{j}] + 1)"
            for j in range(m)
        )

    if residual:
        score = (
            f"ROUND((__cq + {lu('__ld')}) / "
            f"(SQRT(__c2 + 2.0D * ({lu('__lx')}) + {lu('__ln2')}) "
            "* __qnorm), 6)"
        )
    else:
        score = (
            f"ROUND(({lu('__ld')}) / "
            f"(SQRT({lu('__ln2')}) * __qnorm), 6)"
        )
    codes = spark.read.parquet(os.path.join(index_dir, "codes")).filter(
        F.col("ivf_cell").isin(sorted(probed_cells))
    )
    cand = (
        codes.join(F.broadcast(p_df), "ivf_cell")
        .join(F.broadcast(q_df.select("__qid", "__qnorm", "__ld", "__ln2")),
              "__qid")
        .select(
            "__qid", F.col(id_col), F.expr(score).alias("__approx")
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__qid").orderBy(
                    F.desc("__approx"), F.asc(id_col)
                )
            ),
        )
        .filter(F.col("__rn") <= k * overfetch)
        .select("__qid", id_col)
    )  # fmt: skip
    dim = meta["dim"]
    dot = " + ".join(
        f"(CAST({vec_col}[{i}] AS DOUBLE) * __qv[{i}])" for i in range(dim)
    )
    exact = (
        f"ROUND(({dot}) / "
        f"(SQRT({_dot_sql_names(vec_col, vec_col, dim)}) * __qnorm), 6)"
    )
    order = [F.desc("cos_sim"), F.asc(id_col)]
    return (
        embeddings.join(F.broadcast(cand), id_col)
        .join(F.broadcast(q_df.select("__qid", "__qv", "__qnorm")), "__qid")
        .select(
            F.col("__qid").alias("query_id"),
            F.col(id_col),
            F.expr(exact).alias("cos_sim"),
        )
        .withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("query_id").orderBy(*order)),
        )
        .filter(F.col("rank") <= k)
    )
