"""SemDeDup: semantic deduplication via cluster-then-compare.

The embedding-space dedup recipe of Abbas et al., "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication"
(arXiv 2303.09540): k-means-cluster the corpus embeddings, compare
pairs ONLY within each cluster (the whole point — the all-pairs
O(N²) collapses to Σ cluster²), connect the ≥-threshold pairs into
duplicate groups, and keep one representative per group — the member
FARTHEST from its cluster centroid (the paper's low-centroid-
similarity choice: it preserves the cluster's outer, more diverse
examples and drops the redundant core).

Composed entirely from the individually-gated operators:
``kmeans_fit_assign`` (clusters + rounded centroid distances),
the unrolled-fold cosine of the similarity module, and
``connected_components`` (min-label propagation). Pairs that
straddle two clusters are — by design — not compared; that is
SemDeDup's approximation, and what makes it run at web scale.

Scale shape: the pair join is equi on the cluster id (one shuffle of
(id, cluster, vector) rows), candidate pairs carry ids + one rounded
double, components iterate on narrow edges, and the final keep
decision is one window over (component, dist). Nothing driver-side
beyond k-means' k·dim centroid collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .clustering import connected_components
from .kmeans import kmeans_fit_assign
from .similarity import _dot_sql_names, _norm_sql_name


def semantic_dedup(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pins: list | None = None,
) -> DataFrame:
    """Per-vector SemDeDup verdict: (id, cluster, dist, keep).

    ``keep`` is False exactly for the non-representative members of
    each within-cluster duplicate group (cosine ≥ ``threshold``,
    transitively connected). Representatives are the group member
    with the LARGEST rounded centroid distance; ties break on the
    lowest id.

    The k-means assignment is persisted internally: it feeds three
    consumers (both pair-join sides and the final verdict join), and
    inlining its 4·dim-term centroid expressions into the fused pair
    stage both recomputes them 3× and overflows Janino's method
    limit (measured: whole-stage codegen falls back to interpreted).
    Pass ``pins`` (a list) to receive the persisted handle and
    release it after your final action — see ``spread.release_pins``;
    with ``pins=None`` the result is snapshotted via ``release_pins``
    before returning (the operator is already eager — the components
    loop runs jobs — so the extra materialization changes nothing)
    and no cache entry outlives the call."""
    from .spread import release_pins

    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("semantic_dedup: empty input")
    dim = int(first["d"])

    own_pins: list = [] if pins is None else pins
    assign = kmeans_fit_assign(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    ).persist()
    own_pins.append(assign)
    joined = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.expr(_norm_sql_name(vec_col, dim)).alias("nrm"),
    ).join(
        assign.select(
            F.col(id_col).alias("id"), "cluster", "dist"
        ),
        "id",
    )
    a = joined.select(
        F.col("id").alias("id_a"),
        F.col("cluster").alias("cl_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("norm_a"),
    )
    b = joined.select(
        F.col("id").alias("id_b"),
        F.col("cluster").alias("cl_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("norm_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("cl_a") == F.col("cl_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            F.expr(
                f"ROUND({_dot_sql_names('va', 'vb', dim)}"
                " / (norm_a * norm_b), 6)"
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    )
    comps = connected_components(pairs, src="doc_a", dst="doc_b")
    ranked = comps.join(
        assign.select(F.col(id_col).alias("doc_id"), "dist"), "doc_id"
    ).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.desc("dist"), F.asc("doc_id")
            )
        ),
    )
    verdict = ranked.select(
        F.col("doc_id").alias(id_col), (F.col("__rn") == 1).alias("keep")
    )
    out = assign.join(verdict, id_col, "left").select(
        id_col,
        "cluster",
        "dist",
        F.coalesce("keep", F.lit(True)).alias("keep"),
    )
    if pins is None:
        # caller opted out of pin management: snapshot and release now
        out = release_pins(out, own_pins)
    return out
