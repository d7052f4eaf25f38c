"""Distributed k-means clustering over an embedding column.

Topic/domain clustering for corpus curation (the clustering step of
semantic dedup pipelines à la SemDeDup, and the trainer behind IVF
coarse quantizers): classic Lloyd's iterations expressed Spark-first.

Execution shape, built for a 100 TB corpus:

- Centroids live on the DRIVER (k × dim doubles — a few KB) and are
  folded into the assignment expression as literals, so the assign
  step is a pure map stage: no join, no shuffle, whole-stage codegen.
- The update step is ``posexplode`` of the assigned vectors →
  ``groupBy(cluster, dim)`` average — ONE shuffle per iteration whose
  rows are (cluster, dim, partial-sum), i.e. k·dim·partitions small.
- Each iteration collects exactly k·dim aggregated doubles back to
  the driver — bounded, like the IVF trainer's sample.

Determinism contract (what the differential gate relies on):

- The per-centroid squared-L2 distance is ONE fixed left-to-right
  expression tree (built as a SQL string — see the verify notes on
  py4j analysis cost), so its double arithmetic is bit-reproducible
  and matches an oracle that writes the same fold order.
- Updated centroids are ROUNDed to 6 decimals before the next
  iteration: both engines then iterate from identical doubles, so
  sum-order ulp drift in the averages cannot compound.
- Ties in the argmin break on the lowest cluster id.
- Initialization is the k embeddings with the smallest ids (or an
  explicit ``init_ids`` list) — deterministic, no sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dlit(v: float) -> str:
    """Exact DOUBLE literal: ``D`` suffix for plain decimals; a
    string cast for scientific-notation reprs (Spark's lexer rejects
    ``1e-05D``). repr round-trips IEEE doubles exactly either way."""
    s = repr(float(v))
    if "e" in s or "E" in s:
        return f"CAST('{s}' AS DOUBLE)"
    return f"{s}D"


def _dist_sql(vec_col: str, centroid: list[float], dim: int) -> str:
    """Unrolled squared-L2 distance, left-to-right fold, rounded to 6.
    Literals parse as DOUBLE (a bare decimal literal would be DECIMAL
    and change the arithmetic)."""
    terms = [
        f"(CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) - ({_dlit(centroid[i])}))"
        f" * (CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) - ({_dlit(centroid[i])}))"
        for i in range(dim)
    ]
    return f"ROUND({' + '.join(terms)}, 6)"


def kmeans_fit_assign(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_ids: list[int] | None = None,
) -> DataFrame:
    """Run ``iters`` Lloyd's iterations and return the final
    assignment: (id, cluster int 0..k-1, dist — the winning rounded
    squared L2). The trained centroids are reachable as
    ``df.kmeans_centroids`` (list of k rounded vectors) for reuse as
    an IVF quantizer or for scoring a held-out set."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1 (got {iters})")
    if init_ids is None:
        # k DISTINCT vectors with the smallest ids: duplicate low-id
        # embeddings (common in the dedup corpora this clusters) would
        # otherwise seed identical centroids and permanently empty
        # clusters.
        #
        # Round-12 (guide §2.4): the straightforward
        # ``groupBy(vec).agg(min(id))`` shuffles the ENTIRE corpus by
        # the full embedding — a corpus-wide exchange of the heaviest
        # column just to pick k rows.  Scanning ids ascending, the
        # first occurrence of each distinct vector IS its min-id
        # occurrence, so a bounded TakeOrdered prefix yields the
        # IDENTICAL init set whenever it contains >= k distinct
        # vectors (every id outside the prefix is larger than every id
        # inside, so no outside vector can displace one found here);
        # the exact groupBy remains as fallback for pathological
        # prefixes (all duplicates).
        # a NULL vector can't seed a centroid: filter it out of BOTH
        # init paths so prefix scan and groupBy fallback agree on
        # corpora containing NULL embeddings among the low ids
        # (ADVICE r12 — previously the fallback kept the NULL group
        # and crashed at centroid extraction while the prefix skipped
        # it row-by-row)
        nn = emb.filter(F.col(vec_col).isNotNull())
        prefix_n = max(64, 8 * k)
        prefix = (
            nn.select(id_col, vec_col)
            .orderBy(F.col(id_col))
            .limit(prefix_n)
            .collect()
        )
        seen: dict[tuple, object] = {}
        for r in prefix:
            # NaN-safe distinctness: SQL GROUP BY treats NaN = NaN
            # (and -0.0 = 0.0, which Python tuples already do)
            key = tuple(
                "nan" if x != x else float(x) for x in r[vec_col]
            )
            if key not in seen:
                seen[key] = r
                if len(seen) == k:
                    break
        if len(seen) >= k:
            rows = list(seen.values())
        else:
            rows = (
                nn.groupBy(vec_col)
                .agg(F.min(id_col).alias(id_col))
                .orderBy(F.col(id_col))
                .limit(k)
                .collect()
            )
    else:
        got = {
            r[id_col]: r
            for r in emb.filter(F.col(id_col).isin(init_ids)).collect()
        }
        missing = [i for i in init_ids if i not in got]
        if missing:
            raise ValueError(f"init_ids not found in input: {missing}")
        rows = [got[i] for i in init_ids]
    if len(rows) < k:
        raise ValueError(f"need {k} distinct init vectors, found {len(rows)}")
    centroids = [[float(x) for x in r[vec_col]] for r in rows]
    dim = len(centroids[0])

    out = None
    for it in range(iters):
        dists = [
            F.expr(_dist_sql(vec_col, c, dim)).alias(f"__d{j}")
            for j, c in enumerate(centroids)
        ]
        scored = emb.select(
            F.col(id_col), F.col(vec_col), *dists
        )
        m = (
            F.least(*[F.col(f"__d{j}") for j in range(k)])
            if k > 1
            else F.col("__d0")
        )
        cluster = F.lit(None).cast("int")
        # reversed so the FIRST (lowest-index) match wins ties
        for j in reversed(range(k)):
            cluster = F.when(F.col(f"__d{j}") == m, j).otherwise(cluster)
        assigned = scored.select(
            F.col(id_col),
            F.col(vec_col),
            cluster.alias("cluster"),
            m.alias("dist"),
        )
        if it == iters - 1:
            out = assigned.drop(vec_col)
            break
        # update: one (cluster, dim) shuffle of partial sums, k*dim
        # rounded doubles back to the driver
        upd = (
            assigned.select("cluster", F.posexplode(vec_col).alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("v"))
            .collect()
        )
        new_c: dict[int, dict[int, float]] = {}
        for r in upd:
            new_c.setdefault(r["cluster"], {})[r["i"]] = r["v"]
        centroids = [
            [new_c[j][i] for i in range(dim)] if j in new_c else centroids[j]
            for j in range(k)
        ]
    out.kmeans_centroids = centroids
    return out
