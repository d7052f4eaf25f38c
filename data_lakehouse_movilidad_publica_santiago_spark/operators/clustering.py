"""Near-dup clustering: candidate PAIRS → dedup GROUPS → survivors.

The reference's dedup story stops at per-cut keep-latest
(ROW_NUMBER, `/root/reference/src/silver/transforms.py:733-745`) and
the LLM-operator suite here (`operators/dedup_text.py`,
`operators/similarity.py`) stops at near-dup candidate pairs.  A
training-data pipeline needs the last mile: connected components over
the pair graph (a near-dup of a near-dup is the same logical
document) and a deterministic keep-one policy per component.

Algorithm — iterative min-label propagation with pointer jumping
(the "hash-to-min" family: Rastogi et al., "Finding Connected
Components in Map-Reduce in Logarithmic Rounds", ICDE 2013; the
alternating-star variant is Kiveris et al., SoCC 2014).  Each round:

  1. neighbor-min:  label(v) ← min(label(v), min_{u∈N(v)} label(u))
  2. pointer jump:  label(v) ← label(label(v))

Round 1 alone converges in O(diameter) rounds; the jump step
compresses label chains so convergence is O(log diameter).  Near-dup
graphs are dense clumps (diameter 1-2 typical), so 2-4 rounds in
practice.

100 TB shape: state is one narrow (node, label) pair hash-partitioned
by node; edges are computed once, persisted, and re-joined each round
— every round is a constant number of equality shuffle joins, no
driver-side collection of anything but the 1-row convergence count.
``localCheckpoint`` truncates lineage each round so the plan stays
O(1); on a real cluster with executor loss concerns, point
``sparkContext.setCheckpointDir`` at durable storage and swap in
``checkpoint()`` — the loop is agnostic.  No GraphFrames/GraphX
dependency: plain DataFrame ops, fully Catalyst-visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    out_id: str = "doc_id",
    out_cluster: str = "cluster_id",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components of the undirected pair graph.

    Returns one row per node appearing in ``pairs``:
    ``(out_id, out_cluster)`` with ``out_cluster`` = the minimum node
    id of the component (deterministic, order-independent).

    ``max_iter`` bounds the label-exchange rounds; with pointer
    jumping the rounds needed are O(log diameter), so 30 covers any
    graph with diameter < 2^30.  Raises ``RuntimeError`` if the fixed
    point is not reached (cannot happen for a finite graph within the
    bound; the guard exists so a future regression fails loudly
    instead of returning half-propagated labels).

    ``stats``: pass a dict to receive ``{"rounds": n}`` — the number
    of label-exchange rounds actually run (the convergence-detecting
    final round included). The skew stress tests pin the O(log
    diameter) bound with it.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # NOTE: don't repartition("u") before this checkpoint hoping
        # the per-round join reuses the layout — measured 143 s →
        # 195 s at 5 M edges: the checkpointed relation does not
        # surface a usable outputPartitioning to the join planner, so
        # the extra shuffle is pure cost
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # 1. neighbor-min: one equality shuffle join + map-side-combined min
        nbr = (
            edges.join(labels, edges["u"] == labels["node"])
            .groupBy(F.col("v").alias("nnode"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the pre-round label as ``prev`` so convergence is a
        # filter+count on the checkpointed result — no extra join
        stepped = labels.join(
            nbr, labels["node"] == nbr["nnode"], "left"
        ).select(
            "node",
            F.col("label").alias("prev"),
            F.least(
                F.col("label"), F.coalesce("nbr_label", "label")
            ).alias("label"),
        )
        # 2. pointer jump: label ← label(label).  Every label value is
        # itself a node (labels start as self and only node ids
        # propagate), so the lookup always matches; coalesce is a
        # belt-and-braces for the root whose label is itself.
        lut = stepped.select(
            F.col("node").alias("lnode"), F.col("label").alias("llabel")
        )
        jumped = (
            stepped.join(lut, stepped["label"] == lut["lnode"], "left")
            .select(
                "node",
                "prev",
                F.coalesce("llabel", "label").alias("label"),
            )
            .localCheckpoint()
        )
        changed = jumped.filter(F.col("label") != F.col("prev")).count()
        labels = jumped.select("node", "label")
        if changed == 0:
            break
    else:  # pragma: no cover - finite graphs converge within the bound
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select(
        F.col("node").alias(out_id), F.col("label").alias(out_cluster)
    )


def canonical_survivors(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Keep-one policy over dedup clusters: per cluster, the survivor
    is the member with the highest ``score_col``, ties broken by the
    lowest ``id_col`` (deterministic).  Documents absent from
    ``components`` are singletons and survive as their own cluster.

    ``docs`` must carry ``id_col`` and ``score_col``; ``components``
    is ``connected_components`` output.  Returns
    ``(id_col, cluster_col, n_members, score_col)`` — one row per
    cluster.

    Scale: one left equality join (components is the pair-graph node
    set — tiny next to the corpus; Spark broadcasts it when it fits)
    then one window exchange partitioned by cluster id.  Singletons
    dominate real corpora, so the window key is near-unique — no skew.
    """
    member = docs.join(
        components.withColumnRenamed(cluster_col, "__cc"),
        on=id_col,
        how="left",
    ).withColumn("__cluster", F.coalesce(F.col("__cc"), F.col(id_col)))
    w = Window.partitionBy("__cluster")
    rn = F.row_number().over(
        Window.partitionBy("__cluster").orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
    )
    return (
        member.withColumn("n_members", F.count("*").over(w))
        .withColumn("__rn", rn)
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("__cluster").alias(cluster_col),
            "n_members",
            score_col,
        )
    )


def connected_components_oracle_sql(
    pairs_sqls: list[str], out_id: str = "doc_id", out_cluster: str = "cluster_id"
) -> str:
    """DuckDB recursive-CTE twin of ``connected_components`` over the
    union of the given pair SELECTs (each must yield columns
    ``doc_a, doc_b``).  The walk CTE computes, for every node, the
    label of every node that can reach it (UNION dedups, so it is the
    component closure, O(Σ component²) rows — an oracle-only cost);
    MIN per node is then the component minimum, exactly the Spark
    fixed point."""
    union = "\nUNION\n".join(
        f"SELECT doc_a, doc_b FROM ({s})" for s in pairs_sqls
    )
    return f"""
WITH RECURSIVE
pr AS ({union}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
          UNION SELECT doc_b, doc_a FROM pr),
walk(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node)
SELECT node AS {out_id}, MIN(lbl) AS {out_cluster} FROM walk GROUP BY node
"""
