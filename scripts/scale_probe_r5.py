"""Round-5 scale probes: the newest operators at 100-1000x the gate
size, measured on local[32]. Synthetic inputs generated in-plan (ids
and hashes only — these ops never need text to stress their shuffles).

Run:  python scripts/scale_probe_r5.py
Emits one JSON line per probe; summarize into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_lakehouse_movilidad_publica_santiago_spark.operators.chunking import (  # noqa: E402
    global_shuffle,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.clustering import (  # noqa: E402
    connected_components,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (  # noqa: E402
    pack_shards,
    sample_mix,
)
from data_lakehouse_movilidad_publica_santiago_spark.session import get_spark  # noqa: E402


def probe(name, fn):
    t0 = time.perf_counter()
    result = fn()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"probe": name, "sec": dt, **result}), flush=True)


def main() -> None:
    spark = get_spark(app_name="scale-probe-r5")

    # 50M-row deterministic global shuffle (the training-data layout
    # step): two-pass rank, driver holds one offset per partition
    def p_shuffle():
        docs = spark.range(50_000_000).select(F.col("id").alias("doc_id"))
        pins: list = []
        out = global_shuffle(docs, seed="probe", pins=pins)
        n = out.count()
        mx = out.agg(F.max("pos")).collect()[0][0]
        for p in pins:
            p.unpersist()
        return {"rows": n, "max_pos": mx, "parts_default": None}

    probe("global_shuffle_50m", p_shuffle)

    # 50M-row token-budget packing (two-pass distributed prefix sum)
    def p_pack():
        docs = spark.range(50_000_000).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[F.lit("t")] * 8).alias("text"),
        )
        pins: list = []
        out = pack_shards(docs, budget_tokens=1_000_000, pins=pins)
        shards = out.select("shard_id").distinct().count()
        for p in pins:
            p.unpersist()
        return {"rows": 50_000_000, "shards": shards}

    probe("pack_shards_50m", p_pack)

    # 100M-row seeded weighted sampling (pure hash filter, no shuffle)
    def p_sample():
        docs = spark.range(100_000_000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 3 == 0, "en").otherwise("es").alias("lang"),
        )
        kept = sample_mix(docs, {"en": 0.5, "es": 0.1}).count()
        return {"rows": 100_000_000, "kept": kept}

    probe("sample_mix_100m", p_sample)

    # 5M-edge connected components: 500k clusters of 10 + one 100k-node
    # giant cluster chained to stress both breadth and the label loop
    def p_cc():
        small = spark.range(5_000_000).select(
            (F.col("id") / 10).cast("bigint").alias("grp"),
            F.col("id").alias("n"),
        ).select(
            (F.col("grp") * 10).alias("doc_a"), F.col("n").alias("doc_b")
        ).filter(F.col("doc_a") != F.col("doc_b"))
        giant = spark.range(100_000).select(
            (F.lit(10_000_000) + F.col("id")).alias("doc_a"),
            (F.lit(10_000_000) + F.col("id") + 1).alias("doc_b"),
        )
        stats: dict = {}
        labels = connected_components(
            small.unionByName(giant), stats=stats
        )
        n_nodes = labels.count()
        n_clusters = labels.select("cluster_id").distinct().count()
        return {"nodes": n_nodes, "clusters": n_clusters, **stats}

    probe("connected_components_5m_edges", p_cc)


if __name__ == "__main__":
    main()
