"""Round-6 re-probe: the incremental-index per-batch path AFTER the
broadcast candidate-id prune fix, against the index already built by
scripts/scale_probe_r6.py (copied aside before the probe's cleanup).

Usage: python scripts/reprobe_r6_incremental.py <index_dir> <n_index_docs> [batch_docs]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from data_lakehouse_movilidad_publica_santiago_spark.session import (  # noqa: E402
    get_spark,
)
from scale_probe_r6 import gen_corpus, probe  # noqa: E402


def main() -> None:
    idx_dir = sys.argv[1]
    n_index = int(sys.argv[2])
    batch_n = int(sys.argv[3]) if len(sys.argv) > 3 else n_index // 10
    spark = get_spark(
        app_name="reprobe-r6-incremental",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="reprobe_r6_"))
    try:
        from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
            minhash_dedup_incremental,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.streaming.silver_stream import (
            stream_dedup_against_index,
        )

        for b in range(2):
            bdir = str(work / f"batch{b}.parquet")
            gen_corpus(
                spark, batch_n, bdir,
                id_offset=n_index * (b + 1),
                dup_parent_space=n_index,
            )  # fmt: skip
            batch = spark.read.parquet(bdir)
            pins: list = []
            t0 = time.perf_counter()
            n_pairs = minhash_dedup_incremental(
                batch, idx_dir, threshold=0.7, est_margin=0.25, pins=pins
            ).count()
            probe(
                "minhash_incremental_batch_fixed",
                {
                    "batch": b,
                    "batch_docs": batch_n,
                    "index_docs": n_index,
                    "sec": round(time.perf_counter() - t0, 2),
                    "pairs": n_pairs,
                },
            )
            for p in pins:
                p.unpersist()
            spark.catalog.clearCache()

        sdir = str(work / "stream_in")
        gen_corpus(spark, batch_n, str(Path(sdir) / "part0.parquet"),
                   id_offset=n_index * 3, dup_parent_space=n_index)  # fmt: skip
        schema = spark.read.parquet(str(Path(sdir) / "part0.parquet")).schema
        stream = (
            spark.readStream.schema(schema)
            .parquet(str(Path(sdir) / "part0.parquet"))
        )
        t0 = time.perf_counter()
        q = stream_dedup_against_index(
            stream,
            idx_dir,
            str(work / "stream_out"),
            str(work / "stream_ckpt"),
            threshold=0.7,
            est_margin=0.25,
        )
        q.awaitTermination()
        accepted = spark.read.parquet(
            str(work / "stream_out" / "accepted")
        ).count()
        probe(
            "stream_dedup_against_index_fixed",
            {
                "batch_docs": batch_n,
                "index_docs": n_index,
                "sec": round(time.perf_counter() - t0, 2),
                "accepted": accepted,
            },
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
