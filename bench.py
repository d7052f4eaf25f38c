"""Benchmark harness: runs the headline inventory queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query executes end-to-end (collect of a small aggregated result).
The reported value is the sum of per-query MEDIAN-OF-3 steady-state
wall-clock seconds: a first full pass executes every headline query
once to pay one-time costs (JVM/session startup, Catalyst analysis,
whole-stage codegen Janino compilation, parquet footer caches —
measured at ~1-3 s per query shape, independent of data size), then
THREE timed passes run each query and the median is reported, with
the min-max spread alongside, so a single contended run (e.g. the
driver's concurrent correctness pass) cannot distort the signal.
This is the warm-run methodology of the TPC power run: it measures
the query engine, not the JIT or the box's load spikes.
"""

from __future__ import annotations

import json
import os
import re
import time

from data_lakehouse_movilidad_publica_santiago_spark.analytics import (
    business_gate,
    corpus_gate,
    inventory,
    inventory_llm,
    lake_gate,
    sql_surface_gate,
)
from data_lakehouse_movilidad_publica_santiago_spark.session import get_spark

ALL_QUERIES = {
    **inventory.QUERIES,
    **inventory_llm.QUERIES,
    **lake_gate.QUERIES,
    **corpus_gate.QUERIES,
    **sql_surface_gate.QUERIES,
    **business_gate.QUERIES,
}

HEADLINE = [
    "pricing_summary",
    "typed_projection",
    "quality_split_invalid",
    "measure_unpivot",
    "dedup_keep_latest",
    "scd2_timeline",
    "asof_resolve",
    "star_join_revenue",
    "topk_orders_per_priority",
    "percentile_by_status",
    "pct_of_total_by_segment",
    "demand_by_day_type",
    # round-2 scale-path operators
    "quantile_buckets_customers",
    "asof_merge_resolve",
    # LLM-data-pipeline headliners (scale paths)
    "doc_fingerprints",
    "minhash_lsh_near_dup",
    "embedding_lsh_near_dup",
    "embedding_knn",
    "ivf_knn",
    # indexed variant: the warm-up pass pays the one-time index build
    # (train + partitioned write); timed passes measure the online
    # query — a file-pruned scan of n_probe/n_cells of the corpus
    "ivf_knn_indexed",
    # scalar-quantized ANN: the warm-up pass pays the one-time
    # min/max parameter aggregate; timed passes measure the
    # two-phase query (int8 dequantized-dot screen + exact rescore)
    "sq8_knn",
    # MMR diversified retrieval: k map-only scored scans, each a
    # TakeOrdered(1) with the selected vectors inlined as literals
    "mmr_topk",
    # pooled MMR (round 8): ONE TakeOrdered relevance scan + driver-
    # side greedy over the bounded pool — benched next to mmr_topk so
    # the k-scans-vs-one-scan trade is measured, not asserted
    "mmr_topk_pooled",
    # product-quantization ANN (round 8): the warm-up pass pays the
    # one-time codebook training (cached per sf_dir); timed passes
    # measure the online two-phase query — ADC screen over 8 int
    # codes/vector + exact rescore of 160 ids
    "pq_knn_indexed",
    # IVF-PQ (round 8): warm-up pays the one-time index build; timed
    # passes measure the file-pruned ADC scan (n_probe/n_cells of the
    # ~32x-smaller code files) + exact rescore
    "ivfpq_knn",
    # simhash_near_dup is correctness-gated at sf0.01 but excluded
    # here: at sf0.1 its RESULT is ~2.5M pairs (the corpus is
    # duplicate-riddled), so wall time measures row transport, not
    # the operator.  dedup_clusters / dedup_survivors (correctness-
    # gated likewise) consume that same ~2.5M-pair set as INPUT at
    # sf0.1, so their wall time would measure the excluded pair
    # transport too; the clustering loop itself is exercised by
    # tests/test_clustering.py.
    "range_join_shipments",
    # incremental dedup: the warm-up pass pays the one-time index
    # build (corpus signatures + shingles persisted); timed passes
    # measure the batch-vs-index query
    "minhash_incremental",
    "token_count_stats",
    "tumbling_window_30m",
    # transactional table format: the warm-up pass pays the one-time
    # commit sequence (append + COW merge + COW delete); timed passes
    # measure the stats-pruned snapshot read
    "txn_delete_skipping",
    # training-data ops: char-16-gram leakage scan (id+hash-only
    # shuffles) and the two-pass distributed token packer
    "decontamination",
    "pack_shards",
    # round-6 layout/mixing ops: concatenate-and-cut sequence packing
    # (same prefix sum + bounded per-doc fan-out) and temperature-
    # weighted domain sampling (one bounded groupBy + map-only filter)
    "pack_sequences",
    "temperature_mix",
    # corpus-prep ops (round 4): full-corpus regex redaction (map-only
    # JVM stage), corpus trigram top-k (explode + partial agg), seeded
    # two-pass global rank, native session-window aggregation, and the
    # one-Expand-pass ROLLUP
    "pii_redact",
    "ngram_topk",
    "global_shuffle",
    "session_windows",
    "rollup_revenue",
    # the reference's own published workload (docs/queries/*.sql
    # re-expressed): OD-pair flow matrix with share-of-total window,
    # and the 5-way role-playing stop join
    "biz_q3_od_matrix",
    "biz_q5_role_joins",
    # round-5 retrieval/quality ops: CCNet bigram-LM perplexity
    # (train + broadcast-model score in one plan) and Okapi BM25
    # top-k (array-expression tf, no explode, TakeOrdered)
    "lm_perplexity",
    "bm25_topk",
    # ExactSubstr span dedup (hash-only corpus shuffle + per-doc
    # gaps-and-islands) and 2-iteration Lloyd's k-means (literal-
    # centroid map-side assign, (cluster, dim) update shuffle)
    "span_dedup",
    "kmeans_assign",
    # Gopher rule battery: map-only reason-code chain over the corpus
    "gopher_rules",
    # learned quality screen: 3 GD passes (one aggregate each) + a
    # map-only literal-weight scoring pass
    "logreg_quality",
    # DSIR data selection: two broadcast-model LM scoring passes over
    # one gram-explode shape + TakeOrdered
    "dsir_selection",
    # round-6 cleaning/tokenizer ops: C4 rule battery (map-only
    # line-level reason chain) and BPE corpus encoding (the warm-up
    # pass pays the one-time 8-merge vocabulary training; timed
    # passes measure the online encode — corpus word explode + one
    # vocabulary join).  bpe_train itself is excluded: its timed
    # passes would measure an 8-row cached merge-table lookup, not
    # the training loop (probed instead in SCALE.md round 7).
    "c4_rules",
    "bpe_encode",
    # round-7 corpus ops: tf-idf cosine retrieval (corpus idf
    # relation + broadcast query weights), SoftDeDup trigram
    # commonness reweighting, C4-style global keep-first sentence
    # dedup, stupid-backoff trigram LM scoring (five model joins
    # over one gram-explode shape), per-language Zipf OLS fit.
    # contamination_matrix is excluded: the GATE's eval sets are
    # corpus-fractions by construction (mod10/mod7/src0 slices), so
    # its wall time measures three corpus-sized shingle DISTINCTs —
    # an unrealistic shape (real eval suites are tiny); the train-
    # side one-scan shingle shape is benched via decontamination.
    "tfidf_topk",
    "soft_dedup",
    "sentence_dedup",
    "trigram_ppl",
    "zipf_spectrum",
    # semantic_dedup is correctness-gated but excluded here for the
    # same reason as dedup_clusters: at these SFs its wall time is
    # ~95% fixed per-round scheduling overhead of the components loop
    # + Janino codegen of the 256-term centroid expressions (measured
    # 14.5s at sf0.001 vs 28.8s at sf0.1 — barely data-dependent),
    # which at cluster scale amortizes to noise. Its pieces are
    # benched individually: kmeans_assign here, the banded pair join
    # via embedding_lsh_near_dup, the components loop via
    # tests/test_clustering.py.
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="bench")

    # warm-up pass: compile every query shape once (codegen classes are
    # cached by generated source, so the timed passes reuse them)
    for name in HEADLINE:
        ALL_QUERIES[name](spark, sf_dir).collect()

    # three timed passes, interleaved across queries so a transient
    # load spike hits at most one sample of several queries instead of
    # all samples of one query
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            fn = ALL_QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples[name].append(time.perf_counter() - t0)

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, runs in samples.items():
        runs = sorted(runs)
        timings[name] = round(runs[1], 3)  # median of 3
        spread[name] = [round(runs[0], 3), round(runs[-1], 3)]

    total = round(sum(timings.values()), 3)
    # Full detail object first (humans / logs), then a compact final
    # line.  The driver keeps only a 2,000-char tail of stdout and
    # parses the LAST JSON line: with 40+ queries the detail line
    # alone exceeds the tail, so the summary must come last and stay
    # far under the window (it is ~120 chars).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "method": "median_of_3_warm",
                "spread_min_max": spread,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "method": "median_of_3_warm",
            }
        )
    )


if __name__ == "__main__":
    main()
