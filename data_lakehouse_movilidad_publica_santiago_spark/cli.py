"""Pipeline CLI — the reference's command surface re-expressed
(src/silver/transform_silver.py and src/gold/load_gold.py CLIs):

    python -m data_lakehouse_movilidad_publica_santiago_spark silver \
        --lake /path/to/lake [--dataset viajes] [--cut 2025-04-21] [--fail-fast]
    python -m data_lakehouse_movilidad_publica_santiago_spark gold \
        --lake /path/to/lake [--dataset ...] [--cut ...] [--force]
    python -m data_lakehouse_movilidad_publica_santiago_spark report --lake ...
    python -m data_lakehouse_movilidad_publica_santiago_spark export-sqlite \
        --lake ... --out dw.db

Exit code = number of failed partitions (CLI loop parity,
transform_silver.py:147-161).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from pyspark.sql import functions as F

from .gold import GoldLoader
from .gold.diagnostics import build_load_report, write_load_report
from .gold.sqlite_export import export_gold_to_sqlite
from .session import get_spark
from .silver import run_silver
from .sources.catalog import discover_partitions


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--lake", required=True, type=Path)
    p.add_argument("--dataset", default=None)
    p.add_argument("--cut", default=None)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_lakehouse_movilidad_publica_santiago_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("silver", help="raw partitions → silver + quarantine")
    _add_common(sp)
    sp.add_argument("--fail-fast", action="store_true")

    gp = sub.add_parser("gold", help="silver partitions → DW constellation")
    gp.add_argument(
        "--store",
        choices=["parquet", "txn"],
        default="parquet",
        help="gold backend: plain parquet dirs, or the transactional "
        "table format (lake.TxnTable: ACID commits, time travel, "
        "stats-pruned MERGE)",
    )
    gp.add_argument(
        "--gold-dir",
        type=Path,
        default=None,
        help="override the gold root (default <lake>/gold)",
    )
    _add_common(gp)
    gp.add_argument("--force", action="store_true", help="ignore run-log OK skip")

    mp_ = sub.add_parser(
        "maintain",
        help="transactional-gold maintenance: OPTIMIZE small files + "
        "VACUUM unreferenced data past the retention window",
    )
    mp_.add_argument("--gold-dir", required=True, type=Path)
    mp_.add_argument("--target-file-mb", type=int, default=128)
    mp_.add_argument("--retain-versions", type=int, default=5)
    mp_.add_argument(
        "--vacuum-min-age-hours",
        type=float,
        default=1.0,
        help="never reclaim files younger than this (in-flight writer "
        "protection)",
    )

    cp = sub.add_parser(
        "corpus",
        help="training-data corpus build: quality filter → exact dedup "
        "→ PII redaction → chunk → seeded shuffle → packed layout",
    )
    cp.add_argument("--input", required=True, type=Path,
                    help="parquet with (doc_id, text, ...) columns")
    cp.add_argument("--output", required=True, type=Path)
    cp.add_argument("--quality-min", type=float, default=0.75)
    cp.add_argument(
        "--stopwords",
        default=None,
        help="comma-separated stopword list for the quality screens "
        "(gopher stopword-hit rule, heuristic score, quality-model "
        "feature); default is the English top-10 — set this for "
        "non-English corpora or they fail the stopword rules wholesale",
    )
    cp.add_argument("--chunk-tokens", type=int, default=64)
    cp.add_argument("--overlap", type=int, default=16)
    cp.add_argument("--seed", default="epoch-0")
    cp.add_argument("--no-redact", action="store_true")
    cp.add_argument(
        "--near-dedup",
        action="store_true",
        help="after exact dedup, remove MinHash-LSH near-duplicates "
        "(pairs → connected components → keep best-quality member)",
    )
    cp.add_argument("--near-threshold", type=float, default=0.85)
    cp.add_argument(
        "--lsh-est-margin",
        type=float,
        default=None,
        help="large-corpus guard: prune LSH candidates whose signature-"
        "estimated Jaccard is below threshold-margin before the exact "
        "shingle verify (precision stays 1.0; ~5e-6 recall loss per "
        "true pair at 0.25)",
    )
    cp.add_argument(
        "--lsh-max-bucket",
        type=int,
        default=None,
        help="drop LSH buckets larger than this before pairing "
        "(boilerplate mega-buckets); drop counts land in the summary",
    )
    cp.add_argument(
        "--near-dedup-mode",
        choices=("minhash", "containment"),
        default="minhash",
        help="pair miner for --near-dedup: symmetric MinHash-LSH "
        "Jaccard (default) or asymmetric containment (catches a short "
        "doc embedded in a long one; Broder 1997)",
    )
    cp.add_argument(
        "--containment-k",
        type=int,
        default=3,
        help="shingle width for --near-dedup-mode containment",
    )
    cp.add_argument(
        "--containment-max-df",
        type=int,
        default=None,
        help="containment hot-shingle guard: drop shingles occurring "
        "in more than this many docs before the pair join",
    )
    cp.add_argument(
        "--span-mask-window",
        type=int,
        default=None,
        help="ExactSubstr masking: cut every N-token window that "
        "occurs more than once in the corpus (Lee et al. 2022)",
    )
    cp.add_argument(
        "--sentence-dedup",
        action="store_true",
        help="C4 corpus-global sentence dedup: cut every repeated "
        "sentence occurrence across the corpus, keep the first; "
        "docs deduplicated to nothing are dropped",
    )
    cp.add_argument(
        "--soft-dedup-n",
        type=int,
        default=None,
        metavar="N",
        help="SoftDeDup sampling stage: weight docs by word-N-gram "
        "corpus commonness and keep/drop with the seeded hash "
        "(down-samples boilerplate without a hard threshold)",
    )
    cp.add_argument(
        "--ppl-threshold",
        type=float,
        default=None,
        help="CCNet screen: drop docs whose bigram-LM cross-entropy "
        "(self-trained) exceeds this",
    )
    cp.add_argument(
        "--ppl-model",
        choices=("bigram", "trigram"),
        default="bigram",
        help="scorer for --ppl-threshold: CCNet word-bigram LM "
        "(default) or stupid-backoff trigram LM (Brants et al. 2007)",
    )
    cp.add_argument(
        "--ppl-min-count",
        type=int,
        default=1,
        help="count-prune tri/bigrams below this from the trigram "
        "scorer's model (broadcastable models on real language)",
    )
    cp.add_argument(
        "--select-query",
        default=None,
        metavar="'W1 W2 ...'",
        help="topical selection: keep only the --select-top-k "
        "surviving docs most tf-idf-cosine-similar to this "
        "bag-of-words query",
    )
    cp.add_argument(
        "--select-top-k",
        type=int,
        default=None,
        help="document budget for --select-query (TakeOrdered merge: "
        "keep <= ~1e5; use --dsir-top-k's rank path for corpus "
        "fractions)",
    )
    cp.add_argument(
        "--gopher",
        action="store_true",
        help="use the published Gopher rule battery as the quality "
        "filter instead of the heuristic score",
    )
    cp.add_argument(
        "--c4",
        action="store_true",
        help="run the C4 structural cleaning battery first (Raffel "
        "et al. 2020): line filters rewrite each doc, then pages "
        "failing the page rules are dropped",
    )
    cp.add_argument(
        "--c4-min-sentences",
        type=int,
        default=5,
        help="C4 page rule: minimum sentences surviving line filters",
    )
    cp.add_argument(
        "--c4-blocklist",
        default=None,
        metavar="W1,W2,...",
        help="comma-separated C4 page blocklist (default: rule off)",
    )
    cp.add_argument(
        "--quality-model",
        default=None,
        metavar="LABEL_EXPR",
        help="learned quality screen: train a logistic regression on "
        "the standard text features against this weak-label boolean "
        "SQL expression (e.g. \"lang = 'en'\") and drop docs scoring "
        "below --quality-model-min",
    )
    cp.add_argument("--quality-model-min", type=float, default=0.5)
    cp.add_argument(
        "--dsir-target",
        default=None,
        metavar="TARGET_EXPR",
        help="DSIR importance resampling: keep only the --dsir-top-k "
        "surviving docs whose bigram distribution most resembles the "
        "slice this boolean SQL expression selects",
    )
    cp.add_argument("--dsir-top-k", type=int, default=None)
    cp.add_argument(
        "--split",
        default=None,
        metavar="NAME=W,NAME=W,...",
        help="document-level train/val/test split, e.g. "
        "train=0.9,val=0.05,test=0.05 — the chunks parquet gains a "
        "split=<name> partition level (seeded-hash assignment, "
        "leakage-free: all chunks of a doc share a split)",
    )
    cp.add_argument(
        "--checkpoint-stages",
        action="store_true",
        help="bound shuffle scratch: parquet each stage boundary under "
        "<output>/_stages/ (restart points) so finished stages' shuffle "
        "files are reclaimed instead of accumulating until the final "
        "write — use on disk-tight executors / large composed builds",
    )

    rp = sub.add_parser("report", help="gold load diagnostics report")
    rp.add_argument("--lake", required=True, type=Path)

    crp = sub.add_parser(
        "corpus-report",
        help="corpus auditing report: token/dup/quality/PII/mix stats",
    )
    crp.add_argument("--input", required=True, type=Path,
                     help="parquet with (doc_id, text, ...) columns")
    crp.add_argument("--out", required=True, type=Path)
    crp.add_argument(
        "--bpe-merges",
        type=int,
        default=None,
        help="also train an N-merge BPE vocabulary and report the "
        "subword token total (corpus-sizing figure)",
    )

    ep = sub.add_parser("export-sqlite", help="export the DW to one .db file")
    ep.add_argument("--lake", required=True, type=Path)
    ep.add_argument("--out", required=True, type=Path)

    im = sub.add_parser(
        "index-maintain",
        help="IVF-PQ index maintenance for one incoming batch: drift "
        "stats → incremental add → compaction when cells exceed the "
        "file threshold → JSON report with a rebuild_recommended flag "
        "(the SCALE.md lifecycle recipe as one verb)",
    )
    im.add_argument("--index-dir", required=True, type=Path,
                    help="build_ivfpq_index layout root")
    im.add_argument("--batch", required=True, type=Path,
                    help="parquet with the new vectors to add")
    im.add_argument("--id-col", default=None,
                    help="batch id column when it differs from the index's")
    im.add_argument("--vec-col", default=None,
                    help="batch vector column when it differs from the "
                    "index's")
    im.add_argument("--max-files-per-cell", type=int, default=4,
                    help="compact any cell accreting more files than this")
    im.add_argument(
        "--mse-rebuild-threshold", type=float, default=1.5,
        help="recommend a rebuild when the batch's PQ reconstruction "
        "MSE exceeds this multiple of the build-time corpus MSE "
        "(SCALE.md r10: drift trajectories separate cleanly at 1.5)",
    )
    im.add_argument(
        "--tv-rebuild-threshold", type=float, default=0.5,
        help="recommend a rebuild when the batch's cell-occupancy "
        "total-variation distance from the at-rest index exceeds this "
        "(drifted data piles into few cells and erodes n_probe pruning)",
    )

    ist = sub.add_parser(
        "index-stream",
        help="resident/drain streaming index maintenance: a parquet "
        "file source of arriving embedding batches drives the "
        "index-maintain cycle per micro-batch with row-level "
        "exactly-once adds across crash replays (deterministic "
        "re-encode + deterministic per-cell file names)",
    )
    ist.add_argument("--index-dir", required=True, type=Path,
                     help="build_ivfpq_index layout root")
    ist.add_argument("--source", required=True, type=Path,
                     help="directory where embedding batches land as "
                     "flat parquet files")
    ist.add_argument("--checkpoint", required=True, type=Path,
                     help="streaming checkpoint dir (source offsets)")
    ist.add_argument("--id-col", default=None)
    ist.add_argument("--vec-col", default=None)
    ist.add_argument("--max-files-per-cell", type=int, default=8)
    ist.add_argument("--mse-rebuild-threshold", type=float, default=1.5)
    ist.add_argument("--tv-rebuild-threshold", type=float, default=0.5)
    ist.add_argument(
        "--resident", action="store_true",
        help="keep running and absorb future arrivals (default drains "
        "pending files AvailableNow and exits)",
    )

    rv = sub.add_parser(
        "retrieve",
        help="diversified vector retrieval: IVF-PQ cell-pruned ADC "
        "prefetch → bounded relevance pool → driver-greedy MMR (the "
        "100 TB stack; --exact-pool skips the ANN prefetch)",
    )
    rv.add_argument("--embeddings", required=True, type=Path,
                    help="parquet with (vec_id, embedding) columns")
    rv.add_argument("--index-dir", required=True, type=Path,
                    help="IVF-PQ index root; built here if absent")
    rv.add_argument("--query-id", required=True, type=int,
                    help="vec_id whose embedding is the query vector")
    rv.add_argument("--k", type=int, default=5)
    rv.add_argument("--lam", type=float, default=0.7,
                    help="MMR relevance/diversity trade (1 = pure top-k)")
    rv.add_argument("--pool-size", type=int, default=None,
                    help="relevance pool bound (default max(64k, 256))")
    rv.add_argument("--n-cells", type=int, default=16)
    rv.add_argument("--n-probe", type=int, default=4)
    rv.add_argument("--exact-pool", action="store_true",
                    help="pool from a full float scan instead of the "
                    "IVF-PQ prefetch (exactness certificate applies "
                    "to the whole corpus)")

    args = ap.parse_args(argv)
    spark = get_spark(app_name=f"dlmps-{args.cmd}")
    failed = 0

    if args.cmd == "silver":
        parts = discover_partitions(args.lake, args.dataset, args.cut)
        if not parts:
            print("no matching partitions", file=sys.stderr)
            return 1
        for p in parts:
            try:
                stats = run_silver(spark, p, args.lake)
                print(
                    f"OK  {p.dataset}/{p.cut}: read={stats['read_row_count']} "
                    f"valid={stats['valid_row_count']} "
                    f"invalid={stats['invalid_row_count']} "
                    f"({stats['quarantine_rate_pct']}%)"
                )
            except Exception as exc:
                failed += 1
                print(f"FAIL {p.dataset}/{p.cut}: {exc}", file=sys.stderr)
                if args.fail_fast:
                    break

    elif args.cmd == "gold":
        parts = discover_partitions(args.lake, args.dataset, args.cut)
        if not parts:
            print("no matching partitions", file=sys.stderr)
            return 1
        gold_root = args.gold_dir or (args.lake / "gold")
        if args.store == "txn":
            from .gold.txn_store import TxnGoldStore

            loader = GoldLoader(
                spark, gold_root, store=TxnGoldStore(spark, gold_root)
            )
        else:
            loader = GoldLoader(spark, gold_root)
        for p in parts:
            try:
                res = loader.run(p, args.lake, force=args.force)
                print(f"{res['status']}  {p.dataset}/{p.cut}: " + json.dumps(
                    {k: v for k, v in res.items()
                     if k not in ("status", "dataset", "cut")},
                    default=str,
                ))  # fmt: skip
            except Exception as exc:
                failed += 1
                print(f"FAIL {p.dataset}/{p.cut}: {exc}", file=sys.stderr)

    elif args.cmd == "maintain":
        from .lake import TxnTable

        out = {}
        for tdir in sorted(args.gold_dir.iterdir()):
            if not (tdir / "_txn_log").is_dir():
                continue
            tab = TxnTable(spark, tdir)
            if tab.latest_version() is None:
                continue  # bare exists() probe left an empty log dir
            opt = tab.optimize(
                target_file_bytes=args.target_file_mb * 1024 * 1024
            )
            vac = tab.vacuum(
                retain_last=args.retain_versions,
                min_age_s=args.vacuum_min_age_hours * 3600.0,
            )
            out[tdir.name] = {
                "compacted_files": opt.get("compacted_files", 0),
                "vacuumed_files": vac.get("deleted_files", 0),
                "version": tab.latest_version(),
            }
        print(json.dumps(out))

    elif args.cmd == "corpus":
        from .pipeline import build_corpus

        split_weights = None
        if args.split:
            try:
                split_weights = {
                    name: float(w)
                    for name, w in (
                        part.split("=", 1) for part in args.split.split(",")
                    )
                }
            except ValueError as exc:
                print(f"bad --split spec: {exc}", file=sys.stderr)
                return 1
        summary = build_corpus(
            spark,
            str(args.input),
            str(args.output),
            quality_min=args.quality_min,
            chunk_tokens=args.chunk_tokens,
            overlap=args.overlap,
            seed=args.seed,
            redact=not args.no_redact,
            near_dedup=args.near_dedup,
            near_threshold=args.near_threshold,
            near_dedup_mode=args.near_dedup_mode,
            containment_k=args.containment_k,
            containment_max_df=args.containment_max_df,
            lsh_est_margin=args.lsh_est_margin,
            lsh_max_bucket=args.lsh_max_bucket,
            sentence_dedup=args.sentence_dedup,
            soft_dedup_n=args.soft_dedup_n,
            span_mask_window=args.span_mask_window,
            ppl_threshold=args.ppl_threshold,
            ppl_model=args.ppl_model,
            ppl_min_count=args.ppl_min_count,
            select_query=args.select_query,
            select_top_k=args.select_top_k,
            c4=args.c4,
            c4_min_sentences=args.c4_min_sentences,
            c4_blocklist=(
                tuple(w for w in args.c4_blocklist.split(",") if w)
                if args.c4_blocklist
                else ()
            ),
            gopher=args.gopher,
            quality_model_label=args.quality_model,
            quality_model_min=args.quality_model_min,
            dsir_target=args.dsir_target,
            dsir_top_k=args.dsir_top_k,
            split_weights=split_weights,
            checkpoint_stages=args.checkpoint_stages,
            stopwords=(
                [w for w in args.stopwords.split(",") if w]
                if args.stopwords
                else None
            ),
        )
        print(json.dumps(summary))

    elif args.cmd == "report":
        loader = GoldLoader(spark, args.lake / "gold")
        report = build_load_report(loader.store, args.lake)
        jp, mp = write_load_report(report, args.lake / "diagnostics")
        print(f"wrote {jp} and {mp}")

    elif args.cmd == "corpus-report":
        from .corpus_report import build_corpus_report, write_corpus_report

        report = build_corpus_report(
            spark, str(args.input), bpe_merges=args.bpe_merges
        )
        jp, mp = write_corpus_report(report, args.out)
        print(json.dumps(report, sort_keys=True))

    elif args.cmd == "export-sqlite":
        loader = GoldLoader(spark, args.lake / "gold")
        counts = export_gold_to_sqlite(loader.store, args.out)
        print(json.dumps(counts))

    elif args.cmd == "index-maintain":
        from .operators.pq import (
            _cell_files,
            _recover_optimize_tmp,
            ivfpq_add,
            ivfpq_drift_stats,
            ivfpq_optimize,
            load_ivfpq_meta,
        )

        idx = str(args.index_dir)
        # crash recovery FIRST (ADVICE r11): a prior optimize that died
        # mid-swap leaves a cell's only copies parked under
        # _optimize_tmp.  Running drift/add against that index reads a
        # silently-truncated cell, and if the batch recreates the
        # missing live directory a LATER recovery would skip the cell
        # (live exists) and delete the parked originals — permanent
        # row loss.  Restoring before anything else closes both paths.
        meta, _ = load_ivfpq_meta(spark, idx)
        recovered = _recover_optimize_tmp(
            idx,
            ["codes"] + (["vectors"] if meta.get("store_vectors") else []),
        )
        batch = spark.read.parquet(str(args.batch))
        # drift is measured BEFORE the add (against the quantizers'
        # current at-rest fit — after the add the batch is part of the
        # index and dilutes its own signal)
        drift = ivfpq_drift_stats(
            spark, idx, batch, id_col=args.id_col, vec_col=args.vec_col
        )
        n_added = ivfpq_add(
            spark, idx, batch, id_col=args.id_col, vec_col=args.vec_col
        )
        over = [
            c
            for c, fs in _cell_files(str(args.index_dir / "codes")).items()
            if len(fs) > args.max_files_per_cell
        ]
        opt = (
            ivfpq_optimize(
                spark, idx, max_files_per_cell=args.max_files_per_cell
            )
            if over
            else None
        )
        reasons = []
        if (
            drift["mse_ratio"] is not None
            and drift["mse_ratio"] > args.mse_rebuild_threshold
        ):
            reasons.append(
                f"mse_ratio {drift['mse_ratio']} > "
                f"{args.mse_rebuild_threshold}"
            )
        if drift["cell_tv_distance"] > args.tv_rebuild_threshold:
            reasons.append(
                f"cell_tv_distance {drift['cell_tv_distance']} > "
                f"{args.tv_rebuild_threshold}"
            )
        print(json.dumps({
            "index_dir": idx,
            "recovered_cells": recovered,
            "n_added": n_added,
            "drift": drift,
            "compacted": opt is not None,
            "optimize": opt,
            "rebuild_recommended": bool(reasons),
            "rebuild_reason": "; ".join(reasons) or None,
        }))  # fmt: skip

    elif args.cmd == "index-stream":
        from .streaming.index_stream import stream_index_maintenance

        q = stream_index_maintenance(
            spark,
            args.source,
            args.index_dir,
            args.checkpoint,
            id_col=args.id_col,
            vec_col=args.vec_col,
            max_files_per_cell=args.max_files_per_cell,
            mse_rebuild_threshold=args.mse_rebuild_threshold,
            tv_rebuild_threshold=args.tv_rebuild_threshold,
            available_now=not args.resident,
        )
        q.awaitTermination()
        log_path = args.index_dir / "maintenance_log.jsonl"
        last = None
        if log_path.exists():
            lines = log_path.read_text().splitlines()
            last = json.loads(lines[-1]) if lines else None
        print(json.dumps({
            "index_dir": str(args.index_dir),
            "batches_logged": (
                len(log_path.read_text().splitlines())
                if log_path.exists()
                else 0
            ),
            "last_report": last,
        }))  # fmt: skip

    elif args.cmd == "retrieve":
        from .operators.pq import (
            build_ivfpq_index,
            ivfpq_topk,
            load_ivfpq_meta,
        )
        from .operators.retrieval import mmr_topk_ivfpq, mmr_topk_pooled

        emb = spark.read.parquet(str(args.embeddings))
        qrows = emb.filter(
            F.col("vec_id") == args.query_id
        ).select("embedding").collect()
        if not qrows:
            print(f"no vec_id={args.query_id}", file=sys.stderr)
            return 1
        qvec = [float(x) for x in qrows[0]["embedding"]]
        pool = args.pool_size or max(64 * args.k, 256)
        if args.exact_pool:
            out, certified = mmr_topk_pooled(
                emb, qvec, k=args.k, lam=args.lam, pool_size=pool,
                return_certificate=True,
            )  # fmt: skip
            prefetch = "exact"
            cert_scope = "corpus"  # bound covers every corpus vector
        else:
            idx = str(args.index_dir)
            if not (args.index_dir / "codebooks.json").exists():
                # fresh builds store the cell-partitioned vectors too,
                # so queries run the fully file-pruned stack
                build_ivfpq_index(
                    emb, idx, n_cells=args.n_cells, dim=len(qvec),
                    store_vectors=True,
                )  # fmt: skip
            meta, _ = load_ivfpq_meta(spark, idx)
            if meta.get("store_vectors"):
                # file-pruned stack: codes screen + cell-partitioned
                # vector pool fetch — the source corpus is never scanned
                out, certified = mmr_topk_ivfpq(
                    spark, idx, qvec, k=args.k, lam=args.lam,
                    pool_size=pool, n_probe=args.n_probe,
                    return_certificate=True,
                )  # fmt: skip
                prefetch = "ivfpq-filepruned"
                # bound covers only the ADC-screened candidate set;
                # cell+screen coverage is the separate ANN recall term
                cert_scope = "screened"
            else:
                # legacy codes-only index: prefetch candidate ids, pool
                # from the source corpus (one fused broadcast-id scan)
                candidates = ivfpq_topk(
                    spark, idx, emb, qvec,
                    k=pool, n_probe=args.n_probe, overfetch=4,
                ).select("vec_id")  # fmt: skip
                out, certified = mmr_topk_pooled(
                    emb, qvec, k=args.k, lam=args.lam, pool_size=pool,
                    return_certificate=True, candidates=candidates,
                )  # fmt: skip
                prefetch = "ivfpq"
                # bound covers only the prefetched candidate ids
                cert_scope = "candidates"
        print(json.dumps({
            "query_id": args.query_id, "k": args.k, "lam": args.lam,
            "pool_size": pool,
            "prefetch": prefetch,
            "pool_certified_sufficient": bool(certified),
            "certificate_scope": cert_scope,
            "results": [r.asDict() for r in out.collect()],
        }))  # fmt: skip

    return failed


if __name__ == "__main__":
    sys.exit(main())
