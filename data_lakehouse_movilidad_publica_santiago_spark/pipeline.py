"""End-to-end training-data corpus build.

Composes the individually-gated operators into the standard
preparation pipeline (each stage is differentially verified on its
own in analytics/corpus_gate.py; the composition itself is gated by
``corpus_build_summary``):

    quality filter → exact dedup (keep lowest id per fingerprint)
    → PII redaction → chunk into token windows → seeded global
    shuffle → shuffle-ordered parquet layout

Everything before the final write is one declarative plan; the only
driver-side state is the bounded per-partition offset map inside
``global_shuffle``. Output layout: chunks parquet range-partitioned
by shuffle position (so a sequential reader streams the corpus in
shuffle order), plus a ``summary.json`` sidecar with per-stage
counts — the observability contract the silver/gold pipelines use
(``quality.json`` / load reports).
"""

from __future__ import annotations

import gc
import json
import time
from pathlib import Path

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .functions.text import QUALITY_STOPWORDS, doc_fingerprint, quality_score
from .operators.chunking import chunk_documents, global_shuffle
from .operators.pii import redact_pii
from .operators.spread import ensure_parallelism

# sample_id = pos * 2^31 + chunk_idx. chunk_idx is a posexplode INT
# (< 2^31 by construction), so the packing's only live bound is pos:
# it must stay below 2^31 (~2.1B documents) for the product to stay
# inside bigint — guarded with raise_error at the packing site
_CHUNK_IDX_LIMIT = 1 << 31


def build_corpus(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    quality_min: float = 0.75,
    chunk_tokens: int = 64,
    overlap: int = 16,
    seed: str = "epoch-0",
    redact: bool = True,
    near_dedup: bool = False,
    near_threshold: float = 0.85,
    near_dedup_mode: str = "minhash",
    containment_k: int = 3,
    containment_max_df: int | None = None,
    sentence_dedup: bool = False,
    soft_dedup_n: int | None = None,
    lsh_est_margin: float | None = None,
    lsh_max_bucket: int | None = None,
    span_mask_window: int | None = None,
    ppl_threshold: float | None = None,
    ppl_model: str = "bigram",
    ppl_min_count: int = 1,
    select_query: str | None = None,
    select_top_k: int | None = None,
    c4: bool = False,
    c4_min_sentences: int = 5,
    c4_blocklist: tuple[str, ...] = (),
    gopher: bool = False,
    quality_model_label: str | None = None,
    quality_model_min: float = 0.5,
    quality_model_iters: int = 3,
    dsir_target: str | None = None,
    dsir_top_k: int | None = None,
    split_weights: dict[str, float] | None = None,
    checkpoint_stages: bool = False,
    stopwords: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Run the corpus build; returns the summary dict (also written
    to ``<output_dir>/summary.json``).

    ``near_dedup=True`` adds the MinHash-LSH near-duplicate stage
    after exact dedup: LSH pairs at Jaccard ≥ ``near_threshold`` →
    connected components → keep the highest-quality member per
    cluster (ties → lowest id). All the individually-gated operators
    (`minhash_lsh_near_dup`, `dedup_clusters`, `dedup_survivors`)
    composed into the product path. ``lsh_est_margin`` /
    ``lsh_max_bucket`` are the large-corpus guards against hot-bucket
    candidate explosions from shared boilerplate passages (see
    ``minhash_lsh_pairs``): the signature-estimate prune keeps exact
    verification (precision 1.0) with ~5e-6 recall loss per true
    pair at margin 0.25/num_perm 64; dropped-hot-bucket counts land
    in the summary (``lsh_hot_buckets_dropped``) — never silent.

    ``near_dedup_mode='containment'`` swaps the pair miner for the
    ASYMMETRIC containment measure (Broder 1997; gated as
    `containment_near_dup`): a pair joins a cluster when
    ``max(|A∩B|/|A|, |A∩B|/|B|)`` ≥ ``near_threshold`` — catches a
    short document embedded in a long one, which symmetric Jaccard
    misses. ``containment_k`` sets the shingle width and
    ``containment_max_df`` prunes boilerplate shingles before the
    self-join (the hot-key guard). Component closure and
    highest-quality-survivor selection are shared with the minhash
    mode.

    ``ppl_model='trigram'`` swaps the CCNet screen's scorer for the
    stupid-backoff trigram LM (Brants et al. 2007; gated as
    `trigram_ppl`): same self-trained / keep-if-NULL-or-below
    contract, sharper boilerplate separation at the cost of a
    trigram-count model (still (short string, long) shuffles only).
    ``ppl_min_count=N`` count-prunes the tri/bigram tables (the cheap
    variant of Brants' entropy pruning) — on real language the
    singleton tail IS the model, so N=2 usually shrinks it below the
    broadcast threshold and the scoring joins go map-side.

    ``select_query='w1 w2 ...'`` + ``select_top_k=K`` adds TOPICAL
    selection (gated as `tfidf_topk`): keep only the K surviving
    documents most tf-idf-cosine-similar to the bag-of-words query —
    the keyword-driven counterpart of DSIR's distribution matching
    (both compose; tf-idf runs first). The final top-K is a
    TakeOrdered merge, so K is expected to be bounded (≤ ~1e5);
    for corpus-fraction selections use ``dsir_top_k``'s rank path.
    K is a BUDGET, not a guarantee: tfidf_topk keeps only docs with a
    positive dot against the query, so when fewer than K survivors
    share any query term the stage selects fewer — the summary's
    ``n_docs_selected`` records the actual count.

    ``c4=True`` runs the C4 structural cleaning battery (Raffel et
    al. 2020, gated as `c4_rules`) FIRST: line filters rewrite each
    document (unterminated / <3-word / javascript lines dropped),
    then pages failing the ordered reason chain (lorem ipsum, curly
    brace, ``c4_blocklist`` word, fewer than ``c4_min_sentences``
    sentences) are dropped — so every later stage sees the cleaned
    text. Map-only; drops land in ``n_docs_dropped_by_c4``.

    ``sentence_dedup=True`` adds C4's corpus-global sentence dedup
    (Raffel et al. 2020 §2.2, gated as `sentence_dedup`) after the
    document-level dedups: every repeated occurrence of a sentence
    across the whole surviving corpus is cut, keeping the first
    (minimal (doc_id, position)); documents deduplicated to nothing
    are dropped. Sentences are terminal-punctuation splits
    (``split_sentences``) — the text never crosses an exchange (see
    the operator's 100 TB notes).

    ``soft_dedup_n=N`` adds SoftDeDup reweighting (He et al. 2024,
    gated as `soft_dedup`) as a SAMPLING stage: per-document word
    N-gram commonness → weight 1/(1+score) → seeded deterministic
    keep/drop realizes the weight, down-sampling boilerplate-heavy
    documents without the cliff edge of a hard near-dup threshold.
    Use it INSTEAD of ``near_dedup`` when coverage matters more than
    strict dedup (both compose if asked). Drops land in
    ``n_docs_dropped_by_soft_dedup``; the mean weight is reported.

    ``span_mask_window=N`` adds ExactSubstr masking (Lee et al.
    2022) after dedup: every N-token window occurring more than once
    in the corpus is cut out of the surviving documents (gated as
    `span_dedup`); documents masked to nothing are dropped.

    ``ppl_threshold=X`` adds the CCNet perplexity screen: a word-
    bigram LM is trained on the surviving corpus itself and documents
    with cross-entropy above X (out-of-distribution: boilerplate,
    wrong language, degenerate text) are dropped — docs too short to
    have bigram evidence are kept (gated as `lm_perplexity`).

    ``quality_model_label='<bool SQL expr>'`` adds the LEARNED quality
    screen (gated as `logreg_quality`): a logistic regression over the
    four standard text features (stopword ratio, punctuation ratio,
    scaled mean word length, scaled token count) is trained with
    ``quality_model_iters`` full-batch GD steps against the weak label
    the expression defines (e.g. ``"lang = 'en'"``; NULL evaluates as
    false), and documents scoring below ``quality_model_min`` are
    dropped. Training is iters aggregate passes (k+1 doubles to the
    driver each); scoring is a map stage with literal weights — the
    learned weights land in the summary for audit.

    ``dsir_target='<bool SQL expr>'`` + ``dsir_top_k=K`` adds DSIR
    importance resampling (gated as `dsir_selection`) as the FINAL
    selection stage: keep only the K surviving documents whose bigram
    distribution most resembles the target slice relative to the raw
    pool. Documents without bigram evidence (< 2 tokens) cannot be
    scored and are dropped by this stage.

    ``split_weights={'train': .9, 'val': .05, 'test': .05}`` adds a
    deterministic DOCUMENT-level train/val/test split (gated as
    `stratified_split`): a seeded hash of the doc id picks the split,
    so every chunk of a document shares its split (no leakage through
    overlapping chunks) and the assignment is reproducible under any
    partitioning or retry. The chunks parquet gains a ``split=<name>``
    partition level; per-split chunk counts land in the summary.

    ``checkpoint_stages=True`` bounds shuffle scratch: each stage's
    surviving corpus is written to ``<output_dir>/_stages/<stage>``
    and re-read, truncating lineage so the finished stage's shuffle
    files become collectible (pins released, py4j refs dropped, one
    JVM GC requested so ContextCleaner reclaims them). Without it a
    full five-stage build holds the UNION of every stage's shuffle
    scratch on executor-local disk until the final write — O(sum of
    stages) vs O(one stage), the difference that kills long corpus
    pipelines on disk-tight executors (measured: the 5M-doc composed
    probe ENOSPC'd an 80 GB scratch without it). The stage dirs are
    also restart points: a failed stage re-runs from the previous
    boundary, not from the raw scan. Results are identical either
    way (asserted in tests/test_pipeline_checkpoint.py)."""
    if near_dedup_mode not in ("minhash", "containment"):
        raise ValueError(
            f"near_dedup_mode must be 'minhash' or 'containment', "
            f"got {near_dedup_mode!r}"
        )
    if ppl_model not in ("bigram", "trigram"):
        raise ValueError(
            f"ppl_model must be 'bigram' or 'trigram', got {ppl_model!r}"
        )
    if (select_query is None) != (select_top_k is None):
        raise ValueError("select_query and select_top_k go together")
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    # per-stage wall clock (driver-observed, action-to-action). Spark
    # is lazy, so a stage's wall includes any upstream work its first
    # action materializes — e.g. the first enabled optional stage pays
    # for the quality filter + exact dedup above it. Totals are exact;
    # attribution is "everything since the previous materialization".
    stage_wall: dict[str, float] = {}
    t0 = time.perf_counter()

    def _mark(stage: str, since: float) -> float:
        now = time.perf_counter()
        stage_wall[stage] = round(now - since, 2)
        return now

    docs = ensure_parallelism(spark.read.parquet(input_path))
    n_raw = docs.count()
    t = _mark("scan_count", t0)

    n_c4_dropped = 0
    if c4:
        # C4 structural cleaning (Raffel et al. 2020) FIRST: the line
        # filters rewrite the text (drop unterminated/short/javascript
        # lines), then pages failing the ordered reason chain are
        # dropped — so every later stage (gopher stats, dedup
        # fingerprints, shingles, perplexity) sees the cleaned text,
        # the order production C4-style pipelines use. Map-only: one
        # filter + one rewrite, no shuffle.
        from .functions.c4 import c4_kept_lines, c4_reason

        docs = (
            docs.filter(
                c4_reason(
                    F.col(text_col),
                    min_sentences=c4_min_sentences,
                    blocklist=c4_blocklist,
                ).isNull()
            )
            .withColumn(
                text_col,
                F.array_join(c4_kept_lines(F.col(text_col)), "\n"),
            )
        )
        n_c4_dropped = n_raw - docs.count()
        t = _mark("c4_clean", t)

    stage_pins: list = []  # persisted intermediates released at the end

    def _stage_ckpt(df, stage: str):
        """checkpoint_stages boundary: parquet the stage's surviving
        corpus, release every pin, and request one JVM GC so
        ContextCleaner can delete the finished stage's shuffle files
        (unpersist alone leaves them — the ShuffleDependency stays
        strongly reachable until the plan objects are collected).
        Callers must ``del`` their block-local plan refs first."""
        path = str(out / "_stages" / stage)
        df.write.mode("overwrite").parquet(path)
        for p in stage_pins:
            p.unpersist()
        stage_pins.clear()
        gc.collect()  # detach the dropped py4j plan refs JVM-side
        spark.sparkContext._jvm.System.gc()
        return spark.read.parquet(path)

    # the stopword family feeding every quality screen: the default is
    # the English top-10, which HARDWIRES the battery to English — a
    # Spanish corpus loses ~98% of its docs at the gopher stopword-hit
    # rule alone (measured on the round-9 real-text replay fixture).
    # Language-appropriate stopwords are a per-corpus input, so they
    # are a parameter, not a constant.
    stops = list(stopwords) if stopwords is not None else QUALITY_STOPWORDS
    if gopher:
        # the published Gopher rule battery (first-match reason chain)
        # instead of the compact heuristic score
        from .functions.gopher import gopher_reason

        quality_pred = gopher_reason(F.col(text_col), stopwords=stops).isNull()
    else:
        quality_pred = (
            F.round(quality_score(F.col(text_col), stops), 2)
            >= quality_min
        )
    passed = docs.filter(quality_pred).select(id_col, text_col)
    keyed = passed.withColumn("__fp", doc_fingerprint(F.col(text_col)))
    w = Window.partitionBy("__fp")
    kept = (
        keyed.withColumn("__keeper", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__keeper"))
        .select(id_col, text_col)
    )
    del passed, keyed  # drop plan refs: their window shuffle lives on
    # in `kept`'s lineage only, so a later stage checkpoint frees it
    n_near_removed = 0
    lsh_stats: dict = {}
    if near_dedup:
        from .operators.clustering import (
            canonical_survivors,
            connected_components,
        )

        # near-dup stage needs two passes over the exact-dedup result
        # (pair mining + survivor join) — pin it for the stage
        kept = kept.persist()
        n_before = kept.count()
        mh_pins: list = []
        if near_dedup_mode == "containment":
            from .operators.containment import containment_pairs

            pairs = containment_pairs(
                kept,
                threshold=near_threshold,
                k=containment_k,
                max_df=containment_max_df,
                id_col=id_col,
                text_col=text_col,
            )
        else:
            from .operators.dedup_text import minhash_lsh_pairs

            pairs = minhash_lsh_pairs(
                kept,
                id_col,
                text_col,
                threshold=near_threshold,
                pins=mh_pins,
                est_margin=lsh_est_margin,
                max_bucket=lsh_max_bucket,
                stats=lsh_stats,
            )
        comps = connected_components(pairs, src="doc_a", dst="doc_b")
        scored = kept.withColumn(
            "__q", quality_score(F.col(text_col), stops)
        )
        survivors = canonical_survivors(
            scored.select(F.col(id_col), F.col("__q")),
            comps,
            id_col=id_col,
            score_col="__q",
        ).select(id_col)
        # materialize the survivor join, then the shingle cache and
        # the pre-dedup pin can release; the survivor frame itself is
        # released with the other stage pins after the final write
        deduped = kept.join(survivors, id_col, "inner").persist()
        stage_pins.append(deduped)
        n_near_removed = n_before - deduped.count()
        t = _mark("near_dedup", t)
        for p in mh_pins:
            p.unpersist()
        kept.unpersist()
        kept = deduped
        if checkpoint_stages:
            del pairs, comps, scored, survivors, deduped
            kept = _stage_ckpt(kept, "near_dedup")
    n_sent_removed = 0
    n_sent_emptied = 0
    if sentence_dedup:
        from .operators.sentence_dedup import (
            sentence_dedup as _sentence_dedup,
            split_sentences,
        )

        kept = kept.persist()
        kept.count()
        cleaned = _sentence_dedup(
            kept, split_sentences(F.col(text_col)), id_col=id_col
        )
        resent = (
            kept.drop(text_col)
            .join(cleaned.withColumnRenamed("doc_id", id_col), id_col)
            .withColumnRenamed("text_clean", text_col)
            .persist()
        )
        stage_pins.append(resent)
        srow = resent.agg(
            F.sum("n_removed").alias("r"),
            F.sum((F.length(F.col(text_col)) == 0).cast("int")).alias("e"),
        ).collect()[0]
        n_sent_removed = int(srow["r"] or 0)
        n_sent_emptied = int(srow["e"] or 0)
        t = _mark("sentence_dedup", t)
        kept.unpersist()
        kept = resent.filter(F.length(F.col(text_col)) > 0).drop(
            "n_sentences", "n_removed"
        )
        if checkpoint_stages:
            del cleaned, resent
            kept = _stage_ckpt(kept, "sentence_dedup")
    n_soft_dropped = 0
    soft_avg_weight = None
    if soft_dedup_n is not None:
        from .operators.soft_dedup import soft_dedup as _soft_dedup

        kept = kept.persist()
        n_presoft = kept.count()
        verdicts = _soft_dedup(
            kept,
            n=soft_dedup_n,
            seed=f"softdedup:{seed}",
            id_col=id_col,
            text_col=text_col,
        ).persist()
        soft_avg_weight = float(
            round(verdicts.agg(F.avg("weight")).collect()[0][0] or 1.0, 4)
        )
        keep_ids = verdicts.filter(F.col("kept")).select(
            F.col("doc_id").alias(id_col)
        )
        softened = kept.join(keep_ids, id_col, "inner").persist()
        stage_pins.append(softened)
        n_soft_dropped = n_presoft - softened.count()
        t = _mark("soft_dedup", t)
        verdicts.unpersist()
        kept.unpersist()
        kept = softened
        if checkpoint_stages:
            del verdicts, keep_ids, softened
            kept = _stage_ckpt(kept, "soft_dedup")
    n_mask_emptied = 0
    if span_mask_window is not None:
        from .operators.span_dedup import mask_duplicated_spans

        kept = kept.persist()
        n_premask = kept.count()
        mask_pins: list = []
        masked = mask_duplicated_spans(
            kept,
            window=span_mask_window,
            id_col=id_col,
            text_col=text_col,
            pins=mask_pins,
        )
        remasked = (
            kept.drop(text_col)
            .join(masked.withColumnRenamed("doc_id", id_col), id_col)
            .withColumnRenamed("kept_text", text_col)
            .filter(F.length(F.col(text_col)) > 0)
            .persist()
        )
        stage_pins.append(remasked)
        n_mask_emptied = n_premask - remasked.count()
        t = _mark("span_mask", t)
        for p in mask_pins:  # window-hash cache: done once remasked is hot
            p.unpersist()
        kept.unpersist()
        kept = remasked
        if checkpoint_stages:
            del masked, remasked
            kept = _stage_ckpt(kept, "span_mask")
    n_lm_dropped = 0
    if ppl_threshold is not None:
        kept = kept.persist()
        n_prelm = kept.count()
        if ppl_model == "trigram":
            from .operators.lm_filter import (
                score_stupid_backoff,
                train_trigram_lm,
            )

            model_tri = train_trigram_lm(
                kept, text_col=text_col, min_count=ppl_min_count
            )
            scored = score_stupid_backoff(
                kept, model_tri, id_col=id_col, text_col=text_col
            )
        else:
            from .operators.lm_filter import (
                score_perplexity,
                train_bigram_lm,
            )

            model = train_bigram_lm(kept, text_col=text_col)
            scored = score_perplexity(
                kept, model, id_col=id_col, text_col=text_col
            )
        survivors_lm = scored.filter(
            F.col("cross_entropy").isNull()
            | (F.col("cross_entropy") <= F.lit(ppl_threshold))
        ).select(F.col("doc_id").alias(id_col))
        screened = kept.join(survivors_lm, id_col, "inner").persist()
        stage_pins.append(screened)
        n_lm_dropped = n_prelm - screened.count()
        t = _mark("ppl_screen", t)
        kept.unpersist()
        kept = screened
        if checkpoint_stages:
            del scored, survivors_lm, screened
            kept = _stage_ckpt(kept, "ppl_screen")
    n_qm_dropped = 0
    qm_weights: list[float] | None = None
    if quality_model_label is not None:
        from .functions.text import (
            mean_word_length,
            punct_ratio,
            stopword_ratio,
            token_count,
        )
        from .operators.logreg import logreg_fit, logreg_score

        kept = kept.persist()
        n_preqm = kept.count()
        # the weak-label expression may reference metadata columns
        # (lang, source, …) that the dedup projection dropped — so it
        # is evaluated against the RAW input frame and joined in by id
        labels = docs.select(
            F.col(id_col),
            # when/otherwise so a NULL predicate labels 0.0 instead of
            # NULL-propagating into the gradient averages
            F.when(F.expr(quality_model_label), 1.0)
            .otherwise(0.0)
            .alias("__label"),
        )
        feats = (
            kept.join(labels, id_col)
            .select(
                F.col(id_col),
                F.col("__label"),
                stopword_ratio(F.col(text_col), stops).alias(
                    "__f1"
                ),
                punct_ratio(F.col(text_col)).alias("__f2"),
                (mean_word_length(F.col(text_col)) / F.lit(10.0)).alias(
                    "__f3"
                ),
                (token_count(F.col(text_col)) / F.lit(100.0)).alias("__f4"),
            )
            .persist()  # feeds iters gradient passes + the scoring pass
        )
        fcols = ["__f1", "__f2", "__f3", "__f4"]
        qm_weights = logreg_fit(
            feats, fcols, "__label", iters=quality_model_iters, lr=1.0
        )
        keep_ids = (
            logreg_score(feats, qm_weights, fcols, out_col="__p")
            .filter(F.col("__p") >= F.lit(quality_model_min))
            .select(id_col)
        )
        screened_qm = kept.join(keep_ids, id_col, "inner").persist()
        stage_pins.append(screened_qm)
        n_qm_dropped = n_preqm - screened_qm.count()
        t = _mark("quality_model", t)
        feats.unpersist()
        kept.unpersist()
        kept = screened_qm
        if checkpoint_stages:
            del labels, feats, keep_ids, screened_qm
            kept = _stage_ckpt(kept, "quality_model")
    n_select_dropped = 0
    n_selected = None
    if select_query is not None:
        from .operators.retrieval import tfidf_topk

        terms = [w for w in select_query.split() if w]
        if not terms:
            raise ValueError("select_query must contain at least one term")
        kept = kept.persist()
        n_presel = kept.count()
        sel_ids = tfidf_topk(
            kept,
            terms,
            top_k=select_top_k,
            id_col=id_col,
            text_col=text_col,
        ).select(F.col("doc_id").alias(id_col))
        # the selection is ≤ top_k rows — broadcast it into the join
        selected_tf = kept.join(
            F.broadcast(sel_ids), id_col, "inner"
        ).persist()
        stage_pins.append(selected_tf)
        # tfidf_topk keeps only dot > 0 docs, so the selection can come
        # back SHORT of select_top_k when few survivors share a query
        # term — record what was actually selected, not the budget
        n_selected = selected_tf.count()
        n_select_dropped = n_presel - n_selected
        t = _mark("tfidf_select", t)
        kept.unpersist()
        kept = selected_tf
        if checkpoint_stages:
            del sel_ids, selected_tf
            kept = _stage_ckpt(kept, "tfidf_select")
    n_dsir_dropped = 0
    if dsir_target is not None:
        if dsir_top_k is None:
            raise ValueError("dsir_target requires dsir_top_k")
        from .operators.lm_filter import dsir_select, dsir_select_rank

        kept = kept.persist()
        n_predsir = kept.count()
        # like the quality-model label, the target expression is
        # evaluated against the raw frame (metadata columns survive
        # there) and carried into the survivors as a boolean column
        tgt = docs.select(
            F.col(id_col),
            F.coalesce(
                F.expr(dsir_target).cast("boolean"), F.lit(False)
            ).alias("__target"),
        )
        dsir_pins: list = []
        if dsir_top_k > 10_000:
            # large slice: distributed-rank path (a TakeOrdered merge
            # of millions of candidate rows would be driver-bound)
            sel = dsir_select_rank(
                kept.join(tgt, id_col),
                F.col("__target"),
                top_k=dsir_top_k,
                id_col=id_col,
                text_col=text_col,
                pins=dsir_pins,
            )
        else:
            sel = dsir_select(
                kept.join(tgt, id_col),
                F.col("__target"),
                top_k=dsir_top_k,
                id_col=id_col,
                text_col=text_col,
            )
        sel_ids = sel.select(F.col("doc_id").alias(id_col))
        selected = kept.join(sel_ids, id_col, "inner").persist()
        stage_pins.append(selected)
        n_dsir_dropped = n_predsir - selected.count()
        t = _mark("dsir_select", t)
        for p in dsir_pins:  # rank shuffle pin: done once selected is hot
            p.unpersist()
        kept.unpersist()
        kept = selected
        if checkpoint_stages:
            del tgt, sel, sel_ids, selected
            kept = _stage_ckpt(kept, "dsir_select")
    if redact:
        kept = kept.withColumn(text_col, redact_pii(F.col(text_col)))
    # persist: kept feeds the count, the chunker AND the shuffle-rank
    # passes; recomputing the dedup window per consumer would triple
    # the heaviest shuffle
    kept = kept.persist()
    n_kept = kept.count()
    t = _mark("filter_dedup_redact", t)

    chunks = chunk_documents(
        kept,
        chunk_tokens=chunk_tokens,
        overlap=overlap,
        id_col=id_col,
        text_col=text_col,
    )
    pins: list = []
    order = global_shuffle(kept, seed=seed, id_col=id_col, pins=pins)
    laid_out = (
        chunks.join(order.select("doc_id", "pos"), "doc_id")
        .withColumn(
            "sample_id",
            # chunk_idx is a 32-bit posexplode int (< 2^31 by type),
            # so the packing's live failure mode is pos: fail loudly
            # before pos * 2^31 leaves bigint range (>= 2^31 docs)
            F.when(
                F.col("pos") >= F.lit(_CHUNK_IDX_LIMIT),
                F.raise_error(
                    F.concat(
                        F.lit("pos overflows sample_id packing: "),
                        F.col("pos").cast("string"),
                    )
                ).cast("long"),
            ).otherwise(
                F.col("pos") * F.lit(_CHUNK_IDX_LIMIT) + F.col("chunk_idx")
            ),
        )
    )
    if split_weights:
        # DOCUMENT-level split on the stable doc id (all chunks of a
        # doc land in one split — no train/val leakage through chunk
        # overlap), written as split=<name> partition directories;
        # files inside each split stay range-ordered by sample_id
        from .operators.data_mix import split_assign

        laid_out = split_assign(
            laid_out, split_weights, id_col="doc_id",
            seed=f"{seed}:split",
        )  # fmt: skip
    chunks_path = str(out / "chunks.parquet")
    writer = (
        laid_out.repartitionByRange(
            max(spark.sparkContext.defaultParallelism, 1), "sample_id"
        )
        .sortWithinPartitions("sample_id")
        .write.mode("overwrite")
    )
    if split_weights:
        writer = writer.partitionBy("split")
    writer.parquet(chunks_path)
    written = spark.read.parquet(chunks_path)
    n_chunks = written.count()
    n_tokens = written.agg(F.sum("n_tok")).collect()[0][0]
    split_chunks = (
        {
            r["split"]: r["c"]
            for r in written.groupBy("split").agg(F.count("*").alias("c")).collect()
        }
        if split_weights
        else None
    )
    t = _mark("chunk_shuffle_write", t)
    kept.unpersist()
    for p in pins:  # release the shuffle-rank pin (ours alone — a
        p.unpersist()  # shared session's other caches stay intact)
    for p in stage_pins:  # near-dedup survivor frame, if that stage ran
        p.unpersist()

    summary = {
        "input": str(input_path),
        "n_docs_raw": n_raw,
        "n_docs_kept": n_kept,
        "c4": c4,
        "n_docs_dropped_by_c4": int(n_c4_dropped),
        "near_dedup": near_dedup,
        "near_dedup_mode": near_dedup_mode if near_dedup else None,
        "containment_k": (
            containment_k
            if near_dedup and near_dedup_mode == "containment"
            else None
        ),
        "containment_max_df": (
            containment_max_df
            if near_dedup and near_dedup_mode == "containment"
            else None
        ),
        "n_near_dups_removed": int(n_near_removed),
        "lsh_est_margin": lsh_est_margin if near_dedup else None,
        "lsh_max_bucket": lsh_max_bucket if near_dedup else None,
        "lsh_hot_buckets_dropped": lsh_stats.get("hot_buckets_dropped"),
        "lsh_banded_rows_dropped": lsh_stats.get("banded_rows_dropped"),
        "sentence_dedup": sentence_dedup,
        "n_sentences_removed": int(n_sent_removed),
        "n_docs_emptied_by_sentence_dedup": int(n_sent_emptied),
        "soft_dedup_n": soft_dedup_n,
        "soft_dedup_avg_weight": soft_avg_weight,
        "n_docs_dropped_by_soft_dedup": int(n_soft_dropped),
        "span_mask_window": span_mask_window,
        "n_docs_emptied_by_mask": int(n_mask_emptied),
        "ppl_threshold": ppl_threshold,
        "ppl_model": ppl_model if ppl_threshold is not None else None,
        "ppl_min_count": (
            ppl_min_count if ppl_threshold is not None else None
        ),
        "n_docs_dropped_by_ppl": int(n_lm_dropped),
        "select_query": select_query,
        "select_top_k": select_top_k,
        "n_docs_selected": (
            int(n_selected) if n_selected is not None else None
        ),
        "n_docs_dropped_by_select": int(n_select_dropped),
        "gopher": gopher,
        "quality_model_label": quality_model_label,
        "quality_model_min": quality_model_min if quality_model_label else None,
        "quality_model_weights": qm_weights,
        "n_docs_dropped_by_quality_model": int(n_qm_dropped),
        "dsir_target": dsir_target,
        "dsir_top_k": dsir_top_k,
        "n_docs_dropped_by_dsir": int(n_dsir_dropped),
        "split_weights": split_weights,
        "n_chunks_per_split": split_chunks,
        "checkpoint_stages": checkpoint_stages,
        "n_chunks": int(n_chunks),
        "n_tokens": int(n_tokens or 0),
        "quality_min": quality_min,
        "custom_stopwords": stopwords is not None,
        "chunk_tokens": chunk_tokens,
        "overlap": overlap,
        "seed": seed,
        "redacted": redact,
        "chunks_path": chunks_path,
        "stage_wall_s": stage_wall,
        "total_wall_s": round(time.perf_counter() - t0, 2),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    return summary
