"""Training-data pipeline ops: decontamination, deterministic weighted
sampling, token-budget shard packing.

Three operations every large-scale training-data build needs beyond
dedup (all Column-expression / JVM-side — no Python in the hot path):

- ``contamination_pairs``: which training documents share verbatim
  char-k-gram shingles with an evaluation set (train/test leakage
  scan). Shingles are md5-hashed so only (id, hash) rows cross the
  shuffle; the eval shingle set is DISTINCT-ed before the join.
- ``sample_mix``: seeded deterministic weighted sampling per category
  (domain/language rebalancing). The keep decision is a pure hash of
  (seed, doc id) — re-running anywhere, any partitioning, any cluster
  size reproduces the same sample; no RNG state, no ``rand()``
  nondeterminism under task retries.
- ``pack_shards``: assign documents to fixed token-budget shards by
  exclusive running token count — the deterministic streaming-packing
  layout step before sequence packing. Implemented as a two-pass
  distributed prefix sum (per-partition window + bounded driver-side
  partition offsets), NOT a global single-partition window, so it
  scales to any corpus size.
- ``pack_sequences``: GPT-style concatenate-and-cut packing — the
  corpus token stream is cut into fixed-length training sequences,
  docs crossing a boundary split across sequences (no padding waste).
  Same distributed prefix sum (``token_offsets``) + a bounded
  per-doc sequence fan-out.
- ``temperature_mix``: per-domain sampling budgets ∝ count^alpha
  (α=1 proportional → α=0 uniform), the standard domain-rebalancing
  knob; one bounded groupBy, then the same seeded-hash keep decision
  as ``sample_mix`` inlined as literals (map-only, no join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Spark regexp_replace replaces ALL matches (its 4th arg is a position,
# not flags); the DuckDB oracle needs an explicit 'g' flag instead
_NORM = "trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' '))"


def _shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(doc_id, shingle md5) rows: one per char-k-gram position of the
    normalized text — the same normalization/gram recipe as the
    winnowing fingerprints (dedup_text.py), minus the window-min.

    The shingle key is the md5 as BINARY(16) (``unhex``) rather than
    32-hex text (round-12, guide §2.3 'narrower types'): it is a pure
    set key — joined, distinct-ed and counted, never surfaced — and
    unhex is bijective, so every distinct/join result is identical
    while the key's shuffle bytes halve (the (doc_id, shingle)
    DISTINCT is the operator's only corpus-wide exchange)."""
    norm = F.expr(_NORM.format(c=text_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), norm.alias("__nrm"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.length("__nrm") - F.lit(k - 1), F.lit(1)
                    ),
                )
            ).alias("__pos"),
            "__nrm",
        )
        .select(
            "doc_id",
            F.unhex(
                F.md5(F.expr(f"substr(__nrm, __pos, {k})"))
            ).alias("shingle"),
        )
    )


def contamination_pairs(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
) -> DataFrame:
    """Per contaminated train doc: how many DISTINCT eval shingles it
    contains (``n_shared`` ≥ 1). Docs with zero overlap are absent —
    the survivors of the decontamination filter are the anti-join.

    Scale: shuffles carry (doc_id, 32-hex) rows only; the eval shingle
    set is distinct-ed (and typically broadcastable — eval suites are
    small next to training corpora)."""
    from .spread import ensure_parallelism

    train_sh = _shingle_hashes(
        ensure_parallelism(train), id_col, text_col, k
    ).distinct()
    eval_sh = (
        _shingle_hashes(ensure_parallelism(eval_set), id_col, text_col, k)
        .select("shingle")
        .distinct()
    )
    return (
        train_sh.join(eval_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


def _uniform_hash(id_col: Column, seed: str) -> Column:
    """Deterministic uniform [0, 1) from (seed, id): first 8 hex chars
    of md5 over 16^8 — bit-identical in Spark and DuckDB."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        float(16**8)
    )


def sample_mix(
    df: DataFrame,
    fractions: dict[str, float],
    category_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix-v1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Seeded deterministic weighted sample: keep a row iff
    ``uniform_hash(seed, id) < fractions[category]``. Reproducible
    across runs/cluster layouts (unlike ``rand()``), and the oracle
    can replay the exact decision in SQL."""
    frac = None
    for cat, f in sorted(fractions.items()):
        cond = F.col(category_col) == F.lit(cat)
        frac = (
            F.when(cond, F.lit(float(f)))
            if frac is None
            else frac.when(cond, F.lit(float(f)))
        )
    frac = (
        frac.otherwise(F.lit(float(default_fraction)))
        if frac is not None
        else F.lit(float(default_fraction))
    )
    return df.filter(_uniform_hash(F.col(id_col), seed) < frac)


def token_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int | None = None,
    pins: list | None = None,
) -> DataFrame:
    """(doc_id, n_tok, tok_begin): each doc's EXCLUSIVE running token
    count in ``id_col`` order — the global offset of its first token
    in the concatenated corpus token stream. The shared primitive
    under ``pack_shards`` and ``pack_sequences``.

    Scale: a naive ``SUM() OVER (ORDER BY id)`` is a single-partition
    window (the whole corpus through one task). This is the standard
    two-pass distributed prefix sum instead: range-partition by id,
    per-partition window cumsum, then add bounded driver-side
    partition offsets (#partitions values — metadata-sized).

    ``n_parts`` defaults to max(32, defaultParallelism) so a big
    cluster spreads the corpus without the caller remembering a
    kwarg. ``pins``: see ``global_shuffle`` — the range-partitioned
    intermediate stays persisted until the result is consumed; pass a
    list to receive the handle and unpersist it after your final
    action (or route through ``spread.release_pins``)."""
    from .spread import default_range_parts

    if n_parts is None:
        n_parts = default_range_parts(df)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
    )
    # persist: the range shuffle's sampled bounds are not guaranteed
    # identical across re-executions, and pass 2 + the final join must
    # see the SAME partitioning as pass 1 (MEMORY_AND_DISK: eviction
    # spills rather than drops, so the pinning survives pressure).
    # Long-lived multi-corpus sessions can clearCache() between runs.
    parts = (
        toks.repartitionByRange(n_parts, "doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    if pins is not None:
        pins.append(parts)
    w = (
        Window.partitionBy("__pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parts.withColumn(
        "__local_prior", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    )
    # pass 2: per-partition totals → exclusive offsets (bounded: one
    # row per partition, safe to collect; RangePartitioning assigns
    # ascending key ranges to ascending partition ids)
    totals = {
        r["__pid"]: r["t"]
        for r in parts.groupBy("__pid")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_df = local.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()],
        "__pid int, __offset bigint",
    )
    return local.join(F.broadcast(off_df), "__pid").select(
        "doc_id",
        "n_tok",
        (F.col("__offset") + F.col("__local_prior")).alias("tok_begin"),
    )


def pack_shards(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Assign each doc a ``shard_id`` = floor(exclusive running token
    count / budget) in ``id_col`` order — the deterministic layout step
    that packs a corpus into fixed token-budget shards. Offsets come
    from ``token_offsets`` (two-pass distributed prefix sum — see its
    docstring for the scale rationale and the ``pins`` contract)."""
    return token_offsets(
        df, id_col=id_col, text_col=text_col, n_parts=n_parts, pins=pins
    ).select(
        "doc_id",
        "n_tok",
        F.floor(F.col("tok_begin") / F.lit(budget_tokens)).alias(
            "shard_id"
        ),
    )


def pack_sequences(
    df: DataFrame,
    seq_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Concatenate-and-cut sequence packing: the corpus token stream
    (docs in ``id_col`` order) is cut into fixed ``seq_tokens``-length
    training sequences, documents crossing a boundary are split.  One
    output row per (document, sequence) overlap:

    - ``seq_id``       — which training sequence the slice lands in
    - ``doc_off``      — first token of the slice within the document
    - ``seq_off``      — its position within the sequence
    - ``slice_tok``    — slice length; per document Σ slice_tok =
      n_tok, per sequence Σ slice_tok = seq_tokens (except the tail)

    This is the standard GPT-style packing layout (no padding waste —
    boundary docs continue in the next sequence) expressed as one
    declarative plan over ``token_offsets``: the only corpus-wide
    shuffle is the range partition of the prefix sum; the per-doc
    sequence fan-out is a bounded ``explode(sequence(...))`` (a doc
    spans ceil(n_tok/seq_tokens)+1 sequences at most)."""
    offs = token_offsets(
        df, id_col=id_col, text_col=text_col, n_parts=n_parts, pins=pins
    )
    n = F.lit(int(seq_tokens))
    first = F.floor(F.col("tok_begin") / n)
    last = F.floor((F.col("tok_begin") + F.col("n_tok") - 1) / n)
    spanned = offs.select(
        "doc_id",
        "n_tok",
        "tok_begin",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    slice_begin = F.greatest(F.col("tok_begin"), F.col("seq_id") * n)
    slice_end = F.least(
        F.col("tok_begin") + F.col("n_tok"), (F.col("seq_id") + 1) * n
    )
    return spanned.select(
        "doc_id",
        "n_tok",
        "seq_id",
        (slice_begin - F.col("tok_begin")).alias("doc_off"),
        (slice_begin - F.col("seq_id") * n).alias("seq_off"),
        (slice_end - slice_begin).alias("slice_tok"),
    )


def temperature_mix(
    df: DataFrame,
    alpha: float,
    target_total: int,
    category_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "temp-v1",
) -> DataFrame:
    """Temperature-weighted domain sampling: draw ~``target_total``
    documents with per-domain budgets ∝ count^``alpha`` — the standard
    rebalancing between proportional sampling (α=1) and uniform-per-
    domain (α=0) used when mixing web/code/reference domains for
    training. Each domain's keep probability is

        p_d = min(1, target_total · count_d^α / Σ count^α / count_d)

    rounded to 6 digits (so an oracle replaying the formula in another
    engine lands on the same literal), and the per-row decision is the
    same seeded ``uniform_hash(seed, id) < p_d`` as ``sample_mix`` —
    deterministic under any partitioning / retry / cluster size.

    Scale: one groupBy over the category column (bounded: one row per
    domain comes back to the driver), then a map-only filter with the
    probabilities inlined as literals — no second shuffle, no join.
    Rows keep their columns plus ``keep_prob`` for audit."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    counts = {
        r["c"]: r["n"]
        for r in df.groupBy(F.col(category_col).alias("c"))
        .agg(F.count("*").alias("n"))
        .collect()
        if r["c"] is not None  # NULL domain → no budget, rows dropped
    }
    denom = sum(float(n) ** alpha for _, n in sorted(counts.items()))
    probs = {
        cat: round(
            min(1.0, target_total * (float(n) ** alpha) / denom / n), 6
        )
        for cat, n in counts.items()
    }
    prob = None
    for cat, p in sorted(probs.items()):
        cond = F.col(category_col) == F.lit(cat)
        prob = (
            F.when(cond, F.lit(p))
            if prob is None
            else prob.when(cond, F.lit(p))
        )
    prob = F.lit(0.0) if prob is None else prob.otherwise(F.lit(0.0))
    return df.withColumn("keep_prob", prob).filter(
        _uniform_hash(F.col(id_col), seed) < F.col("keep_prob")
    )


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic stratified split (train/val/test): each row gets
    the first split whose cumulative weight bound exceeds
    ``uniform_hash(seed, id)``. Splits are disjoint, exhaustive
    (weights are normalized), and reproducible under any partitioning
    / retry / cluster size — the same guarantees as ``sample_mix``,
    and the same reason not to use ``rand()``: a retried task must
    not reassign rows. Iteration order of ``weights`` defines the
    interval order, so pass an ordered mapping."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = _uniform_hash(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += float(weights[name]) / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    return df.withColumn(
        out_col, last if expr is None else expr.otherwise(last)
    )


def contamination_matrix(
    train: DataFrame,
    eval_sets: dict[str, DataFrame],
    group_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
) -> DataFrame:
    """Per-benchmark decontamination accounting: for each eval set in
    ``eval_sets`` (benchmark name → DataFrame), how many train
    documents share at least one normalized char-``k``-gram with it —
    optionally broken down by a train-side ``group_col`` (e.g.
    source/domain), the report a release audit publishes next to the
    single-set :func:`contamination_pairs` filter.

    Output: one row per (benchmark[, group]) —
    ``benchmark``, [group], ``n_contaminated`` (train docs with ≥1
    shared shingle), ``shared_occurrences`` (total distinct
    (doc, shingle) hits). Ungrouped, benchmarks with zero overlap
    still appear (n_contaminated = 0) so a clean audit is
    distinguishable from a missing one; grouped, absent
    (benchmark, group) combinations mean zero.

    Scale: train shingles are computed ONCE and reused across
    benchmarks; eval shingle sets are distinct-ed, tagged with the
    benchmark name, and unioned — the probe join carries (32-hex,
    name) rows against (doc_id, 32-hex), i.e. eval-suite-sized ×
    corpus-shingle-sized on the hash key; eval suites are tiny next
    to training corpora, so Catalyst broadcasts the union."""
    from .spread import ensure_parallelism

    gcols = [group_col] if group_col else []
    base = ensure_parallelism(train)
    norm_cols = base.select(
        F.col(id_col).alias("doc_id"), *gcols, F.col(text_col)
    )
    train_sh = (
        _shingle_hashes(norm_cols, "doc_id", text_col, k)
        .distinct()
        .join(norm_cols.select("doc_id", *gcols), "doc_id")
        if gcols
        else _shingle_hashes(norm_cols, "doc_id", text_col, k).distinct()
    )
    tagged = None
    for name in sorted(eval_sets):
        sh = (
            _shingle_hashes(
                ensure_parallelism(eval_sets[name]), id_col, text_col, k
            )
            .select("shingle")
            .distinct()
            .select(F.lit(name).alias("benchmark"), "shingle")
        )
        tagged = sh if tagged is None else tagged.unionByName(sh)
    if tagged is None:
        raise ValueError("contamination_matrix requires ≥1 eval set")
    hits = (
        train_sh.join(F.broadcast(tagged), "shingle")
        .groupBy("benchmark", *gcols, "doc_id")
        .agg(F.count("*").alias("__n_sh"))
        .groupBy("benchmark", *gcols)
        .agg(
            F.count("*").alias("n_contaminated"),
            F.sum("__n_sh").alias("shared_occurrences"),
        )
    )
    if gcols:
        return hits
    names = train.sparkSession.createDataFrame(
        [(n,) for n in sorted(eval_sets)], ["benchmark"]
    )
    return (
        names.join(hits, "benchmark", "left")
        .select(
            "benchmark",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.coalesce("shared_occurrences", F.lit(0)).alias(
                "shared_occurrences"
            ),
        )
    )


def doremi_weights(
    docs: DataFrame,
    domain_col: str,
    iters: int = 3,
    eta: float = 0.5,
    smoothing: float = 0.2,
    text_col: str = "text",
    pins: list | None = None,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al., "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    NeurIPS 2023), with a closed-form excess loss in place of the
    proxy-model training loop: the per-domain excess of the
    corpus-average unigram LM over the domain's own unigram LM,

        excess(d) = CE_d(corpus LM) - CE_d(domain LM)
                  = KL( unigram(d) || unigram(corpus) ),

    which is >= 0, zero iff the domain matches the corpus average, and
    large for domains the shared model fits worst -- the quantity
    DoReMi's multiplicative-weights player upweights. The weights then
    follow the paper's exponentiated-gradient update with uniform
    smoothing, run for a fixed ``iters``:

        u_t(d)   = a_{t-1}(d) * exp(eta * excess(d))
        a_t(d)   = (1 - smoothing) * u_t(d) / sum(u_t) + smoothing / K

    Determinism: excess is a pure aggregate of the corpus (no RNG, no
    model init); the update is a fixed-point-free finite loop -- any
    partitioning, retry, or cluster size reproduces identical weights.

    Execution shape at 100 TB: ONE (domain, word) count shuffle with
    map-side combine builds both LMs (the corpus LM is the domain
    marginal -- no second pass over the text); KL is one aggregate
    over the (domain, word) relation; the update loop runs on the
    K-row domain frame (K = #domains, bounded and tiny), where the
    per-step normalization is a window over that K-row frame --
    single-partition BY DESIGN, like the NTILE-over-25-nations
    business shape. The (domain, word) relation has FOUR consumers
    (corpus marginal, domain totals, grand total, the KL join): pass
    ``pins`` to persist it so the text is scanned once -- without a
    pin Catalyst re-evaluates the token explode per consumer. Pin
    when vocab << corpus (real language); measured counterpoint
    (SCALE.md r7): on a word-per-doc hex-soup corpus the pin ran
    1.5x SLOWER than four columnar re-scans, because the cached
    relation is itself corpus-sized. The plan pin in
    tests/test_corpus_plans.py locks the pinned shape to one
    Generate. The caller releases the pins.

    Output: one row per domain -- ``n_docs``, ``n_tokens``,
    ``base_share`` (token share, rounded 6), ``excess_loss`` (nats,
    rounded 4), ``weight`` (final a_T, rounded 4; sums to ~1).

    Every domain present in ``docs`` appears in the output, including
    domains whose documents contain zero non-empty tokens: such a
    domain has no unigram LM, so it carries ``n_tokens`` 0,
    ``base_share`` 0, ``excess_loss`` 0.0 (no excess evidence) and
    participates in the update loop -- it keeps the smoothing-floor
    weight rather than silently vanishing and renormalizing the rest
    (round-7 ADVICE fix)."""
    from pyspark.sql import Window

    dw = (
        docs.select(
            F.col(domain_col).alias("domain"),
            F.explode(F.split(F.col(text_col), " ")).alias("__w"),
        )
        .filter(F.col("__w") != "")
        .groupBy("domain", "__w")
        .agg(F.count("*").alias("__cd"))
    )
    if pins is not None:
        dw = dw.persist()
        pins.append(dw)
    # corpus counts are the domain marginals of the SAME relation
    cw = dw.groupBy("__w").agg(F.sum("__cd").alias("__cc"))
    tot = dw.agg(F.sum("__cd").alias("__t")).select("__t")
    td = dw.groupBy("domain").agg(F.sum("__cd").alias("__td"))
    ndocs = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )
    kl = (
        dw.join(cw, "__w")
        .join(td, "domain")
        .crossJoin(F.broadcast(tot))
        .groupBy("domain")
        .agg(
            F.sum(
                F.col("__cd")
                * (
                    F.log(F.col("__cd") / F.col("__td"))
                    - F.log(F.col("__cc") / F.col("__t"))
                )
            ).alias("__kl_sum"),
            F.first("__td").alias("n_tokens"),
            F.first("__t").alias("__t"),
        )
        .select(
            "domain",
            "n_tokens",
            (F.col("n_tokens") / F.col("__t")).alias("__share"),
            (F.col("__kl_sum") / F.col("n_tokens")).alias("__excess"),
        )
    )
    # ALL domains enter the update loop: a token-less domain is absent
    # from the (domain, word) relation, so left-join from ndocs and
    # default its share/excess to 0 (keeps the smoothing floor)
    kl = ndocs.join(kl, "domain", "left").select(
        "domain",
        "n_docs",
        F.coalesce(F.col("n_tokens"), F.lit(0).cast("bigint")).alias(
            "n_tokens"
        ),
        F.coalesce(F.col("__share"), F.lit(0.0)).alias("__share"),
        F.coalesce(F.col("__excess"), F.lit(0.0)).alias("__excess"),
    )
    # multiplicative-weights loop on the K-row domain frame
    w_all = Window.partitionBy()
    cur = kl.withColumn(
        "__a", F.lit(1.0) / F.count("*").over(w_all)
    ).withColumn("__k", F.count("*").over(w_all))
    s = float(smoothing)
    for _ in range(iters):
        cur = cur.withColumn(
            "__u", F.col("__a") * F.exp(F.lit(float(eta)) * F.col("__excess"))
        ).withColumn(
            "__a",
            F.lit(1.0 - s) * F.col("__u") / F.sum("__u").over(w_all)
            + F.lit(s) / F.col("__k"),
        )
    out = cur.select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round(F.col("__share"), 6).alias("base_share"),
        F.round(F.col("__excess"), 4).alias("excess_loss"),
        F.round(F.col("__a"), 4).alias("weight"),
    )
    return out
