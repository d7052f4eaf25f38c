"""BM25 full-text retrieval over a document corpus.

Okapi BM25 (Robertson & Zaragoza, "The Probabilistic Relevance
Framework: BM25 and Beyond", FnTIR 2009) with the Lucene idf variant
— the standard sparse-retrieval baseline a training-data platform
needs next to its dense (embedding kNN / IVF) path, e.g. for
RAG retrieval ablations and contamination audits by keyword.

    score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1)
                             / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t) = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

Execution shape, built for the 100 TB corpus:

- A cheap map-side candidate prune: ``arrays_overlap`` keeps only
  documents containing at least one query term BEFORE anything
  explodes — at scale this is the inverted-index lookup expressed
  declaratively (with the corpus bucketed by term buckets, Catalyst
  prunes further; here the filter rides the parquet scan).
- Term frequencies come from per-row array expressions (no explode,
  no shuffle): one ``size(filter(tokens, = term))`` per query term.
- ``df``/``N``/``avgdl`` are one tiny aggregate each; the per-term
  idf table is a handful of rows — broadcast by construction.
- Final ranking is ``TakeOrderedAndProject`` (top-k, never a global
  sort).

The per-document score is a single fixed expression tree over the
query's terms, so its floating-point evaluation order is
deterministic — important for the differential gate and for
reproducible retrieval runs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _fold_norm


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_k`` documents for the bag-of-words query, scored by
    BM25. Ties (after rounding to 4 decimals) break on ascending
    doc_id so the ranking is total and reproducible.

    Output: (doc_id, score rounded to 4, one ``tf_<term>`` column per
    query term for explainability — term text sanitized to a safe
    identifier, case-insensitive collisions disambiguated by index,
    since raw query text must never reach the column namespace)."""
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    # internal columns are POSITIONAL (tf_0, tf_1, ...): a term like
    # "u.s" would parse as a struct access, and "The"/"the" collide
    # under Spark's case-insensitive resolver
    idx = list(range(len(terms)))
    toks = F.split(F.col(text_col), " ")

    def _tf(term: str):
        # NB: bind `term` through a real closure — a default-argument
        # lambda (`lambda t, term=term`) would be seen by Spark's HOF
        # arity inspection as the 2-ary (element, index) form
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        *[_tf(term).alias(f"tf_{j}") for j, term in zip(idx, terms)],
    )
    # corpus stats over ALL docs (N, avgdl) and per-term df — three
    # tiny aggregates; avgdl is an exact integer-sum mean so both
    # engines (and any partitioning) agree bit-for-bit
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{j}") > 0).cast("bigint")).alias(f"df_{j}")
            for j in idx
        ],
    )
    # candidate prune BEFORE the stats join: only docs containing at
    # least one query term can score > 0
    candidates = base.filter(
        F.greatest(*[F.col(f"tf_{j}") for j in idx]) > 0
        if len(terms) > 1
        else F.col("tf_0") > 0
    )
    joined = candidates.crossJoin(F.broadcast(stats))

    def _idf(j: int):
        df_t = F.col(f"df_{j}").cast("double")
        return F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )

    def _term_score(j: int):
        tf = F.col(f"tf_{j}").cast("double")
        norm = F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        return _idf(j) * tf * F.lit(k1 + 1.0) / (tf + norm)

    score = _term_score(0)
    for j in idx[1:]:
        score = score + _term_score(j)

    # output labels: sanitized term text, index-suffixed when two
    # terms sanitize to the same (case-insensitive) identifier
    safe = [re.sub(r"[^A-Za-z0-9_]", "_", term) or f"t{j}"
            for j, term in zip(idx, terms)]
    from collections import Counter
    lower_counts = Counter(x.lower() for x in safe)
    labels = [
        f"tf_{x}" if lower_counts[x.lower()] == 1 else f"tf_{x}_{j}"
        for j, x in zip(idx, safe)
    ]

    return (
        joined.select(
            "doc_id",
            F.round(score, 4).alias("score"),
            *[F.col(f"tf_{j}").alias(labels[j]) for j in idx],
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )


def tfidf_topk(
    docs: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_k`` documents by tf-idf cosine similarity to the
    bag-of-words query — the vector-space twin of :func:`bm25_topk`
    (Salton & Buckley, "Term-weighting approaches in automatic text
    retrieval", IP&M 1988; smoothed idf as in scikit-learn):

        idf(t)    = ln((1 + N) / (1 + df(t))) + 1
        w(d, t)   = tf(t, d) · idf(t)
        score     = Σ_{t∈q} w(d,t)·idf(t) / (‖w(d,·)‖ · ‖idf(q,·)‖)

    Unlike BM25 (whose per-doc evidence is only the query terms'
    tf), the cosine denominator needs each document's FULL weight
    norm, so the plan builds the corpus vocabulary:

    - one (doc_id, term) count shuffle (map-side partial agg);
    - one df/idf aggregate per term (the vocabulary relation; with
      standard top-M pruning it broadcasts — unpruned the idf join
      hash-partitions on term, rows are (term, double));
    - one (doc_id) combine computing ‖w‖² and the query dot product
      in the SAME aggregate pass (query terms are literals, so the
      numerator is a conditional sum — no second join);
    - TakeOrderedAndProject top-k, never a global sort.

    Ties (after rounding to 4 decimals) break on ascending doc_id.
    Output: (doc_id, score, dot, norm) — dot/norm rounded to 4 for
    explainability."""
    if not query_terms:
        raise ValueError("tfidf_topk requires at least one query term")
    terms = list(dict.fromkeys(query_terms))
    toks = F.split(F.col(text_col), " ")

    # round-12 (guide §1.2): tf is referenced twice (idf derivation +
    # the weighted join) and idf twice (document weights + query norm);
    # the HOF tokenizer defeats exchange reuse, so each reference
    # re-exploded the corpus.  Lazy localCheckpoints compute the
    # (doc, term) relation ONCE and the vocabulary relation ONCE —
    # values unchanged, two corpus passes and one tf re-aggregation
    # gone from the plan.
    # localCheckpoint, NOT persist (VERDICT r12 item 5, A/B'd r13):
    # persist measured faster only via CacheManager plan-matching
    # serving the PREVIOUS invocation's tf/idf (cross-run result
    # caching — rejected) and leaks a cache entry per call.  Trade-off
    # documented at lm_filter._fused_gram_counts: executor loss fails
    # the query instead of recomputing the truncated lineage.
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(toks).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    ).localCheckpoint(eager=False)
    n_docs = docs.select(
        F.count("*").cast("double").alias("n_docs")
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            (
                F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
                + F.lit(1.0)
            ).alias("idf"),
        )
    ).localCheckpoint(eager=False)
    weighted = tf.join(idf, "term").select(
        "doc_id",
        "term",
        (F.col("tf").cast("double") * F.col("idf")).alias("w"),
        "idf",
    )
    is_q = F.col("term").isin(*terms)
    per_doc = weighted.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("norm2"),
        F.sum(F.when(is_q, F.col("w") * F.col("idf")).otherwise(F.lit(0.0))).alias(
            "dot"
        ),
    )
    # query norm: idf of each distinct query term; terms absent from
    # the corpus carry the max idf ln(1+N)+1 (df = 0)
    spark = docs.sparkSession
    qterms = spark.createDataFrame([(t,) for t in terms], ["term"])
    qnorm = (
        qterms.join(F.broadcast(idf.filter(is_q)), "term", "left")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.coalesce(
                F.col("idf"), F.log(F.lit(1.0) + F.col("n_docs")) + F.lit(1.0)
            ).alias("qidf")
        )
        .agg(F.sum(F.col("qidf") * F.col("qidf")).alias("qnorm2"))
    )
    return (
        per_doc.filter(F.col("dot") > 0)
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            F.round(
                F.col("dot") / (F.sqrt("norm2") * F.sqrt("qnorm2")), 4
            ).alias("score"),
            F.round("dot", 4).alias("dot"),
            F.round(F.sqrt("norm2"), 4).alias("norm"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )


def mmr_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified retrieval (Carbonell &
    Goldstein, SIGIR 1998): greedily select ``k`` vectors maximizing

        MMR(d) = lam * cos(d, q) - (1 - lam) * max_{s in S} cos(d, s)

    where S is the already-selected set -- the standard de-redundancy
    re-ranker for RAG context assembly and diverse example selection
    (lam = 1 degenerates to plain top-k; lam -> 0 maximizes spread).

    This is the EXACT path — the verification counterpoint, not the
    scale shape.  It runs k full-corpus scored scans (each map-only +
    TakeOrdered(1), selected vectors riding as literals, no shuffle),
    which is correct at any size but pays k corpus scans; the shipped
    100 TB execution shape is :func:`mmr_topk_pooled` (ONE narrow
    relevance cut + map-only vector fetch + driver-side greedy with
    bit-identical arithmetic — measured 4x faster at 5M with
    gate-pinned EQUAL output, and sub-scan when composed with an ANN
    ``candidates`` prefetch such as ``ivfpq_topk``).  Use this exact
    path to verify the pooled one, or when k*scan cost is acceptable
    and no pool-sufficiency reasoning is wanted.  Ranking determinism:
    scores are ROUNDed to 6 before the argmax and ties break on id, so
    the engine's float fold order cannot flip a selection.

    If the corpus holds fewer than ``k`` vectors the selection stops
    when the pool is exhausted and the shorter result is returned.

    Output: one row per selected vector, in selection order --
    ``rank`` (1-based), id, ``relevance`` (cos to the query),
    ``redundancy`` (max cos to earlier selections; 0.0 for rank 1),
    ``mmr_score`` (all rounded 6).  The id column keeps the input's
    type (not hardcoded BIGINT)."""
    from .similarity import _dot_q_sql, _fold_norm, _norm_sql_name

    dim = len(query_vec)
    qnorm = _fold_norm(query_vec)
    rel_sql = (
        f"({_dot_q_sql(vec_col, query_vec, dim)} / "
        f"({_norm_sql_name(vec_col, dim)} * {qnorm!r}D))"
    )
    spark = embeddings.sparkSession
    # Materialize (id, vec, rel) ONCE (round-12): the query relevance
    # is a deterministic fixed-fold expression, so computing it per
    # greedy step (k passes over the source scan, each re-analyzing
    # the dim-wide unrolled dot) repeats identical work — persist the
    # projection and let the k TakeOrdered(1) steps scan it instead.
    # Values are bit-identical (same fold, same input doubles); only
    # the number of source scans and Catalyst analyses changes
    # (measured 4.9 s → ~2 s at sf0.1).  MEMORY_AND_DISK: at corpus
    # scale the k scans were the algorithm's documented cost either
    # way — the cached projection is never larger than the columns the
    # scans already read, and spills rather than OOMs.
    base = embeddings.select(
        F.col(id_col), F.col(vec_col), F.expr(rel_sql).alias("__rel")
    ).persist()
    selected: list[tuple] = []  # (id, vec, relevance, redundancy, mmr)
    try:
        for rank in range(1, k + 1):
            pen_terms = []
            for _, svec, _, _, _ in selected:
                snorm = _fold_norm(svec)
                pen_terms.append(
                    f"({_dot_q_sql(vec_col, svec, dim)} / "
                    f"({_norm_sql_name(vec_col, dim)} * {snorm!r}D))"
                )
            # Spark's greatest() requires >= 2 args (DuckDB accepts 1)
            if not pen_terms:
                pen_sql = "0.0D"
            elif len(pen_terms) == 1:
                pen_sql = pen_terms[0]
            else:
                pen_sql = "greatest(" + ", ".join(pen_terms) + ")"
            score = F.round(
                F.lit(float(lam)) * F.col("__rel")
                - F.lit(float(1.0 - lam)) * F.expr(pen_sql),
                6,
            )
            pool = base
            if selected:
                chosen = [s[0] for s in selected]
                pool = pool.filter(~F.col(id_col).isin(chosen))
            rows = (
                pool.select(
                    F.col(id_col),
                    F.col(vec_col),
                    F.col("__rel"),
                    F.expr(pen_sql).alias("__pen"),
                    score.alias("__mmr"),
                )
                .orderBy(F.desc("__mmr"), F.asc(id_col))
                .limit(1)
                .collect()
            )
            if not rows:  # corpus exhausted before k selections
                break
            row = rows[0]
            selected.append(
                (
                    row[id_col],
                    [float(x) for x in row[vec_col]],
                    _round_half_up6(float(row["__rel"])),
                    _round_half_up6(float(row["__pen"])),
                    float(row["__mmr"]),
                )
            )
    finally:
        base.unpersist()
    return spark.createDataFrame(
        [
            (i + 1, s[0], s[2], s[3], s[4])
            for i, s in enumerate(selected)
        ],
        _mmr_schema(embeddings, id_col),
    )


def _pool_id_schema(embeddings: DataFrame, id_col: str):
    from pyspark.sql.types import StructField, StructType

    return StructType(
        [StructField(id_col, embeddings.schema[id_col].dataType)]
    )


def _mmr_schema(embeddings: DataFrame, id_col: str):
    """Output schema for the MMR operators; the id field keeps the
    input column's type so non-BIGINT ids (strings, ints) round-trip."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("rank", IntegerType()),
            StructField(id_col, embeddings.schema[id_col].dataType),
            StructField("relevance", DoubleType()),
            StructField("redundancy", DoubleType()),
            StructField("mmr_score", DoubleType()),
        ]
    )


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Left-to-right Python float fold — same op order as the unrolled
    SQL dot products, so driver-side arithmetic is bit-identical to
    the distributed path."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _desc_rel_key(rel, rid):
    """Driver-side sort key replicating Spark's
    ``orderBy(desc(rel), asc(id))`` on DOUBLE: NaN orders GREATER than
    any double (first under DESC), NULLs last (desc default), then
    value descending, id ascending."""
    if rel is None:
        return (2, 0.0, rid)
    rel = float(rel)
    if rel != rel:  # NaN
        return (0, 0.0, rid)
    return (1, -rel, rid)


def _greedy_mmr(cand: list[tuple], k: int, lam: float) -> list[tuple]:
    """Driver-side greedy MMR over a pool already in (rel desc, id
    asc) order; ``cand`` rows are (id, vec, raw_rel).  Arithmetic is
    bit-identical to the distributed exact path: same left-to-right
    float folds, same shortest-repr HALF_UP round-to-6 before each
    argmax, same id tiebreak.  Returns [(id, vec, rel6, pen6, mmr6)]
    in selection order (rel/pen rounded like the exact path's
    output)."""
    norms = {cid: _fold_norm(vec) for cid, vec, _ in cand}
    selected: list[tuple] = []  # (id, vec, rel6, pen6, mmr6)
    remaining = list(cand)
    sel_norms: list[float] = []
    for _ in range(k):
        if not remaining:
            break
        scored = []
        for cid, vec, rel in remaining:
            if selected:
                pens = [
                    _fold_dot(vec, svec) / (norms[cid] * sel_norms[j])
                    for j, (sid, svec, _r, _p, _m) in enumerate(selected)
                ]
                pen = max(pens)
            else:
                pen = 0.0
            mmr = _round_half_up6(
                float(lam) * rel - float(1.0 - lam) * pen
            )
            scored.append((cid, vec, rel, pen, mmr))
        best = min(scored, key=lambda s: (-s[4], s[0]))
        # relevance/redundancy round with the same shortest-repr
        # HALF_UP twin as the score — Python's half-even round()
        # diverges from Spark/DuckDB ROUND on .5-boundary doubles
        selected.append(
            (
                best[0],
                best[1],
                _round_half_up6(best[2]),
                _round_half_up6(best[3]),
                best[4],
            )
        )
        sel_norms.append(norms[best[0]])
        remaining = [c for c in remaining if c[0] != best[0]]
    return selected


def _certify_pool(
    selected: list[tuple], cand: list[tuple], pool_size: int, lam: float
) -> bool:
    """Conservative pool-sufficiency certificate: any vector OUTSIDE
    the relevance top-pool has rel <= rel_pool_min and redundancy >=
    -1, so its MMR score is <= lam*rel_pool_min + (1-lam).  If every
    chosen step scored strictly above that bound (with the ROUND(,6)
    slack of 5e-7 absorbed — the stored score is rounded and can
    exceed the raw one), no out-of-pool vector could have displaced a
    selection.  A pool that held its whole (possibly
    candidate-restricted) corpus is exact by construction."""
    if len(cand) < pool_size:
        return True
    rel_pool_min = cand[-1][2]
    bound = float(lam) * rel_pool_min + float(1.0 - lam)
    return all(s[4] - bound > 5e-7 for s in selected)


def _round_half_up6(x: float) -> float:
    """Spark's ROUND(x, 6) on DOUBLE, replayed exactly.  Spark rounds
    the SHORTEST decimal representation of the double (Java
    ``BigDecimal.valueOf`` goes through ``Double.toString``), then
    setScale(6, HALF_UP): ROUND(0.1234565, 6) is 0.123457 even though
    the binary double is 0.12345649999…, where an exact-binary
    BigDecimal (or Python's half-even ``round``) would give 0.123456.
    Python's ``repr`` produces the same shortest round-trip decimal,
    so ``Decimal(repr(x))`` + HALF_UP is the faithful twin (measured
    against Spark on the boundary cases in tests/test_mmr_pooled.py).
    The trailing ``+ 0.0`` mirrors Spark's -0.0 → 0.0 normalization."""
    from decimal import ROUND_HALF_UP, Decimal

    return (
        float(
            Decimal(repr(float(x))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        + 0.0
    )


def mmr_topk_pooled(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    lam: float = 0.7,
    pool_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_certificate: bool = False,
    candidates: DataFrame | None = None,
    max_candidates: int | None = None,
):
    """:func:`mmr_topk` re-ranked over a bounded relevance pool — the
    100 TB execution shape.  Two narrow distributed passes: a
    ``TakeOrderedAndProject`` relevance cut over (id, rel) only (the
    same scan as ``cosine_topk``, overfetched to ``pool_size`` —
    vectors deliberately do NOT ride through the ordering queue, which
    copies every considered row and costs ~5× the scan with a dim-64
    array aboard, measured at 5M), then a map-only broadcast-id fetch
    of the ≤ ``pool_size`` pool vectors; the greedy MMR loop then runs
    driver-side with arithmetic bit-identical to the distributed path
    (same left-to-right float folds, same shortest-repr HALF_UP
    round-to-6 before each argmax, same id tiebreak).

    Versus ``mmr_topk``'s k full-corpus scored scans this is two cheap
    scans + k in-memory loops: at 100 TB the pool cut can also come
    from an ANN index (``ivf_topk_indexed`` / ``sq8_topk_indexed``
    with overfetch — making it sub-scan), and per-step cost no longer
    touches the cluster at all.

    Exactness: the output equals ``mmr_topk`` whenever the pool
    contains every vector the exact greedy would select.  Because the
    pool is the relevance top-``pool_size``, a sufficient certificate
    is that each step's chosen (rounded) score is ≥ the best score any
    out-of-pool vector could reach, ``lam·rel_pool_min + (1-lam)``
    (redundancy ≥ −1; returned when ``return_certificate=True``).  The gate
    additionally pins pooled == exact via the full-corpus oracle.
    ``pool_size`` defaults to ``max(64·k, 256)``, covered by the
    equality tests.

    ``candidates`` (a DataFrame holding an ``id_col`` column, e.g. an
    ANN prefetch from ``ivf_topk_indexed`` / ``sq8_topk_indexed`` /
    ``ivfpq_topk`` with a generous overfetch) restricts the pool to
    the candidate ids: the plan is materialized ONCE (its id list is
    bounded by construction — the driver-side collect raises past
    ``max_candidates``, default ``max(16·pool_size, 100_000)``; pass a
    larger ``max_candidates`` for a known-bounded bigger prefetch) and
    the pool then comes from a single
    fused map-only broadcast-id scan — no full-corpus ordering queue.
    Note the scan itself still reads the source float column (the
    broadcast join filters rows, not bytes); the FULLY file-pruned
    composition, which never scans the source corpus at all, is
    :func:`mmr_topk_ivfpq` over a ``store_vectors=True`` index.
    Exactness with ``candidates`` additionally requires the candidate
    set to cover the exact selection's support (the ANN recall
    question — measure it like the ANN gates do).

    If the corpus holds fewer than ``k`` vectors the shorter selection
    is returned (same contract as ``mmr_topk``)."""
    from .similarity import _dot_q_sql, _fold_norm, _norm_sql_name

    if pool_size is None:
        pool_size = max(64 * k, 256)
    if pool_size < k:
        raise ValueError(f"pool_size={pool_size} must be >= k={k}")
    dim = len(query_vec)
    qnorm = _fold_norm(query_vec)
    rel_sql = (
        f"({_dot_q_sql(vec_col, query_vec, dim)} / "
        f"({_norm_sql_name(vec_col, dim)} * {qnorm!r}D))"
    )
    spark = embeddings.sparkSession
    if candidates is not None:
        # Materialize the candidate ids ONCE.  ``candidates`` is
        # typically an expensive lazy ANN plan (e.g. ``ivfpq_topk``) —
        # left lazy it would re-execute for EVERY pass that touches it
        # (measured 4.8× slower than the full-scan pool at 5M before
        # this fix).  The collect is CAPPED: the contract is a bounded
        # ANN prefetch (≤ pool·overfetch rows), and an oversized frame
        # must raise instead of OOMing the driver — pool over a big
        # frame by passing it as ``embeddings``, or raise the cap via
        # ``max_candidates`` when the prefetch is known-bounded but
        # larger than the default formula allows.
        hard_cap = (
            max_candidates
            if max_candidates is not None
            else max(16 * pool_size, 100_000)
        )
        if hard_cap < 1:
            raise ValueError(f"max_candidates={max_candidates} must be >= 1")
        cand_rows = (
            candidates.select(id_col).distinct().limit(hard_cap + 1).collect()
        )
        if len(cand_rows) > hard_cap:
            raise ValueError(
                f"candidates holds more than {hard_cap} distinct ids "
                f"(cap = max_candidates or max(16*pool_size, 100_000)); "
                "a candidate prefetch must be bounded — raise "
                "`max_candidates` for a known-bounded larger prefetch, "
                "or pool over a large corpus by passing it as "
                "`embeddings` instead"
            )
        cand_ids = [r[0] for r in cand_rows]
        id_df = spark.createDataFrame(
            [(i,) for i in cand_ids], _pool_id_schema(embeddings, id_col)
        )
        base = embeddings.join(F.broadcast(id_df), id_col)
        if len(cand_ids) <= max(4 * pool_size, 100_000):
            # Fused single pass: with a bounded candidate set there is
            # no need for the narrow-cut-then-fetch dance — one
            # map-only broadcast-id scan collects (id, rel, vec) for
            # every candidate (no ordering queue involved), and the
            # pool cut happens driver-side with the same
            # (rel desc NULLS LAST/NaN-first, id asc) order as the
            # distributed TakeOrdered.
            rows = base.select(
                F.col(id_col),
                F.expr(rel_sql).alias("__rel"),
                F.col(vec_col),
            ).collect()
            # NULL relevance (a null embedding) can land inside the
            # top pool_size whenever non-null candidates < pool_size;
            # such rows are unselectable — drop before slicing
            rows = [r for r in rows if r["__rel"] is not None]
            rows.sort(key=lambda r: _desc_rel_key(r["__rel"], r[id_col]))
            cand = [
                (r[id_col], [float(x) for x in r[vec_col]],
                 float(r["__rel"]))
                for r in rows[:pool_size]
            ]  # fmt: skip
        else:
            cand = _pool_two_pass(
                base, rel_sql, pool_size, id_col, vec_col
            )
    else:
        cand = _pool_two_pass(
            embeddings, rel_sql, pool_size, id_col, vec_col
        )
    selected = _greedy_mmr(cand, k, lam)
    out = spark.createDataFrame(
        [(i + 1, s[0], s[2], s[3], s[4]) for i, s in enumerate(selected)],
        _mmr_schema(embeddings, id_col),
    )
    if not return_certificate:
        return out
    # With ``candidates`` the certificate speaks about the RESTRICTED
    # corpus only — full-corpus exactness additionally needs candidate
    # coverage (the ANN recall term), which the bound cannot see.
    return out, _certify_pool(selected, cand, pool_size, lam)


def _pool_two_pass(
    embeddings: DataFrame,
    rel_sql: str,
    pool_size: int,
    id_col: str,
    vec_col: str,
) -> list[tuple]:
    """The two-pass distributed pool build: (1) relevance top-pool
    over (id, rel) ONLY — TakeOrderedAndProject's per-partition
    priority queue copies each considered row, so carrying the vector
    column through it costs ~5× the scan (measured 30.8 s vs 5.8 s at
    5M × dim-64); (2) map-only broadcast-id fetch of the ≤ pool_size
    vectors.  Returns [(id, vec, raw_rel)] in (rel desc, id asc)
    order."""
    spark = embeddings.sparkSession
    # NULL relevance (null embedding) rows sort NULLS LAST under desc
    # but would still enter the pool when non-null rows < pool_size —
    # they are unselectable, so exclude them from the cut
    pool_rows = (
        embeddings.select(F.col(id_col), F.expr(rel_sql).alias("__rel"))
        .filter(F.col("__rel").isNotNull())
        .orderBy(F.desc("__rel"), F.asc(id_col))
        .limit(pool_size)
        .collect()
    )
    rels = {r[id_col]: float(r["__rel"]) for r in pool_rows}
    pool_id_df = spark.createDataFrame(
        [(r[id_col],) for r in pool_rows],
        _pool_id_schema(embeddings, id_col),
    )
    vec_rows = embeddings.join(F.broadcast(pool_id_df), id_col).select(
        F.col(id_col), F.col(vec_col)
    ).collect()
    vecs = {r[id_col]: [float(x) for x in r[vec_col]] for r in vec_rows}
    return [
        (r[id_col], vecs[r[id_col]], rels[r[id_col]]) for r in pool_rows
    ]


def mmr_topk_ivfpq(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 5,
    lam: float = 0.7,
    pool_size: int | None = None,
    n_probe: int = 4,
    overfetch: int = 4,
    return_certificate: bool = False,
):
    """The fully file-pruned 100 TB retrieval stack, composed over a
    ``build_ivfpq_index(store_vectors=True)`` layout — the source
    float corpus is NEVER scanned:

    1. pick the ``n_probe`` nearest coarse cells driver-side (the
       tiny centroid table);
    2. ADC-screen ONLY those cells' code files (partition filter →
       file pruning; ~46× fewer bytes than floats) down to
       ``pool_size·overfetch`` ids — a narrow TakeOrdered over
       (id, approx) rows;
    3. fetch (id, exact rel, vector) for the screened ids from the
       probed cells' VECTOR files — ALSO file-pruned, a map-only
       broadcast-id join, one action (the screen executes once as
       the broadcast side);
    4. cut the relevance pool driver-side (same (rel desc, id asc)
       order as the distributed TakeOrdered) and run the identical
       greedy as :func:`mmr_topk_pooled`.

    Total bytes touched per query: n_probe/n_cells of the ~46×-smaller
    codes + n_probe/n_cells of the cell-major float bytes — vs
    :func:`mmr_topk_pooled` over a raw corpus, which is two full float
    scans.  Output equals :func:`mmr_topk` whenever the probed cells +
    screen cover the exact selection's support (the ANN recall term;
    the gate corpus measures exact order match, and the certificate
    reports pool sufficiency WITHIN the screened candidates).

    Output schema matches the other MMR operators: (rank, id,
    relevance, redundancy, mmr_score)."""
    import os

    from .pq import (
        _SCREEN_LITERAL_MAX_PROBE,
        _adc_luts,
        _approx_cos_sql,
        _approx_cos_sql_residual,
        _residual_cell_luts,
        _residual_screen_joined,
        load_ivfpq_meta,
        probe_cells,
    )
    from .similarity import _dot_q_sql, _norm_sql_name

    meta, cent = load_ivfpq_meta(spark, index_dir)
    if not meta.get("store_vectors"):
        raise ValueError(
            "index was built without store_vectors=True — the "
            "cell-partitioned vectors/ dataset is required for the "
            "file-pruned pool fetch (rebuild with "
            "build_ivfpq_index(..., store_vectors=True), or use "
            "mmr_topk_pooled(candidates=ivfpq_topk(...)) over the "
            "source corpus)"
        )
    id_col = meta["id_col"]
    vec_col = meta.get("vec_col", "embedding")
    if pool_size is None:
        pool_size = max(64 * k, 256)
    if pool_size < k:
        raise ValueError(f"pool_size={pool_size} must be >= k={k}")
    probe = probe_cells(cent, query_vec, n_probe)

    dim = len(query_vec)
    qnorm = _fold_norm(query_vec)
    codes = spark.read.parquet(os.path.join(index_dir, "codes")).filter(
        F.col("ivf_cell").isin(probe)
    )
    if meta.get("residual") and len(probe) > _SCREEN_LITERAL_MAX_PROBE:
        # large probe counts: broadcast-joined per-cell LUT relation
        # (plan text O(m·ksub), bit-identical scores — pq module doc)
        scored = _residual_screen_joined(
            codes, probe, meta["anchors"], meta["codebooks"], query_vec,
            qnorm, id_col, cell_luts=_residual_cell_luts(meta),
        )  # fmt: skip
    else:
        if meta.get("residual"):
            # residual index: per-cell ADC over r = x − c (same screen
            # shape, same file pruning; pq._approx_cos_sql_residual)
            approx = _approx_cos_sql_residual(
                "codes", "ivf_cell", probe, meta["anchors"],
                meta["codebooks"], query_vec, qnorm,
                cell_luts=_residual_cell_luts(meta),
            )  # fmt: skip
        else:
            lut_dot, lut_norm2 = _adc_luts(meta["codebooks"], query_vec)
            approx = _approx_cos_sql("codes", lut_dot, lut_norm2, qnorm)
        scored = codes.select(F.col(id_col), F.expr(approx).alias("__approx"))
    screened = (
        scored.orderBy(F.desc("__approx"), F.asc(id_col))
        .limit(pool_size * overfetch)
        .select(id_col)
    )
    rel_sql = (
        f"({_dot_q_sql(vec_col, query_vec, dim)} / "
        f"({_norm_sql_name(vec_col, dim)} * {qnorm!r}D))"
    )
    vectors = spark.read.parquet(
        os.path.join(index_dir, "vectors")
    ).filter(F.col("ivf_cell").isin(probe))
    rows = (
        vectors.join(F.broadcast(screened), id_col)
        .select(
            F.col(id_col), F.expr(rel_sql).alias("__rel"), F.col(vec_col)
        )
        .collect()
    )
    # drop NULL-relevance rows (null embedding) — unselectable, and
    # float(None) would crash the pool build when they land in the top
    rows = [r for r in rows if r["__rel"] is not None]
    rows.sort(key=lambda r: _desc_rel_key(r["__rel"], r[id_col]))
    cand = [
        (r[id_col], [float(x) for x in r[vec_col]], float(r["__rel"]))
        for r in rows[:pool_size]
    ]
    selected = _greedy_mmr(cand, k, lam)
    out = spark.createDataFrame(
        [(i + 1, s[0], s[2], s[3], s[4]) for i, s in enumerate(selected)],
        _mmr_schema(vectors, id_col),
    )
    if not return_certificate:
        return out
    # the certificate speaks about the SCREENED candidate set; cell +
    # screen coverage (the ANN recall term) is measured, not certified
    return out, _certify_pool(selected, cand, pool_size, lam)
