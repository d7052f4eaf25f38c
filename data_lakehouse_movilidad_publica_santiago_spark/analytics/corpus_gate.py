"""Corpus-preparation gate queries: PII scrubbing, repetition
analysis, n-gram statistics, RAG chunking, deterministic global
shuffle, and session windows — the cleaning/layout passes of a
training-data pipeline, each with a DuckDB differential oracle.

The public ``documents`` word-soup corpus contains no real PII, so
the PII gates append synthetic identifiers derived deterministically
from ``doc_id`` (same trick as the multimodal gates' synthesized
payloads): BOTH the Spark query and the oracle compute the identical
augmented text from the shared `_PII_AUG` template, then the
scan/redact operators under test run only on the Spark side against
the oracle's independent regex engine (Java vs RE2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    QUALITY_STOPWORDS,
    dup_ngram_fraction,
    word_ngrams_raw,
)
from ..operators.chunking import chunk_documents, global_shuffle
from ..operators.pii import PII_PATTERNS, pii_count, redact_pii
from ..operators.windows import sessionize
from ..operators.dedup_text import _md5_hex8_bigint_sql
from .inventory import t
from .inventory_llm import _SQL_NORM

# Deterministic PII augmentation: ~1/3 of docs get an email, 3/4 an
# IPv4, 2/5 a phone — plus every selected doc's values vary with its
# id, so redaction is not a constant-string rewrite. The template is
# dialect-shared except the string type name ({str}: STRING / VARCHAR).
_PII_AUG = (
    "concat({t}"
    ", CASE WHEN {id} % 3 = 0 THEN concat(' contact user', CAST({id} AS {str}), '@example.com') ELSE '' END"
    ", CASE WHEN {id} % 4 <> 1 THEN concat(' from 10.', CAST({id} % 4 AS {str}), '.', CAST({id} % 256 AS {str}), '.', CAST(({id} * 7) % 256 AS {str})) ELSE '' END"
    ", CASE WHEN {id} % 5 < 2 THEN concat(' call 555-', lpad(CAST(({id} * 13) % 1000 AS {str}), 3, '0'), '-', lpad(CAST(({id} * 31) % 10000 AS {str}), 4, '0')) ELSE '' END"
    ")"
)


def _aug_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.withColumn(
        "ptext",
        F.expr(_PII_AUG.format(id="doc_id", t="text", str="STRING")),
    )


_AUG_SQL = (
    "SELECT doc_id, source, "
    + _PII_AUG.format(id="doc_id", t="text", str="VARCHAR")
    + " AS ptext FROM documents"
)


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII inventory per source: how many docs carry each identifier
    class and the total match counts — the audit report that runs
    before redaction. Pure regexp_count columns, one groupBy."""
    aug = _aug_docs(spark, sf_dir)
    counted = aug.select(
        "source",
        pii_count(F.col("ptext"), "email").alias("n_email"),
        pii_count(F.col("ptext"), "ipv4").alias("n_ipv4"),
        pii_count(F.col("ptext"), "phone").alias("n_phone"),
    )
    return counted.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            (
                (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0
            ).cast("bigint")
        ).alias("docs_with_pii"),
        F.sum("n_email").alias("total_email"),
        F.sum("n_ipv4").alias("total_ipv4"),
        F.sum("n_phone").alias("total_phone"),
    )


ORACLE_PII_SCAN = f"""
WITH aug AS ({_AUG_SQL}),
c AS (
  SELECT source,
         len(regexp_extract_all(ptext, '{PII_PATTERNS["email"]}')) AS n_email,
         len(regexp_extract_all(ptext, '{PII_PATTERNS["ipv4"]}')) AS n_ipv4,
         len(regexp_extract_all(ptext, '{PII_PATTERNS["phone"]}')) AS n_phone
  FROM aug)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_email + n_ipv4 + n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       CAST(SUM(n_email) AS BIGINT) AS total_email,
       CAST(SUM(n_ipv4) AS BIGINT) AS total_ipv4,
       CAST(SUM(n_phone) AS BIGINT) AS total_phone
FROM c GROUP BY source
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass: every match replaced by its class token, in
    the canonical email → ipv4 → phone order. The gate compares the
    md5 of each redacted document against an independent regex
    engine's rewrite, so a single mis-redacted byte anywhere in the
    corpus fails the hash."""
    aug = _aug_docs(spark, sf_dir)
    return aug.select(
        "doc_id",
        (
            pii_count(F.col("ptext"), "email")
            + pii_count(F.col("ptext"), "ipv4")
            + pii_count(F.col("ptext"), "phone")
        ).alias("n_pii"),
        F.md5(redact_pii(F.col("ptext"))).alias("redacted_md5"),
    )


ORACLE_PII_REDACT = f"""
WITH aug AS ({_AUG_SQL})
SELECT doc_id,
       CAST(len(regexp_extract_all(ptext, '{PII_PATTERNS["email"]}'))
          + len(regexp_extract_all(ptext, '{PII_PATTERNS["ipv4"]}'))
          + len(regexp_extract_all(ptext, '{PII_PATTERNS["phone"]}')) AS BIGINT) AS n_pii,
       md5(regexp_replace(regexp_replace(regexp_replace(ptext,
             '{PII_PATTERNS["email"]}', '[EMAIL]', 'g'),
             '{PII_PATTERNS["ipv4"]}', '[IP]', 'g'),
             '{PII_PATTERNS["phone"]}', '[PHONE]', 'g')) AS redacted_md5
FROM aug
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signal: the duplicate word
    2-gram fraction per document, aggregated per source. All array
    expressions — no explode, no shuffle beyond the final groupBy."""
    docs = t(spark, sf_dir, "documents")
    frac = docs.select(
        "source",
        F.round(dup_ngram_fraction(F.col("text"), 2), 6).alias("dup2"),
    )
    return frac.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("dup2"), 4).alias("avg_dup2"),
        F.round(F.min("dup2"), 4).alias("min_dup2"),
        F.round(F.max("dup2"), 4).alias("max_dup2"),
    )


ORACLE_REPETITION_STATS = """
WITH g AS (
  SELECT source,
         list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
           i -> string_split(text, ' ')[i] || ' ' || COALESCE(string_split(text, ' ')[i + 1], '')
         ) AS grams
  FROM documents),
f AS (
  -- a 1-token doc yields one gram on both engines (differing only by
  -- a trailing space the ratio cannot see: 1 - 1/1 = 0 either way)
  SELECT source,
         ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
           / len(grams), 6) AS dup2
  FROM g)
SELECT source, COUNT(*) AS n_docs,
       ROUND(AVG(dup2), 4) AS avg_dup2,
       ROUND(MIN(dup2), 4) AS min_dup2,
       ROUND(MAX(dup2), 4) AS max_dup2
FROM f GROUP BY source
"""


def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word trigrams (occurrence-counted) — the
    n-gram frequency table used for contamination screens and boilerplate
    detection. Explode → partial-agg count → TakeOrdered 20. The
    explode+concat stage is compute-heavy per input row, so the input
    is spread first (no-op at cluster scale — see operators/spread.py)."""
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    grams = docs.select(
        F.explode(word_ngrams_raw(F.col("text"), 3)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(20)
    )


ORACLE_NGRAM_TOPK = """
WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents),
g AS (
  SELECT unnest(list_transform(
    generate_series(1, greatest(len(l) - 2, 1)),
    i -> CASE WHEN len(l) >= 3
              THEN l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]
              ELSE array_to_string(l, ' ') END)) AS gram
  FROM toks)
SELECT gram, COUNT(*) AS n FROM g
GROUP BY gram ORDER BY n DESC, gram ASC LIMIT 20
"""


def q_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: 64-token windows advancing 48 tokens (overlap
    16); output carries offsets + md5 per chunk so verification never
    moves text. Map-only (one posexplode), no shuffle."""
    docs = t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, overlap=16)


ORACLE_RAG_CHUNKS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l,
         len(string_split(text, ' ')) AS n
  FROM documents),
starts AS (
  SELECT doc_id, l, n,
         unnest(generate_series(
           1,
           greatest(1, CAST(ceil(CAST(n - 64 AS DOUBLE) / 48) AS BIGINT) * 48 + 1),
           48)) AS start_tok
  FROM toks)
SELECT doc_id,
       CAST((start_tok - 1) / 48 AS INTEGER) AS chunk_idx,
       CAST(start_tok AS INTEGER) AS start_tok,
       CAST(len(list_slice(l, start_tok, least(start_tok + 63, n))) AS INTEGER) AS n_tok,
       md5(array_to_string(list_slice(l, start_tok, least(start_tok + 63, n)), ' ')) AS chunk_md5
FROM starts
"""


def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global permutation with a stable 1-based
    global position — two-pass distributed rank, never a
    single-partition ORDER BY window."""
    from ..operators.spread import release_pins

    docs = t(spark, sf_dir, "documents")
    pins: list = []
    out = global_shuffle(docs, seed="epoch-0", pins=pins)
    # the harness collects later; snapshot the (narrow) result so the
    # internal range-partition pin doesn't outlive this call
    return release_pins(out, pins)


ORACLE_GLOBAL_SHUFFLE = """
SELECT doc_id,
       md5('epoch-0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
       CAST(ROW_NUMBER() OVER (
         ORDER BY ('0x' || substr(
           md5('epoch-0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
         doc_id
       ) AS BIGINT) AS pos
FROM documents
"""


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user over the event stream —
    the stateful sessionization shape, computed with the native
    ``session_window`` aggregation. Timestamps surface as unix
    microseconds so both engines hash identical integers."""
    ev = t(spark, sf_dir, "events")
    sessions = sessionize(
        ev,
        gap="30 minutes",
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )
    # events.ts scans as TIMESTAMP_NTZ; the session runs in UTC
    # (session.py pins spark.sql.session.timeZone), so the NTZ→TZ cast
    # is value-preserving and unix_micros matches DuckDB's epoch_us
    return sessions.select(
        "user_id",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias(
            "start_us"
        ),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias(
            "end_us"
        ),
        "n_events",
        "sum_value",
    )


ORACLE_SESSION_WINDOWS = """
WITH d AS (
  -- break on diff STRICTLY greater than the gap: an event at exactly
  -- last+gap has an adjacent [ts, ts+gap) range and Spark unions
  -- adjacent ranges into one session (pinned by
  -- tests/test_corpus_ops.py::test_sessionize_gap_boundary)
  SELECT user_id, ts, value,
         CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events),
g AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM d)
SELECT user_id,
       epoch_us(MIN(ts)) AS start_us,
       epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS end_us,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM g GROUP BY user_id, grp
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pii_scan": q_pii_scan,
    "pii_redact": q_pii_redact,
    "repetition_stats": q_repetition_stats,
    "ngram_topk": q_ngram_topk,
    "rag_chunks": q_rag_chunks,
    "global_shuffle": q_global_shuffle,
    "session_windows": q_session_windows,
}

ORACLE: dict[str, str] = {
    "pii_scan": ORACLE_PII_SCAN,
    "pii_redact": ORACLE_PII_REDACT,
    "repetition_stats": ORACLE_REPETITION_STATS,
    "ngram_topk": ORACLE_NGRAM_TOPK,
    "rag_chunks": ORACLE_RAG_CHUNKS,
    "global_shuffle": ORACLE_GLOBAL_SHUFFLE,
    "session_windows": ORACLE_SESSION_WINDOWS,
}


# ── end-to-end corpus build ─────────────────────────────────────────
#
# The whole training-data preparation pipeline as ONE declarative
# plan: quality filter → exact dedup (keep lowest id per fingerprint)
# → PII redaction accounting → chunk/token layout — reported per
# source. Every stage is an operator that is ALSO individually
# oracle-gated above; this gate proves they compose.


def q_corpus_build_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import doc_fingerprint, quality_score
    from .inventory_llm import QUALITY_STOPWORDS

    docs = t(spark, sf_dir, "documents")
    score = F.round(quality_score(F.col("text"), QUALITY_STOPWORDS), 2)
    passed = docs.filter(score >= 0.75).select("doc_id", "source", "text")
    keyed = passed.withColumn("__fp", doc_fingerprint(F.col("text")))
    w = Window.partitionBy("__fp")
    kept = keyed.withColumn("__keeper", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("__keeper")
    )
    aug = kept.withColumn(
        "ptext",
        F.expr(_PII_AUG.format(id="doc_id", t="text", str="STRING")),
    )
    from ..operators.pii import pii_count

    n_tok = F.size(F.split(F.col("text"), " "))
    n_chunks = F.when(n_tok <= 64, F.lit(1)).otherwise(
        F.ceil((n_tok - F.lit(64)).cast("double") / 48) + F.lit(1)
    )
    per_doc = aug.select(
        "source",
        (
            pii_count(F.col("ptext"), "email")
            + pii_count(F.col("ptext"), "ipv4")
            + pii_count(F.col("ptext"), "phone")
        ).alias("__n_pii"),
        n_chunks.cast("bigint").alias("__n_chunks"),
        n_tok.cast("bigint").alias("__n_tok"),
    )
    kept_agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs_kept"),
        F.sum("__n_pii").alias("total_redactions"),
        F.sum("__n_chunks").alias("total_chunks"),
        F.sum("__n_tok").alias("total_tokens"),
    )
    raw = docs.groupBy("source").agg(F.count("*").alias("n_docs_raw"))
    return raw.join(kept_agg, "source", "left").select(
        "source",
        "n_docs_raw",
        F.coalesce("n_docs_kept", F.lit(0)).alias("n_docs_kept"),
        F.coalesce("total_redactions", F.lit(0)).alias("total_redactions"),
        F.coalesce("total_chunks", F.lit(0)).alias("total_chunks"),
        F.coalesce("total_tokens", F.lit(0)).alias("total_tokens"),
    )


def _oracle_corpus_build() -> str:
    from .inventory_llm import _SQL_DOC_SCORE, _SQL_NORM

    aug_expr = _PII_AUG.format(id="doc_id", t="text", str="VARCHAR")
    return f"""
WITH score AS ({_SQL_DOC_SCORE}),
passed AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN score s ON d.doc_id = s.doc_id
  WHERE s.score >= 0.75),
keyed AS (
  SELECT doc_id, source, text, md5({_SQL_NORM}) AS fp
  FROM passed),
kept AS (
  SELECT doc_id, source, text
  FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper FROM keyed)
  WHERE doc_id = keeper),
per_doc AS (
  SELECT source,
         len(regexp_extract_all({aug_expr}, '{PII_PATTERNS["email"]}'))
       + len(regexp_extract_all({aug_expr}, '{PII_PATTERNS["ipv4"]}'))
       + len(regexp_extract_all({aug_expr}, '{PII_PATTERNS["phone"]}')) AS n_pii,
         len(string_split(text, ' ')) AS n_tok
  FROM kept),
kept_agg AS (
  SELECT source, COUNT(*) AS n_docs_kept,
         CAST(SUM(n_pii) AS BIGINT) AS total_redactions,
         CAST(SUM(CASE WHEN n_tok <= 64 THEN 1
                  ELSE CAST(ceil((n_tok - 64) / 48.0) AS BIGINT) + 1 END)
              AS BIGINT) AS total_chunks,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens
  FROM per_doc GROUP BY source),
raw AS (SELECT source, COUNT(*) AS n_docs_raw FROM documents GROUP BY source)
SELECT r.source, r.n_docs_raw,
       COALESCE(k.n_docs_kept, 0) AS n_docs_kept,
       COALESCE(k.total_redactions, 0) AS total_redactions,
       COALESCE(k.total_chunks, 0) AS total_chunks,
       COALESCE(k.total_tokens, 0) AS total_tokens
FROM raw r LEFT JOIN kept_agg k ON r.source = k.source
"""


QUERIES["corpus_build_summary"] = q_corpus_build_summary
ORACLE["corpus_build_summary"] = _oracle_corpus_build()


# ── CCNet-style LM perplexity filter ────────────────────────────────


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train an add-one-smoothed word-bigram LM on the English slice
    (the trusted reference corpus) and score EVERY document's
    cross-entropy under it — the CCNet quality screen. The keep
    verdict thresholds the ROUNDED score so both engines decide from
    identical doubles. Non-English docs score measurably worse, which
    is the operator's whole point."""
    from ..operators.lm_filter import score_perplexity, train_bigram_lm
    from ..operators.spread import ensure_parallelism

    # gram explode + model probes are compute-heavy narrow stages; a
    # one-file scan would single-thread them (no-op at cluster scale)
    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    # round-13: training is the FUSED single-pass form (one tagged
    # explode + one shuffle for unigrams+bigrams+|V|, materialized
    # model-sized — operators.lm_filter._fused_gram_counts).  The
    # round-12 negative result (BigramLM.materialized() alone: min
    # 1.99 s vs 1.88 s baseline) only checkpointed the unigram table;
    # the fusion also removes the separate bigram explode and merges
    # the training shuffles, which is what the checkpoint-only probe
    # could not recoup.
    model = train_bigram_lm(docs.filter(F.col("lang") == "en"))
    # lang rides the gram rows; bigram-free docs are excluded anyway,
    # so skip the join-back stage — train + score is ONE Spark plan
    scored = score_perplexity(
        docs, model, passthrough=["lang"], include_empty=False
    )
    ce = F.round(F.col("cross_entropy"), 4)
    return scored.select(
        "doc_id",
        "lang",
        "n_bigrams",
        ce.alias("cross_entropy"),
        (ce <= F.lit(3.42)).alias("keep"),
    )


ORACLE_LM_PERPLEXITY = """
WITH train AS (
  SELECT string_split(text, ' ') AS l FROM documents WHERE lang = 'en'),
uni AS (
  SELECT t AS w1, COUNT(*) AS c1
  FROM (SELECT unnest(l) AS t FROM train) GROUP BY t),
v AS (SELECT COUNT(*) AS vocab FROM uni),
tbg AS (
  SELECT unnest(list_transform(generate_series(1, len(l) - 1),
                i -> l[i] || ' ' || l[i + 1])) AS gram
  FROM train WHERE len(l) >= 2),
big AS (SELECT gram, COUNT(*) AS c12 FROM tbg GROUP BY gram),
toks AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
sg AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, len(l) - 1),
                i -> l[i] || ' ' || l[i + 1])) AS gram
  FROM toks WHERE len(l) >= 2),
sc AS (
  SELECT doc_id, lang,
         ln(CAST(COALESCE(c12, 0) + 1 AS DOUBLE)
            / CAST(COALESCE(c1, 0) + vocab AS DOUBLE)) AS logp
  FROM sg LEFT JOIN big USING (gram)
  LEFT JOIN uni ON split_part(gram, ' ', 1) = uni.w1
  CROSS JOIN v)
SELECT doc_id, lang, COUNT(*) AS n_bigrams,
       ROUND(-AVG(logp), 4) AS cross_entropy,
       ROUND(-AVG(logp), 4) <= 3.42 AS keep
FROM sc GROUP BY doc_id, lang
"""

QUERIES["lm_perplexity"] = q_lm_perplexity
ORACLE["lm_perplexity"] = ORACLE_LM_PERPLEXITY


# ── exact substring-span dedup (Lee et al. ExactSubstr) ─────────────


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated 8-token-window spans across the corpus: per-doc
    accounting plus the md5 of the masked rebuild, so every single
    token-keep/drop decision is hash-pinned against the oracle. The
    window-hash explode is compute-heavy → spread the scan."""
    from ..operators.span_dedup import (
        duplicated_spans,
        mask_duplicated_spans,
        span_dedup_stats,
    )
    from ..operators.spread import ensure_parallelism, release_pins

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    # ONE window-hash pass feeds both consumers; the internal cache
    # pin is released once the gate result is snapshotted
    pins: list = []
    spans = duplicated_spans(docs, window=8, pins=pins)
    stats = span_dedup_stats(docs, window=8, spans=spans)
    masked = mask_duplicated_spans(docs, window=8, spans=spans).select(
        "doc_id", F.md5("kept_text").alias("kept_md5")
    )
    return release_pins(stats.join(masked, "doc_id"), pins)


ORACLE_SPAN_DEDUP = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
win AS (
  SELECT doc_id, unnest(generate_series(1, len(l) - 7)) AS s, l
  FROM toks WHERE len(l) >= 8),
h AS (SELECT doc_id, s, md5(array_to_string(l[s:s+7], ' ')) AS hsh FROM win),
dup AS (SELECT hsh FROM h GROUP BY hsh HAVING COUNT(*) > 1),
spans AS (SELECT doc_id, s, s + 7 AS e FROM h SEMI JOIN dup USING (hsh)),
runs AS (
  SELECT doc_id, s, e,
         MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM spans),
grp AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN pm IS NULL OR s > pm + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS g
  FROM runs),
islands AS (
  SELECT doc_id, g, MIN(s) AS span_start, MAX(e) AS span_end,
         COUNT(*) AS n_windows
  FROM grp GROUP BY doc_id, g),
per_doc AS (
  SELECT doc_id, CAST(SUM(n_windows) AS BIGINT) AS dup_windows,
         CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_tokens
  FROM islands GROUP BY doc_id),
cov AS (
  SELECT doc_id, unnest(generate_series(span_start, span_end)) AS p
  FROM islands),
pos AS (
  SELECT doc_id, unnest(generate_series(1, len(l))) AS p, l FROM toks),
keptpos AS (
  SELECT pos.doc_id, pos.p, pos.l[pos.p] AS tok
  FROM pos ANTI JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p),
kept AS (
  SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY p)) AS kept_md5
  FROM keptpos GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.l) AS BIGINT) AS n_tokens,
       COALESCE(d.dup_windows, 0) AS dup_windows,
       COALESCE(d.dup_tokens, 0) AS dup_tokens,
       ROUND(COALESCE(d.dup_tokens, 0) / CAST(len(t.l) AS DOUBLE), 6) AS dup_frac,
       COALESCE(k.kept_md5, md5('')) AS kept_md5
FROM toks t
LEFT JOIN per_doc d ON t.doc_id = d.doc_id
LEFT JOIN kept k ON t.doc_id = k.doc_id
"""

QUERIES["span_dedup"] = q_span_dedup
ORACLE["span_dedup"] = ORACLE_SPAN_DEDUP


# ── distributed k-means (topic clustering over embeddings) ──────────


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd's iterations, k=4, deterministic init (the 4
    smallest vec_ids). Assignment is a pure map stage against
    driver-held literal centroids; the update is one (cluster, dim)
    shuffle. The oracle replays both iterations relationally —
    centroids are ROUNDed each update so the engines iterate from
    identical doubles."""
    from ..operators.kmeans import kmeans_fit_assign

    emb = t(spark, sf_dir, "embeddings")
    return kmeans_fit_assign(emb, k=4, iters=2)


def _kmeans_ctes(k: int = 4, iters: int = 2, dim: int = 64) -> tuple[str, str]:
    """The Lloyd's-iteration CTE chain (shared by the kmeans and
    semantic-dedup oracles). Returns (cte_sql_without_WITH,
    final_assignment_cte) where the final CTE yields
    (vec_id, cid, d) plus an ``e`` CTE with the DOUBLE[] vectors.

    Pinned to ``iters <= 2``: the Spark operator keeps a stale
    centroid when a cluster empties mid-run, while this CTE chain
    drops the cid (its u{it} group vanishes). At iters=2 the two are
    provably identical — every init seed is a member of its own first
    assignment, so no cluster can be empty when c1 is computed — but
    a third iteration could diverge. Raise the cap only together with
    a COALESCE-to-previous-centroid rewrite of c{it}."""
    if iters > 2:
        raise ValueError(
            "_kmeans_ctes is pinned to iters<=2: the oracle drops "
            "empty clusters while kmeans_fit_assign keeps their stale "
            "centroids, so iters>2 could silently diverge"
        )

    def dist(e: str, c: str) -> str:
        terms = [
            f"({e}.v[{i + 1}] - {c}.v[{i + 1}]) * ({e}.v[{i + 1}] - {c}.v[{i + 1}])"
            for i in range(dim)
        ]
        return f"ROUND({' + '.join(terms)}, 6)"

    sql = f"""
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (
  -- k DISTINCT vectors with the smallest ids (duplicate-vector-safe
  -- init, mirroring kmeans_fit_assign)
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
  FROM (SELECT MIN(vec_id) AS vec_id, v FROM e GROUP BY v
        ORDER BY vec_id LIMIT {k})),
d0 AS (
  SELECT e.vec_id, c0.cid, {dist('e', 'c0')} AS d
  FROM e CROSS JOIN c0),
a0 AS (
  SELECT vec_id, cid, d FROM (
    SELECT vec_id, cid, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM d0) WHERE rn = 1)"""
    prev = "a0"
    for it in range(1, iters):
        sql += f""",
u{it} AS (
  SELECT {prev}.cid, dims.i, ROUND(AVG(e.v[dims.i]), 6) AS cv
  FROM {prev} JOIN e USING (vec_id)
  CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) dims
  GROUP BY {prev}.cid, dims.i),
c{it} AS (SELECT cid, array_agg(cv ORDER BY i) AS v FROM u{it} GROUP BY cid),
d{it} AS (
  SELECT e.vec_id, c{it}.cid, {dist('e', f'c{it}')} AS d
  FROM e CROSS JOIN c{it}),
a{it} AS (
  SELECT vec_id, cid, d FROM (
    SELECT vec_id, cid, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM d{it}) WHERE rn = 1)"""
        prev = f"a{it}"
    return sql, prev


def _oracle_kmeans(k: int = 4, iters: int = 2, dim: int = 64) -> str:
    ctes, final = _kmeans_ctes(k, iters, dim)
    return f"""
WITH {ctes}
SELECT vec_id, cid AS cluster, d AS dist FROM {final}
"""


QUERIES["kmeans_assign"] = q_kmeans_assign
ORACLE["kmeans_assign"] = _oracle_kmeans()


# ── SemDeDup (cluster-then-compare semantic dedup) ──────────────────


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdicts: k-means (k=4, 2 iters, deterministic init)
    → within-cluster cosine ≥ 0.35 pairs → connected components →
    keep the farthest-from-centroid member per duplicate group. The
    oracle replays the whole chain: both Lloyd's iterations, the
    rounded cosine pair set, a recursive-CTE component closure, and
    the (dist DESC, id ASC) representative pick."""
    from ..operators.semantic_dedup import semantic_dedup
    from ..operators.spread import release_pins

    emb = t(spark, sf_dir, "embeddings")
    pins: list = []
    out = semantic_dedup(emb, k=4, iters=2, threshold=0.35, pins=pins)
    return release_pins(out, pins)


def _oracle_semantic_dedup(
    k: int = 4, iters: int = 2, dim: int = 64, threshold: float = 0.35
) -> str:
    ctes, final = _kmeans_ctes(k, iters, dim)
    return f"""
WITH RECURSIVE {ctes},
pr AS (
  SELECT x1.vec_id AS doc_a, x2.vec_id AS doc_b
  FROM {final} x1 JOIN {final} x2
    ON x1.cid = x2.cid AND x1.vec_id < x2.vec_id
  JOIN e e1 ON e1.vec_id = x1.vec_id
  JOIN e e2 ON e2.vec_id = x2.vec_id
  WHERE ROUND(list_cosine_similarity(e1.v, e2.v), 6) >= {threshold}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
          UNION SELECT doc_b, doc_a FROM pr),
walk(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT ed.dst, w.lbl FROM walk w JOIN edges ed ON ed.src = w.node),
comp AS (SELECT node, MIN(lbl) AS comp_id FROM walk GROUP BY node),
ranked AS (
  SELECT c.node,
         ROW_NUMBER() OVER (
           PARTITION BY c.comp_id ORDER BY f.d DESC, c.node ASC) AS rn
  FROM comp c JOIN {final} f ON f.vec_id = c.node)
SELECT f.vec_id, CAST(f.cid AS INT) AS cluster, f.d AS dist,
       COALESCE(r.rn = 1, TRUE) AS keep
FROM {final} f LEFT JOIN ranked r ON r.node = f.vec_id
"""


QUERIES["semantic_dedup"] = q_semantic_dedup
ORACLE["semantic_dedup"] = _oracle_semantic_dedup()


# ── Gopher quality rules (ordered reason-code chain) ────────────────


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher filter verdict: the FIRST failing rule's
    code (same first-match-wins discipline as the silver quarantine)
    or NULL, plus the pass boolean. Map-only — no shuffle at all; the
    per-row rule battery is compute-heavy (interpreted HOF filters +
    regex counts), so the one-file scan is spread first (no-op at
    cluster scale)."""
    from ..functions.gopher import gopher_reason
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    reason = gopher_reason(F.col("text"))
    return docs.select(
        "doc_id",
        "source",
        reason.alias("gopher_reason"),
        reason.isNull().alias("pass"),
    )


_GOPHER_STOPS_SQL = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)

ORACLE_GOPHER_RULES = f"""
WITH toks AS (
  -- COALESCE mirrors gopher_reason's fail-closed NULL handling
  SELECT doc_id, source, COALESCE(text, '') AS text,
         string_split(COALESCE(text, ''), ' ') AS l FROM documents),
m AS (
  SELECT doc_id, source,
         len(l) AS n,
         list_sum(list_transform(l, x -> length(x))) * 1.0 / len(l) AS mean_len,
         len(regexp_extract_all(text, '#|\\.\\.\\.')) * 1.0 / len(l) AS sym_ratio,
         len(list_filter(l, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0
           / len(l) AS alpha_frac,
         len(list_filter(l, x -> x IN ({_GOPHER_STOPS_SQL}))) AS stop_hits,
         1.0 - CAST(len(list_distinct(list_transform(
                 generate_series(1, greatest(len(l) - 1, 1)),
                 i -> l[i] || ' ' || COALESCE(l[i + 1], '')))) AS DOUBLE)
             / len(list_transform(
                 generate_series(1, greatest(len(l) - 1, 1)),
                 i -> l[i] || ' ' || COALESCE(l[i + 1], ''))) AS dup2
  FROM toks)
SELECT doc_id, source,
       CASE WHEN n < 50 THEN 'TOO_FEW_WORDS'
            WHEN n > 100000 THEN 'TOO_MANY_WORDS'
            WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 'BAD_MEAN_WORD_LENGTH'
            WHEN sym_ratio > 0.1 THEN 'HIGH_SYMBOL_RATIO'
            WHEN alpha_frac < 0.8 THEN 'LOW_ALPHA_FRACTION'
            WHEN stop_hits < 2 THEN 'TOO_FEW_STOPWORDS'
            WHEN dup2 > 0.4 THEN 'HIGH_DUP_2GRAM'
            ELSE NULL END AS gopher_reason,
       CASE WHEN n < 50 THEN FALSE
            WHEN n > 100000 THEN FALSE
            WHEN mean_len < 3.0 OR mean_len > 10.0 THEN FALSE
            WHEN sym_ratio > 0.1 THEN FALSE
            WHEN alpha_frac < 0.8 THEN FALSE
            WHEN stop_hits < 2 THEN FALSE
            WHEN dup2 > 0.4 THEN FALSE
            ELSE TRUE END AS pass
FROM m
"""

QUERIES["gopher_rules"] = q_gopher_rules
ORACLE["gopher_rules"] = ORACLE_GOPHER_RULES


# ── learned quality classifier (distributed logistic regression) ────


def q_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic-regression language screen (label: lang='en')
    on four unit-scale quality features with 3 full-batch GD steps,
    then score every document — the fastText-style learned filter.
    Weights round to 6 per step and the margin is one fixed-order
    expression, so the oracle replays the entire optimization."""
    from ..functions.text import (
        mean_word_length,
        punct_ratio,
        stopword_ratio,
        token_count,
    )
    from ..operators.logreg import logreg_fit, logreg_score

    docs = t(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        # when/otherwise (not a bare ==) so a NULL lang labels 0.0
        # exactly like the oracle's CASE, instead of NULL-propagating
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("label"),
        stopword_ratio(F.col("text"), QUALITY_STOPWORDS).alias("f1"),
        punct_ratio(F.col("text")).alias("f2"),
        (mean_word_length(F.col("text")) / F.lit(10.0)).alias("f3"),
        (token_count(F.col("text")) / F.lit(100.0)).alias("f4"),
    )
    # round-12 (guide §1.2 "don't compute things twice"): every GD
    # aggregate AND the scoring pass re-derives the four text features
    # (regex sweeps + HOF token filters — the dominant per-row cost);
    # localCheckpoint materializes the narrow (doc_id, label, f1..f4)
    # frame once, so 3 GD passes + scoring read doubles instead of
    # re-tokenizing the corpus 4×.  Feature VALUES are unchanged
    # (same expressions, computed once); blocks are GC-released with
    # the returned plan (the release_pins discipline).  Scale-safe:
    # the frame is 6 narrow columns per document, spilled to disk if
    # needed — at 100 TB the alternative is 4 full text re-scans.
    # localCheckpoint, NOT persist (VERDICT r12 item 5, A/B'd r13):
    # persist halves the wall only via CacheManager plan-matching
    # serving the PREVIOUS invocation's features (cross-run result
    # caching — rejected) and leaks a cache entry per call; trade-off
    # documented at lm_filter._fused_gram_counts.
    feats = feats.localCheckpoint(eager=True)
    fcols = ["f1", "f2", "f3", "f4"]
    w = logreg_fit(feats, fcols, "label", iters=3, lr=1.0)
    scored = logreg_score(feats, w, fcols)
    return scored.select(
        "doc_id",
        F.col("label").cast("bigint").alias("label"),
        "p",
        (F.col("p") >= F.lit(0.5)).alias("predicted_en"),
    )


def _oracle_logreg(iters: int = 3) -> str:
    from .inventory_llm import _SQL_NORM, _STOP_LIST_SQL

    fcols = ["f1", "f2", "f3", "f4"]

    def z(w: str) -> str:
        terms = [f"({w}.b)"] + [
            f"({w}.w{j + 1}) * CAST({c} AS DOUBLE)" for j, c in enumerate(fcols)
        ]
        return " + ".join(terms)

    sql = f"""
WITH feat0 AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS label,
         string_split_regex({_SQL_NORM}, ' ') AS toks,
         text
  FROM documents),
feat AS (
  SELECT doc_id, label,
         len(list_filter(toks, x -> list_contains([{_STOP_LIST_SQL}], x))) * 1.0
           / len(toks) AS f1,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
           / length(text) AS f2,
         (list_sum(list_transform(toks, x -> length(x))) * 1.0
           / len(toks)) / 10.0 AS f3,
         CAST(len(toks) AS DOUBLE) / 100.0 AS f4
  FROM feat0),
w0 AS (SELECT CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS w1,
              CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3,
              CAST(0.0 AS DOUBLE) AS w4)"""
    prev = "w0"
    for it in range(1, iters + 1):
        zz = z("w")
        sig = f"(1.0 / (1.0 + EXP(-({zz}))))"
        sql += f""",
g{it} AS (
  SELECT ROUND(AVG({sig} - label), 6) AS g0,
         ROUND(AVG(({sig} - label) * f1), 6) AS g1,
         ROUND(AVG(({sig} - label) * f2), 6) AS g2,
         ROUND(AVG(({sig} - label) * f3), 6) AS g3,
         ROUND(AVG(({sig} - label) * f4), 6) AS g4
  FROM feat CROSS JOIN {prev} w),
w{it} AS (
  SELECT ROUND(w.b - g.g0, 6) AS b, ROUND(w.w1 - g.g1, 6) AS w1,
         ROUND(w.w2 - g.g2, 6) AS w2, ROUND(w.w3 - g.g3, 6) AS w3,
         ROUND(w.w4 - g.g4, 6) AS w4
  FROM {prev} w CROSS JOIN g{it} g)"""
        prev = f"w{it}"
    zz = z("w")
    sig = f"(1.0 / (1.0 + EXP(-({zz}))))"
    sql += f"""
SELECT doc_id, CAST(label AS BIGINT) AS label,
       ROUND({sig}, 4) AS p,
       ROUND({sig}, 4) >= 0.5 AS predicted_en
FROM feat CROSS JOIN {prev} w
"""
    return sql


QUERIES["logreg_quality"] = q_logreg_quality
ORACLE["logreg_quality"] = _oracle_logreg()


# ── DSIR importance-resampling selection ────────────────────────────


def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023): the 100 documents whose bigram
    distribution most resembles the English target slice relative to
    the raw pool — logratio = ce_raw − ce_target over the SAME gram
    occurrences, rounded before the TakeOrdered ranking."""
    from ..operators.lm_filter import dsir_select
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    return dsir_select(
        docs, F.col("lang") == "en", top_k=100, passthrough=["lang"]
    )


ORACLE_DSIR_SELECTION = """
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
sg AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, len(l) - 1),
                i -> l[i] || ' ' || l[i + 1])) AS gram
  FROM toks WHERE len(l) >= 2),
t_train AS (
  SELECT string_split(text, ' ') AS l FROM documents WHERE lang = 'en'),
t_uni AS (
  SELECT t AS w1, COUNT(*) AS c1
  FROM (SELECT unnest(l) AS t FROM t_train) GROUP BY t),
t_v AS (SELECT COUNT(*) AS vocab FROM t_uni),
t_big AS (
  SELECT gram, COUNT(*) AS c12
  FROM (SELECT unnest(list_transform(generate_series(1, len(l) - 1),
               i -> l[i] || ' ' || l[i + 1])) AS gram
        FROM t_train WHERE len(l) >= 2) GROUP BY gram),
r_train AS (SELECT string_split(text, ' ') AS l FROM documents),
r_uni AS (
  SELECT t AS w1, COUNT(*) AS c1
  FROM (SELECT unnest(l) AS t FROM r_train) GROUP BY t),
r_v AS (SELECT COUNT(*) AS vocab FROM r_uni),
r_big AS (
  SELECT gram, COUNT(*) AS c12
  FROM (SELECT unnest(list_transform(generate_series(1, len(l) - 1),
               i -> l[i] || ' ' || l[i + 1])) AS gram
        FROM r_train WHERE len(l) >= 2) GROUP BY gram),
sc AS (
  SELECT sg.doc_id, sg.lang,
         ln(CAST(COALESCE(tb.c12, 0) + 1 AS DOUBLE)
            / CAST(COALESCE(tu.c1, 0) + tv.vocab AS DOUBLE)) AS logp_t,
         ln(CAST(COALESCE(rb.c12, 0) + 1 AS DOUBLE)
            / CAST(COALESCE(ru.c1, 0) + rv.vocab AS DOUBLE)) AS logp_r
  FROM sg
  LEFT JOIN t_big tb USING (gram)
  LEFT JOIN t_uni tu ON split_part(sg.gram, ' ', 1) = tu.w1
  LEFT JOIN r_big rb USING (gram)
  LEFT JOIN r_uni ru ON split_part(sg.gram, ' ', 1) = ru.w1
  CROSS JOIN t_v tv CROSS JOIN r_v rv),
per AS (
  SELECT doc_id, lang, COUNT(*) AS n_bigrams,
         ROUND((-AVG(logp_r)) - (-AVG(logp_t)), 4) AS logratio
  FROM sc GROUP BY doc_id, lang)
SELECT doc_id, lang, n_bigrams, logratio
FROM per ORDER BY logratio DESC, doc_id ASC LIMIT 100
"""

QUERIES["dsir_selection"] = q_dsir_selection
ORACLE["dsir_selection"] = ORACLE_DSIR_SELECTION


# ── BM25 sparse retrieval ───────────────────────────────────────────


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for the query {dup, spark}: one rare term
    (high idf — it dominates the ranking) and one common term (low
    idf tf/length tiebreaker) — the sparse-retrieval baseline next to
    the dense embedding-kNN gates. tf columns ride along for
    explainability; cast to bigint so both engines hash one type."""
    from ..operators.retrieval import bm25_topk

    docs = t(spark, sf_dir, "documents")
    out = bm25_topk(docs, ["dup", "spark"], top_k=10)
    return out.select(
        "doc_id",
        "score",
        F.col("tf_dup").cast("bigint").alias("tf_dup"),
        F.col("tf_spark").cast("bigint").alias("tf_spark"),
    )


ORACLE_BM25_TOPK = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
base AS (
  SELECT doc_id, len(l) AS dl,
         len(list_filter(l, x -> x = 'dup')) AS tf_dup,
         len(list_filter(l, x -> x = 'spark')) AS tf_spark
  FROM d),
stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl,
         SUM(CASE WHEN tf_dup > 0 THEN 1 ELSE 0 END) AS df_dup,
         SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark
  FROM base)
SELECT doc_id,
  ROUND(
    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_dup AS DOUBLE) + 0.5)
             / (CAST(df_dup AS DOUBLE) + 0.5))
      * CAST(tf_dup AS DOUBLE) * 2.2
      / (CAST(tf_dup AS DOUBLE)
         + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
  + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_spark AS DOUBLE) + 0.5)
             / (CAST(df_spark AS DOUBLE) + 0.5))
      * CAST(tf_spark AS DOUBLE) * 2.2
      / (CAST(tf_spark AS DOUBLE)
         + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
  , 4) AS score,
  tf_dup, tf_spark
FROM base CROSS JOIN stats
WHERE greatest(tf_dup, tf_spark) > 0
ORDER BY score DESC, doc_id LIMIT 10
"""

QUERIES["bm25_topk"] = q_bm25_topk
ORACLE["bm25_topk"] = ORACLE_BM25_TOPK


# ── C4 cleaning battery (Raffel et al. 2020, §2.2) ──────────────────

# The synthetic corpus is single-line and unpunctuated, so the gate
# first synthesizes line structure IN-PLAN on both engines: words are
# re-chunked into 7-word lines, two of every three lines get a
# terminal period, and a deterministic sprinkle of docs receives an
# extra marker line ("lorem ipsum" / "{" / a blocklisted word) so
# every page-level rule branch is exercised by the differential.
_C4_PAGE_SPARK = """
concat(
  array_join(transform(
    sequence(0, CAST(floor((size(filter(split(text, ' '), x -> x != '')) - 1) / 7.0) AS INT)),
    i -> concat(
      array_join(slice(filter(split(text, ' '), x -> x != ''), i * 7 + 1, 7), ' '),
      CASE WHEN i % 3 < 2 THEN '.' ELSE '' END)), chr(10)),
  CASE WHEN doc_id % 97 = 0 THEN chr(10) || 'they sprinkled lorem ipsum here.' ELSE '' END,
  CASE WHEN doc_id % 89 = 5 THEN chr(10) || 'code sample with { brace here.' ELSE '' END,
  CASE WHEN doc_id % 83 = 7 THEN chr(10) || 'see the badword appear now.' ELSE '' END)
"""

_C4_PAGE_SQL = """
array_to_string(list_transform(
    generate_series(0, CAST(floor((len(list_filter(string_split(text, ' '), x -> x != '')) - 1) / 7.0) AS INT)),
    i -> array_to_string(list_slice(list_filter(string_split(text, ' '), x -> x != ''), i * 7 + 1, i * 7 + 7), ' ')
         || CASE WHEN i % 3 < 2 THEN '.' ELSE '' END), chr(10))
  || CASE WHEN doc_id % 97 = 0 THEN chr(10) || 'they sprinkled lorem ipsum here.' ELSE '' END
  || CASE WHEN doc_id % 89 = 5 THEN chr(10) || 'code sample with { brace here.' ELSE '' END
  || CASE WHEN doc_id % 83 = 7 THEN chr(10) || 'see the badword appear now.' ELSE '' END
"""


def q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page C4 verdict: first failing page rule (after the line
    filters) or NULL, plus line/sentence accounting. Map-only — the
    battery is pure Column expressions; the one-file scan is spread
    first (no-op at cluster scale), as with the Gopher gate."""
    from ..functions.c4 import c4_kept_lines, c4_reason
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    page = F.expr(_C4_PAGE_SPARK)
    lined = docs.select("doc_id", page.alias("page"))
    kept = c4_kept_lines(F.col("page"))
    reason = c4_reason(F.col("page"), blocklist=("badword",))
    return lined.select(
        "doc_id",
        reason.alias("c4_reason"),
        reason.isNull().alias("pass"),
        F.size(kept).alias("n_kept_lines"),
        F.size(
            F.regexp_extract_all(
                F.array_join(kept, "\n"), F.lit(r"[.!?]"), 0
            )
        ).alias("n_sentences"),
    )


ORACLE_C4_RULES = f"""
WITH pages AS (
  SELECT doc_id, {_C4_PAGE_SQL} AS page FROM documents),
kept AS (
  SELECT doc_id, page,
         list_filter(string_split(page, chr(10)), ln ->
           right(rtrim(ln), 1) IN ('.', '!', '?', '"')
           AND len(list_filter(string_split(trim(ln), ' '), w -> w != '')) >= 3
           AND NOT contains(lower(ln), 'javascript')) AS kl
  FROM pages),
m AS (
  SELECT doc_id, page, len(kl) AS n_kept,
         len(regexp_extract_all(array_to_string(kl, chr(10)), '[.!?]')) AS n_sent,
         contains(lower(page), 'lorem ipsum') AS lorem,
         contains(page, '{{') AS curly,
         len(list_filter(string_split_regex(lower(page), '\\s+'),
                         w -> w = 'badword')) > 0 AS blocked
  FROM kept)
SELECT doc_id,
       CASE WHEN lorem THEN 'LOREM_IPSUM'
            WHEN curly THEN 'CURLY_BRACE'
            WHEN blocked THEN 'BLOCKLIST_WORD'
            WHEN n_sent < 5 THEN 'TOO_FEW_SENTENCES'
            ELSE NULL END AS c4_reason,
       NOT (lorem OR curly OR blocked OR n_sent < 5) AS pass,
       CAST(n_kept AS INT) AS n_kept_lines,
       CAST(n_sent AS INT) AS n_sentences
FROM m
"""

QUERIES["c4_rules"] = q_c4_rules
ORACLE["c4_rules"] = ORACLE_C4_RULES


# ── BPE vocabulary training (Sennrich et al. 2016) ──────────────────


def _bpe_oracle_ctes(num_merges: int, source: str = "documents") -> str:
    """DuckDB replay of the exact merge loop: per iteration, pair
    counts (p{i}) → winning pair by (freq DESC, l, r) (b{i}) → greedy
    left-to-right merge applied via a list_reduce fold over the same
    unit-separator encoding the Spark operator uses (w{i+1})."""
    d = "\x1f"
    parts = [
        f"""w0 AS (
  SELECT word, cnt,
         list_append(list_transform(generate_series(1, length(word)),
                                    i -> substr(word, i, 1)), '</w>') AS syms
  FROM (SELECT w AS word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
              FROM {source})
        WHERE w != '' GROUP BY w))"""
    ]
    for it in range(num_merges):
        parts.append(
            f"""p{it} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, SUM(cnt) AS freq
  FROM w{it}, UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"""b{it} AS (
  SELECT {it + 1} AS rank, l, r, CAST(freq AS BIGINT) AS freq FROM p{it}
  ORDER BY freq DESC, l, r LIMIT 1)"""
        )
        parts.append(
            f"""w{it + 1} AS (
  SELECT word, cnt,
    list_filter(string_split(list_reduce(list_prepend('', syms),
      (acc, x) -> CASE WHEN x = b.r AND ends_with(acc, '{d}' || b.l)
           THEN substr(acc, 1, length(acc) - length(b.l) - 1) || '{d}' || b.l || b.r
           ELSE acc || '{d}' || x END), '{d}'), s -> s != '') AS syms
  FROM w{it}, b{it} b)"""
        )
    return ",\n".join(parts)


_BPE_MERGES = 8
# the driver imports __spark_entry__ cold and may call each gate more
# than once — train once per sf_dir (skill-note pattern, like the
# persisted IVF index)
_BPE_CACHE: dict[str, tuple] = {}


def _bpe_trained(spark: SparkSession, sf_dir: str):
    if sf_dir not in _BPE_CACHE:
        from ..operators.bpe import bpe_train

        _BPE_CACHE[sf_dir] = bpe_train(
            t(spark, sf_dir, "documents"), num_merges=_BPE_MERGES
        )
    return _BPE_CACHE[sf_dir]


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge list: (rank, left_sym, right_sym, freq) for
    ``_BPE_MERGES`` iterations over the documents corpus — one
    vocab-sized pair-count aggregation + one driver row per merge."""
    from ..operators.bpe import merge_table

    merges, _ = _bpe_trained(spark, sf_dir)
    return merge_table(spark, merges)


ORACLE_BPE_TRAIN = f"""
WITH {_bpe_oracle_ctes(_BPE_MERGES)}
SELECT rank, l AS left_sym, r AS right_sym, freq
FROM ({' UNION ALL '.join(f'SELECT * FROM b{i}' for i in range(_BPE_MERGES))})
"""


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token counts via the trained vocabulary join
    (never per-character work over the corpus): (doc_id, n_words,
    n_bpe_tokens) after ``_BPE_MERGES`` merges."""
    from ..operators.bpe import bpe_encode_counts

    _, words = _bpe_trained(spark, sf_dir)
    return bpe_encode_counts(t(spark, sf_dir, "documents"), words)


ORACLE_BPE_ENCODE = f"""
WITH {_bpe_oracle_ctes(_BPE_MERGES)}
SELECT d.doc_id, COUNT(*) AS n_words,
       CAST(SUM(COALESCE(len(w.syms), length(d.word) + 1)) AS BIGINT)
         AS n_bpe_tokens
FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word
      FROM documents) d
LEFT JOIN w{_BPE_MERGES} w USING (word)
WHERE d.word != ''
GROUP BY d.doc_id
"""

QUERIES["bpe_train"] = q_bpe_train
ORACLE["bpe_train"] = ORACLE_BPE_TRAIN
QUERIES["bpe_encode"] = q_bpe_encode
ORACLE["bpe_encode"] = ORACLE_BPE_ENCODE


# ── round-7 wave: tf-idf retrieval, soft dedup, sentence dedup, ────
#    contamination matrix, trigram stupid backoff, zipf spectrum


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf cosine top-10 for {vector, merge, window} — the
    vector-space retrieval twin of the BM25 gate: same tokenization,
    but the score needs every document's FULL weight norm, so the
    plan builds the corpus vocabulary (idf relation) instead of
    per-term literal tf columns."""
    from ..operators.retrieval import tfidf_topk
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    return tfidf_topk(docs, ["vector", "merge", "window"], top_k=10)


ORACLE_TFIDF_TOPK = """
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY 1, 2),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
idf AS (
  SELECT term, ln((1.0 + n_docs) / (1.0 + CAST(COUNT(*) AS DOUBLE))) + 1.0 AS idf
  FROM tf CROSS JOIN nd GROUP BY term, n_docs),
w AS (
  SELECT tf.doc_id, tf.term, CAST(tf.tf AS DOUBLE) * idf.idf AS w, idf.idf
  FROM tf JOIN idf USING (term)),
pd AS (
  SELECT doc_id, SUM(w * w) AS norm2,
         SUM(CASE WHEN term IN ('vector', 'merge', 'window')
                  THEN w * idf ELSE 0.0 END) AS dot
  FROM w GROUP BY doc_id),
qn AS (
  SELECT SUM(qidf * qidf) AS qnorm2 FROM (
    SELECT COALESCE(idf.idf, ln(1.0 + n_docs) + 1.0) AS qidf
    FROM (VALUES ('vector'), ('merge'), ('window')) q(term)
    LEFT JOIN idf USING (term) CROSS JOIN nd))
SELECT doc_id,
       ROUND(dot / (sqrt(norm2) * sqrt(qnorm2)), 4) AS score,
       ROUND(dot, 4) AS dot, ROUND(sqrt(norm2), 4) AS norm
FROM pd CROSS JOIN qn
WHERE dot > 0
ORDER BY score DESC, doc_id LIMIT 10
"""

QUERIES["tfidf_topk"] = q_tfidf_topk
ORACLE["tfidf_topk"] = ORACLE_TFIDF_TOPK


def q_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDedup reweighting over the corpus: word-trigram commonness
    → per-doc dup_score/weight + the seeded deterministic keep/drop.
    The corpus' planted near-duplicates are exactly the docs whose
    shared trigrams push dup_score up."""
    from ..operators.soft_dedup import soft_dedup
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    return soft_dedup(docs, n=3, passthrough=["lang"])


ORACLE_SOFT_DEDUP = f"""
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
g AS (
  SELECT doc_id, array_to_string(l[pos:pos + 2], ' ') AS gram
  FROM d, LATERAL (
    SELECT unnest(range(1, greatest(len(l) - 2, 0) + 1)) AS pos)),
f AS (SELECT gram, COUNT(*) AS cf FROM g GROUP BY gram),
s AS (
  SELECT doc_id, COUNT(*) AS n_grams, AVG(ln(cf)) AS raw
  FROM g JOIN f USING (gram) GROUP BY doc_id),
w AS (
  SELECT d.doc_id, d.lang,
         CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams, s.raw,
         CASE WHEN s.raw IS NULL THEN 1.0
              ELSE greatest(1.0 / (1.0 + s.raw), 0.1) END AS wt,
         md5('softdedup-v1:' || CAST(d.doc_id AS VARCHAR)) AS h
  FROM d LEFT JOIN s USING (doc_id))
SELECT doc_id, lang, n_grams, ROUND(raw, 4) AS dup_score,
       ROUND(wt, 4) AS weight,
       (CAST(({_md5_hex8_bigint_sql()}) AS DOUBLE) / 4294967296.0) < wt
         AS kept
FROM w
"""

QUERIES["soft_dedup"] = q_soft_dedup
ORACLE["soft_dedup"] = ORACLE_SOFT_DEDUP


def q_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-global keep-first sentence dedup. The word-soup
    corpus has no punctuation, so pseudo-sentences are fixed-width
    word groups whose width varies per doc (5 + doc_id % 4) — both
    engines derive the identical segmentation, then the operator's
    global keep-first decision and reassembly run on the Spark side
    only. Cleaned text is hashed (md5) so the gate compares
    reassembly byte-for-byte without hauling full texts."""
    from ..operators.sentence_dedup import (
        fixed_width_sentences,
        sentence_dedup,
    )
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    width = (F.lit(5) + F.col("doc_id") % 4).cast("int")
    out = sentence_dedup(docs, fixed_width_sentences(F.col("text"), width))
    return out.select(
        "doc_id",
        "n_sentences",
        "n_removed",
        F.md5("text_clean").alias("clean_md5"),
    )


ORACLE_SENTENCE_DEDUP = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS l,
         5 + doc_id % 4 AS w
  FROM documents),
s AS (
  SELECT doc_id, g AS pos,
         array_to_string(l[(g * w + 1):(g * w + w)], ' ') AS sentence
  FROM d, LATERAL (
    SELECT unnest(range(0, greatest(CAST(ceil(CAST(len(l) AS DOUBLE) / w)
                                    AS BIGINT), 1))) AS g)),
tagged AS (
  SELECT doc_id, pos, sentence,
         ROW_NUMBER() OVER (PARTITION BY md5(sentence)
                            ORDER BY doc_id, pos) = 1 AS keep
  FROM s WHERE sentence <> '')
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_sentences,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       md5(COALESCE(string_agg(CASE WHEN keep THEN sentence END, ' '
                               ORDER BY pos), '')) AS clean_md5
FROM tagged GROUP BY doc_id
"""

QUERIES["sentence_dedup"] = q_sentence_dedup
ORACLE["sentence_dedup"] = ORACLE_SENTENCE_DEDUP


def q_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-benchmark decontamination audit: three synthetic eval
    suites (doc_id % 10 = 0; doc_id % 7 = 0; source = 'src0') probed
    against the disjoint train remainder in one pass — the release
    report published next to the single-set decontamination filter."""
    from ..operators.data_mix import contamination_matrix

    docs = t(spark, sf_dir, "documents")
    train = docs.filter(
        (F.col("doc_id") % 10 != 0)
        & (F.col("doc_id") % 7 != 0)
        & (F.col("source") != "src0")
    )
    evals = {
        "mod10": docs.filter(F.col("doc_id") % 10 == 0),
        "mod7": docs.filter(F.col("doc_id") % 7 == 0),
        "src0": docs.filter(F.col("source") == "src0"),
    }
    return contamination_matrix(train, evals, k=16)


ORACLE_CONTAMINATION_MATRIX = f"""
WITH d AS (
  SELECT doc_id, source, {_SQL_NORM} AS nrm FROM documents),
sh AS (
  SELECT doc_id, source,
         md5(substr(nrm, CAST(pos AS INTEGER), 16)) AS shingle
  FROM d, LATERAL (
    SELECT unnest(range(1, greatest(length(nrm) - 15, 1) + 1)) AS pos)),
trs AS (
  SELECT DISTINCT doc_id, shingle FROM sh
  WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0 AND source <> 'src0'),
evs AS (
  SELECT 'mod10' AS benchmark, shingle FROM
    (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0)
  UNION ALL
  SELECT 'mod7' AS benchmark, shingle FROM
    (SELECT DISTINCT shingle FROM sh WHERE doc_id % 7 = 0)
  UNION ALL
  SELECT 'src0' AS benchmark, shingle FROM
    (SELECT DISTINCT shingle FROM sh WHERE source = 'src0')),
hits AS (
  SELECT benchmark, doc_id, COUNT(*) AS n_sh
  FROM trs JOIN evs USING (shingle)
  GROUP BY benchmark, doc_id),
agg AS (
  SELECT benchmark, COUNT(*) AS n_contaminated,
         SUM(n_sh) AS shared_occurrences
  FROM hits GROUP BY benchmark)
SELECT b.benchmark,
       CAST(COALESCE(n_contaminated, 0) AS BIGINT) AS n_contaminated,
       CAST(COALESCE(shared_occurrences, 0) AS BIGINT)
         AS shared_occurrences
FROM (VALUES ('mod10'), ('mod7'), ('src0')) b(benchmark)
LEFT JOIN agg USING (benchmark)
"""

QUERIES["contamination_matrix"] = q_contamination_matrix
ORACLE["contamination_matrix"] = ORACLE_CONTAMINATION_MATRIX


def q_trigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram cross-entropy: train on the English
    slice, score every document. Non-English docs fall through the
    backoff chain to the unigram floor — measurably worse scores,
    which is the screen's whole point. Extends the bigram CCNet gate
    with the backoff CASE over five model joins."""
    from ..operators.lm_filter import (
        score_stupid_backoff,
        train_trigram_lm,
    )
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    # round-13: training is the FUSED single-pass form — one tagged
    # explode + ONE shuffle counts tri+bi+unigrams together and the
    # materialized model feeds all five scoring joins and the totals
    # (operators.lm_filter._fused_gram_counts).  The round-12
    # checkpoint-only probe (TrigramLM.materialized(): min 2.50 s vs
    # 2.49 s) saved passes but paid extra materialization JOBS; the
    # fusion removes the passes AND the per-order shuffles at once.
    # Production reuse should still persist the model once per
    # revision (the operator docstring's contract).
    model = train_trigram_lm(docs.filter(F.col("lang") == "en"))
    return score_stupid_backoff(docs, model, passthrough=["lang"])


ORACLE_TRIGRAM_PPL = """
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
ref AS (SELECT l FROM toks WHERE lang = 'en'),
uni AS (
  SELECT w, COUNT(*) AS c1
  FROM (SELECT unnest(l) AS w FROM ref) GROUP BY w),
big AS (
  SELECT array_to_string(l[pos:pos + 1], ' ') AS gram, COUNT(*) AS c12
  FROM ref, LATERAL (
    SELECT unnest(range(1, greatest(len(l) - 1, 0) + 1)) AS pos)
  GROUP BY gram),
tri AS (
  SELECT array_to_string(l[pos:pos + 2], ' ') AS gram, COUNT(*) AS c123
  FROM ref, LATERAL (
    SELECT unnest(range(1, greatest(len(l) - 2, 0) + 1)) AS pos)
  GROUP BY gram),
tot AS (
  SELECT CAST(SUM(c1) AS DOUBLE) AS t, CAST(COUNT(*) AS DOUBLE) AS v
  FROM uni),
g AS (
  SELECT doc_id, array_to_string(l[pos:pos + 2], ' ') AS g123
  FROM toks, LATERAL (
    SELECT unnest(range(1, greatest(len(l) - 2, 0) + 1)) AS pos)),
k AS (
  SELECT doc_id, g123,
         split_part(g123, ' ', 1) || ' ' || split_part(g123, ' ', 2) AS g12,
         split_part(g123, ' ', 2) || ' ' || split_part(g123, ' ', 3) AS g23,
         split_part(g123, ' ', 2) AS w2, split_part(g123, ' ', 3) AS w3
  FROM g),
sc AS (
  SELECT doc_id,
         CASE WHEN COALESCE(tri.c123, 0) > 0
                THEN CAST(tri.c123 AS DOUBLE) / CAST(b12.c12 AS DOUBLE)
              WHEN COALESCE(b23.c12, 0) > 0
                THEN 0.4 * CAST(b23.c12 AS DOUBLE) / CAST(u2.c1 AS DOUBLE)
              ELSE 0.4 * 0.4 * (CAST(COALESCE(u3.c1, 0) AS DOUBLE) + 1.0)
                   / (t + v) END AS s
  FROM k
  LEFT JOIN tri ON k.g123 = tri.gram
  LEFT JOIN big b12 ON k.g12 = b12.gram
  LEFT JOIN big b23 ON k.g23 = b23.gram
  LEFT JOIN uni u2 ON k.w2 = u2.w
  LEFT JOIN uni u3 ON k.w3 = u3.w
  CROSS JOIN tot),
per AS (
  SELECT doc_id, COUNT(*) AS n_trigrams, AVG(-ln(s)) AS ce
  FROM sc GROUP BY doc_id)
SELECT d.doc_id, d.lang,
       CAST(COALESCE(per.n_trigrams, 0) AS BIGINT) AS n_trigrams,
       ROUND(per.ce, 4) AS cross_entropy
FROM documents d LEFT JOIN per USING (doc_id)
"""

QUERIES["trigram_ppl"] = q_trigram_ppl
ORACLE["trigram_ppl"] = ORACLE_TRIGRAM_PPL


def q_zipf_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf rank–frequency OLS fit over the top-100
    tokens — the cheap corpus-health probe next to the per-document
    screens. Rank ties (constant in word soup) break on token text so
    both engines fit the identical point set."""
    from ..operators.corpus_stats import zipf_spectrum
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    return zipf_spectrum(docs, group_col="lang", top_r=100)


ORACLE_ZIPF_SPECTRUM = """
WITH ex AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
freq AS (
  SELECT lang, token, COUNT(*) AS freq
  FROM ex WHERE token <> '' GROUP BY lang, token),
totals AS (
  SELECT lang, CAST(SUM(freq) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM freq GROUP BY lang),
ranked AS (
  SELECT lang,
         ln(CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY freq DESC, token) AS DOUBLE))
           AS lr,
         ln(CAST(freq AS DOUBLE)) AS lf
  FROM freq QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY freq DESC, token) <= 100),
fit AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS top_r,
         ROUND(regr_slope(lf, lr), 4) AS zipf_slope,
         ROUND(regr_r2(lf, lr), 4) AS zipf_r2
  FROM ranked GROUP BY lang)
SELECT totals.lang, n_tokens, vocab, top_r, zipf_slope, zipf_r2
FROM totals JOIN fit USING (lang)
"""

QUERIES["zipf_spectrum"] = q_zipf_spectrum
ORACLE["zipf_spectrum"] = ORACLE_ZIPF_SPECTRUM


def q_zipf_spectrum_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-corpus (ungrouped) Zipf fit — drives the round-9 global
    path, where the top-R cut is an explicit orderBy+limit
    (TakeOrderedAndProject) because the rank window's empty partition
    spec would otherwise single-partition the entire vocabulary
    (InferWindowGroupLimit does not fire ungrouped; see
    operators/corpus_stats.py and the plan test in
    tests/test_round7_operators.py)."""
    from ..operators.corpus_stats import zipf_spectrum
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    return zipf_spectrum(docs, group_col=None, top_r=100)


ORACLE_ZIPF_GLOBAL = """
WITH ex AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
freq AS (
  SELECT token, COUNT(*) AS freq
  FROM ex WHERE token <> '' GROUP BY token),
totals AS (
  SELECT CAST(SUM(freq) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM freq),
ranked AS (
  SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token)
                 AS DOUBLE)) AS lr,
         ln(CAST(freq AS DOUBLE)) AS lf
  FROM freq QUALIFY ROW_NUMBER() OVER (ORDER BY freq DESC, token) <= 100),
fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS top_r,
         ROUND(regr_slope(lf, lr), 4) AS zipf_slope,
         ROUND(regr_r2(lf, lr), 4) AS zipf_r2
  FROM ranked)
SELECT n_tokens, vocab, top_r, zipf_slope, zipf_r2
FROM totals CROSS JOIN fit
"""

QUERIES["zipf_spectrum_global"] = q_zipf_spectrum_global
ORACLE["zipf_spectrum_global"] = ORACLE_ZIPF_GLOBAL


# ── round-7 wave 2: containment, DoReMi-lite mixing, novelty ────────

# shared shingle CTEs: distinct normalized word-3-gram shingles per
# doc — the DuckDB twin of functions.text.word_shingles(k=3)
_SQL_SHINGLES_3 = f"""
d0 AS (SELECT doc_id, string_split_regex({_SQL_NORM}, ' ') AS toks
       FROM documents),
dsh AS (SELECT doc_id,
          list_distinct(list_transform(
            range(1, greatest(len(toks) - 2, 1) + 1),
            i -> array_to_string(toks[i:least(i + 2, len(toks))], ' ')))
            AS sh
        FROM d0)"""


def q_containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (Broder 1997) at C >= 0.8 over
    word-3-gram shingles: catches the subset duplicate (short doc
    quoted inside a long one) that symmetric Jaccard misses. The
    candidate space is the shared-shingle self-join (id, 32-hex rows),
    never all pairs; the oracle replays exact set containment."""
    from ..operators.containment import containment_pairs
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    return containment_pairs(docs, threshold=0.8, k=3)


ORACLE_CONTAINMENT = f"""
WITH {_SQL_SHINGLES_3},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.sh, b.sh)) AS n_shared,
         len(a.sh) AS n_a, len(b.sh) AS n_b
  FROM dsh a JOIN dsh b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(n_shared * 1.0 / n_a, 6) AS c_ab,
       ROUND(n_shared * 1.0 / n_b, 6) AS c_ba
FROM pairs
WHERE n_shared > 0
  AND greatest(n_shared * 1.0 / n_a, n_shared * 1.0 / n_b) >= 0.8
"""

QUERIES["containment_near_dup"] = q_containment_near_dup
ORACLE["containment_near_dup"] = ORACLE_CONTAINMENT


def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-lite domain mixture weights over the language domains:
    closed-form unigram-KL excess loss + 3 exponentiated-gradient
    steps (eta 0.5, smoothing 0.2). The oracle replays the identical
    update with unrolled CTEs."""
    from ..operators.data_mix import doremi_weights

    docs = t(spark, sf_dir, "documents")
    return doremi_weights(
        docs, domain_col="lang", iters=3, eta=0.5, smoothing=0.2
    )


def _doremi_update_ctes(iters: int, eta: float, smoothing: float) -> str:
    steps = []
    for i in range(iters):
        steps.append(
            f"""a{i + 1} AS (
  SELECT domain, n_docs, n_tokens, share, excess, kk,
         {1.0 - smoothing} * (a * exp({eta} * excess))
           / SUM(a * exp({eta} * excess)) OVER ()
         + {smoothing} / kk AS a
  FROM a{i})"""
        )
    return ",\n".join(steps)


ORACLE_DOREMI = f"""
WITH ex AS (
  SELECT lang AS domain, unnest(string_split(text, ' ')) AS w
  FROM documents),
dw AS (SELECT domain, w, COUNT(*) AS cd FROM ex WHERE w <> ''
       GROUP BY 1, 2),
cw AS (SELECT w, SUM(cd) AS cc FROM dw GROUP BY w),
td AS (SELECT domain, SUM(cd) AS tdn FROM dw GROUP BY domain),
tot AS (SELECT CAST(SUM(cd) AS DOUBLE) AS t FROM dw),
nd AS (SELECT lang AS domain, COUNT(*) AS n_docs FROM documents
       GROUP BY 1),
kl AS (
  SELECT dw.domain,
         SUM(cd * (ln(CAST(cd AS DOUBLE) / tdn)
                   - ln(CAST(cc AS DOUBLE) / t))) / tdn AS excess,
         CAST(tdn AS DOUBLE) / t AS share, tdn AS n_tokens
  FROM dw JOIN cw USING (w) JOIN td USING (domain) CROSS JOIN tot
  GROUP BY dw.domain, tdn, t),
k AS (SELECT CAST(COUNT(*) AS DOUBLE) AS kk FROM nd),
a0 AS (
  -- LEFT join from nd: a token-less domain keeps share/excess 0 and
  -- the smoothing-floor weight (mirrors the operator's ADVICE fix)
  SELECT nd.domain, nd.n_docs,
         COALESCE(kl.n_tokens, 0) AS n_tokens,
         COALESCE(kl.share, 0.0) AS share,
         COALESCE(kl.excess, 0.0) AS excess,
         k.kk, 1.0 / k.kk AS a
  FROM nd LEFT JOIN kl USING (domain) CROSS JOIN k),
{_doremi_update_ctes(3, 0.5, 0.2)}
SELECT domain, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(share, 6) AS base_share,
       ROUND(excess, 4) AS excess_loss,
       ROUND(a, 4) AS weight
FROM a3
"""

QUERIES["doremi_weights"] = q_doremi_weights
ORACLE["doremi_weights"] = ORACLE_DOREMI


def q_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus n-gram novelty: even doc_ids play the at-rest
    reference corpus, odd doc_ids are the arriving snapshot — per-doc
    fraction of distinct word-3-grams unseen in the reference (the
    keep-what's-new selection signal; decontamination's shuffle shape
    with the verdict inverted)."""
    from ..operators.corpus_stats import novelty_scores
    from ..operators.spread import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents"))
    return novelty_scores(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        n=3,
    )


ORACLE_NOVELTY = f"""
WITH {_SQL_SHINGLES_3},
ref AS (SELECT DISTINCT unnest(sh) AS g FROM dsh WHERE doc_id % 2 = 0),
cand AS (SELECT doc_id, unnest(sh) AS g FROM dsh WHERE doc_id % 2 = 1)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       ROUND(SUM(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS novelty
FROM cand LEFT JOIN ref USING (g)
GROUP BY doc_id
"""

QUERIES["novelty_scores"] = q_novelty_scores
ORACLE["novelty_scores"] = ORACLE_NOVELTY
