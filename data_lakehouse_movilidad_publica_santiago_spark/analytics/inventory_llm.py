"""LLM-training-data operator inventory (beyond-reference, required by
BASELINE.json's north star): dedup, similarity search, text analysis,
multimodal plumbing, streaming-shaped windows — over the driver's
``documents`` / ``embeddings`` / ``events`` tables, each with a DuckDB
oracle where the math is SQL-expressible.

Probabilistic operators (MinHash-LSH, LSH-ANN, LSH near-dup) are
gated against their EXACT twins' SQL: their banding parameters are
chosen with MEASURED recall 1.0 on this corpus (pinned by
``tests/test_lsh_recall.py``), so LSH output = exact output and the
exact SQL is a valid oracle. SimHash and winnowing run on md5-derived
sketches the DuckDB oracle recomputes bit-identically (xxhash64
variants stay the production defaults), so every query here is fully
oracle-gated.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    predict_lang,
    quality_score,
    token_count,
)
from ..operators.clustering import (
    canonical_survivors,
    connected_components,
    connected_components_oracle_sql,
)
from ..operators.dedup_text import (
    _md5_hex8_bigint_sql,
    build_minhash_index,
    exact_dup_groups,
    jaccard_pairs_exact,
    minhash_dedup_incremental,
    minhash_lsh_pairs,
    simhash_md5_oracle_sql,
    simhash_pairs,
    winnowing_fingerprints,
    winnowing_oracle_sql,
)
from ..operators.multimodal import (
    extract_features,
    synthesize_media_from_documents,
)
from ..operators.similarity import (
    build_ivf_index,
    cosine_topk,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    ivf_topk,
    ivf_topk_indexed,
    lsh_topk,
)
from .inventory import t

# normalization shared by the SQL oracles (mirror of text.normalize_text)
_SQL_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_SQL_TOKENS = f"list_distinct(string_split_regex({_SQL_NORM}, ' '))"

from ..functions.text import QUALITY_STOPWORDS  # noqa: E402 — shared list

_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)

# per-document quality score (doc_id, score) — shared by the
# doc_quality histogram oracle and the dedup-survivor keep-one oracle
_SQL_DOC_SCORE = f"""
WITH feat AS (
  SELECT doc_id,
    length(text) AS n_chars,
    string_split_regex({_SQL_NORM}, ' ') AS toks,
    length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
      / NULLIF(length(text), 0) AS punct_ratio
  FROM documents),
feat2 AS (
  SELECT doc_id, n_chars, punct_ratio,
    len(list_filter(toks, x -> list_contains([{_STOP_LIST_SQL}], x))) * 1.0
      / NULLIF(len(toks), 0) AS stop_ratio,
    list_sum(list_transform(toks, x -> length(x))) * 1.0
      / NULLIF(len(toks), 0) AS mwl
  FROM feat)
SELECT doc_id, ROUND(CAST(
    0.25 * (CASE WHEN n_chars BETWEEN 50 AND 2000 THEN 1.0 ELSE 0.5 END)
  + 0.25 * (CASE WHEN punct_ratio < 0.1 THEN 1.0 ELSE 0.0 END)
  + 0.25 * (CASE WHEN stop_ratio >= 0.05 THEN 1.0 ELSE 0.0 END)
  + 0.25 * (CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
  AS DOUBLE), 2) AS score
FROM feat2
"""


# ── dedup ───────────────────────────────────────────────────────────


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup key per document: md5 of normalized text (the
    hash-groupBy dedup primitive, value-checked against DuckDB md5)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    )


ORACLE_DOC_FINGERPRINTS = f"""
SELECT doc_id, md5({_SQL_NORM}) AS fingerprint FROM documents
"""


def q_exact_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact-dup stats (groups with >1 member)."""
    docs = t(spark, sf_dir, "documents")
    groups = exact_dup_groups(docs, "doc_id", "text")
    total = docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(doc_fingerprint(F.col("text"))).alias("n_distinct"),
    )
    dup = groups.agg(
        F.count("*").alias("n_dup_groups"),
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_dup_docs"),
    )
    return total.crossJoin(dup)


ORACLE_EXACT_DEDUP_SUMMARY = f"""
WITH fp AS (SELECT doc_id, md5({_SQL_NORM}) AS f FROM documents),
g AS (SELECT f, COUNT(*) AS n FROM fp GROUP BY f HAVING COUNT(*) > 1)
SELECT (SELECT COUNT(*) FROM fp)            AS n_docs,
       (SELECT COUNT(DISTINCT f) FROM fp)   AS n_distinct,
       (SELECT COUNT(*) FROM g)             AS n_dup_groups,
       CAST((SELECT COALESCE(SUM(n), 0) FROM g) AS BIGINT) AS n_dup_docs
"""


def q_token_jaccard_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs on token-SET Jaccard ≥ 0.9 (unigram
    shingles), size-band pruned — summarized per doc_a to keep the
    result compact and order-free."""
    docs = t(spark, sf_dir, "documents")
    pairs = jaccard_pairs_exact(docs, "doc_id", "text", threshold=0.9, k=1)
    return pairs.groupBy("doc_a").agg(
        F.count("*").alias("n_near_dups"),
        F.sum("n_inter").alias("sum_inter"),
        F.sum("n_union").alias("sum_union"),
        F.max("doc_b").alias("max_doc_b"),
    )


ORACLE_TOKEN_JACCARD = f"""
WITH d AS (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.ts, b.ts)) AS n_inter,
         len(list_distinct(a.ts || b.ts)) AS n_union,
         ROUND(len(list_intersect(a.ts, b.ts)) * 1.0
               / len(list_distinct(a.ts || b.ts)), 6) AS jac
  FROM d a JOIN d b ON a.doc_id < b.doc_id)
SELECT doc_a, COUNT(*) AS n_near_dups,
       CAST(SUM(n_inter) AS BIGINT) AS sum_inter,
       CAST(SUM(n_union) AS BIGINT) AS sum_union, MAX(doc_b) AS max_doc_b
FROM pairs WHERE jac >= 0.9
GROUP BY doc_a
"""


def q_minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs on word-3-gram shingles, Jaccard
    ≥ 0.5, exact-verified (precision 1.0 by construction). This is
    the 100 TB dedup path. Recall with 16 bands of 4 rows is
    1-(1-j^4)^16 — ≥0.998 for j ≥ 0.7, and MEASURED 1.0 on this
    corpus (every true pair found; pinned by test_lsh_recall), so
    the exact-Jaccard SQL twin is declared as the oracle."""
    docs = t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, k=3, num_perm=64, bands=16
    )


# exact word-3-gram Jaccard — the LSH query's oracle (valid because
# the banding above has measured recall 1.0 on this corpus; precision
# is 1.0 by exact verification)
_SQL_TOKS_RAW = f"string_split_regex({_SQL_NORM}, ' ')"
ORACLE_MINHASH_LSH = f"""
WITH d0 AS (SELECT doc_id, {_SQL_TOKS_RAW} AS toks FROM documents),
d AS (SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(toks)-2, 1)+1),
          i -> array_to_string(toks[i:least(i+2, len(toks))], ' '))) AS sh
      FROM d0),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
               / len(list_distinct(a.sh || b.sh)), 6) AS jac
  FROM d a JOIN d b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b, jac FROM pairs WHERE jac >= 0.5
"""


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 8) via 4-bit chunk banding,
    on the 60-bit md5-nibble sketch that DuckDB can recompute
    bit-identically — so the O(N²) true-Hamming SQL is a full
    differential oracle (banding recall for Hamming ≤ 14 is 1.0 by
    pigeonhole, and 8 < 14). The xxhash64 sketch stays the production
    default with its own pigeonhole completeness property test in
    test_lsh_recall."""
    docs = t(spark, sf_dir, "documents")
    pairs = simhash_pairs(
        docs, "doc_id", "text", max_hamming=8, hash_fn="md5"
    )
    return pairs.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


ORACLE_SIMHASH_NEAR_DUP = simhash_md5_oracle_sql(
    "documents", "text", max_hamming=8
)


def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (MOSS scheme:
    char-8-gram hashes, min of each 4-gram window), summarized per doc.
    The hash is md5-nibble-derived so the DuckDB oracle recomputes the
    identical fingerprint sets."""
    docs = t(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(
        docs, "doc_id", "text", k=8, w=4, hash_fn="md5"
    )
    return fps.groupBy("doc_id").agg(
        F.count("*").alias("n_fps"),
        F.min("fingerprint").alias("min_fp"),
        F.max("fingerprint").alias("max_fp"),
        F.sum("fingerprint").alias("sum_fp"),
    )


ORACLE_WINNOWING = f"""
WITH fps AS ({winnowing_oracle_sql("documents", "doc_id", "text", k=8, w=4)})
SELECT doc_id, COUNT(*) AS n_fps, MIN(fingerprint) AS min_fp,
       MAX(fingerprint) AS max_fp,
       CAST(SUM(fingerprint) AS BIGINT) AS sum_fp
FROM fps GROUP BY doc_id
"""


# ── pairs → clusters → survivors (the dedup last mile) ──────────────


def _near_dup_pair_union(docs: DataFrame) -> DataFrame:
    """The cluster gate's pair graph: MinHash-LSH (word-3-gram Jaccard
    ≥ 0.5) ∪ SimHash (md5 sketch, Hamming ≤ 8) — both individually
    oracle-gated above, so the union IS the oracle's pair set."""
    mh = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, k=3, num_perm=64, bands=16
    ).select("doc_a", "doc_b")
    sh = simhash_pairs(
        docs, "doc_id", "text", max_hamming=8, hash_fn="md5"
    ).select("doc_a", "doc_b")
    return mh.unionByName(sh)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph: one row per
    paired document, cluster_id = min doc_id of its component
    (deterministic, pair-order independent)."""
    docs = t(spark, sf_dir, "documents")
    return connected_components(_near_dup_pair_union(docs))


# the same pair sets the Spark side unions, as standalone SELECTs
_MH_PAIRS_SQL = f"""
WITH d0 AS (SELECT doc_id, {_SQL_TOKS_RAW} AS toks FROM documents),
d AS (SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(toks)-2, 1)+1),
          i -> array_to_string(toks[i:least(i+2, len(toks))], ' '))) AS sh
      FROM d0),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.sh, b.sh)) * 1.0
           / len(list_distinct(a.sh || b.sh)) AS jac
  FROM d a JOIN d b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b FROM pairs WHERE ROUND(jac, 6) >= 0.5
"""
_SH_PAIRS_SQL = simhash_md5_oracle_sql("documents", "text", max_hamming=8)

ORACLE_DEDUP_CLUSTERS = connected_components_oracle_sql(
    [_MH_PAIRS_SQL, _SH_PAIRS_SQL]
)


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one per dedup cluster: highest quality_score wins, ties to
    the lowest doc_id; unpaired documents survive as singletons.  One
    row per cluster: (doc_id, cluster_id, n_members, score)."""
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.round(quality_score(F.col("text"), QUALITY_STOPWORDS), 2).alias(
            "score"
        ),
    )
    cc = connected_components(_near_dup_pair_union(docs))
    return canonical_survivors(scored, cc, "doc_id", "score")


ORACLE_DEDUP_SURVIVORS = f"""
WITH
cc AS ({ORACLE_DEDUP_CLUSTERS}),
m AS (SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id),
s AS ({_SQL_DOC_SCORE}),
sized AS (
  SELECT m.doc_id, m.cluster_id,
         COUNT(*) OVER (PARTITION BY m.cluster_id) AS n_members,
         s.score,
         ROW_NUMBER() OVER (PARTITION BY m.cluster_id
                            ORDER BY s.score DESC, m.doc_id ASC) AS rn
  FROM m JOIN s ON m.doc_id = s.doc_id)
SELECT doc_id, cluster_id, n_members, score FROM sized WHERE rn = 1
"""


# ── similarity search ───────────────────────────────────────────────


# fetch-once-per-process gate parameter (round-12): every ANN gate
# re-collected the vec_id=0 query vector from parquet per invocation —
# one whole Spark job apiece across ~15 headliners.  Same
# prebuilt-state pattern as the index/codebook caches; cleared in
# lockstep by _cleanup_index_caches.  Keys include the embeddings
# parquet's (mtime_ns, size) — like pq._META_CACHE — so regenerating
# data under the same sf_dir invalidates the entry instead of serving
# stale vectors/params (ADVICE r12).
_QUERY_VEC_CACHE: dict[tuple, list[float]] = {}


def _emb_cache_key(sf_dir: str) -> tuple:
    """(sf_dir, mtime_ns, size) of the embeddings parquet — the
    invalidation key for every cache derived from that table."""
    import os as _os

    try:
        st = _os.stat(f"{sf_dir}/embeddings.parquet")
        return (sf_dir, st.st_mtime_ns, st.st_size)
    except OSError:
        return (sf_dir, 0, 0)


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    key = _emb_cache_key(sf_dir)
    if key not in _QUERY_VEC_CACHE:
        row = (
            t(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == 0)
            .select("embedding")
            .collect()[0]
        )
        _QUERY_VEC_CACHE[key] = [float(x) for x in row["embedding"]]
    return list(_QUERY_VEC_CACHE[key])


def q_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for the vec_id=0 query vector
    (ranked on the ROUNDED similarity so rank ties are stable across
    engines)."""
    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _query_vec(spark, sf_dir), k=10)


ORACLE_EMBEDDING_KNN = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS cos_sim
  FROM embeddings e CROSS JOIN q)
SELECT vec_id, cos_sim,
       ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= 10
"""


def q_embedding_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: multi-table sign-hyperplane LSH bucket probe
    (+Hamming-1), exact rescoring inside the candidate set.

    Loose banding (2 planes × 8 tables) because this corpus's true
    neighbors are only weakly similar (cos ≈ 0.28-0.37, near-random
    vectors) — sign-LSH must probe almost everything to keep them,
    which these parameters do: MEASURED recall 1.0 (= exact top-10,
    pinned by test_lsh_recall), so the exact-kNN SQL is the oracle.
    High-similarity production corpora use the tight defaults."""
    emb = t(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb, _query_vec(spark, sf_dir), k=10, n_planes=2, n_tables=8
    )


def q_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: seeded spherical k-means coarse quantizer (8 cells),
    probe the 4 cells nearest the query, exact rescoring inside the
    candidate set. Complements sign-LSH: IVF cells adapt to the data
    distribution, so it reaches MEASURED recall 1.0 on this
    weak-similarity corpus at half the scan fraction LSH needs
    (pinned by test_lsh_recall) — the exact-kNN SQL is the oracle.
    At 100 TB the stored ``ivf_cell`` column clusters the table so a
    query reads ~n_probe/n_cells of the files."""
    emb = t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, _query_vec(spark, sf_dir), k=10, n_cells=8, n_probe=4
    )


# one persisted IVF index per (session, sf_dir): the first call pays
# the build (train + partitioned write under a process-unique tmp
# dir); every later call is a pure pruned-scan query — exactly the
# at-rest/online split a production index has
_IVF_INDEX_CACHE: dict[str, str] = {}
_MINHASH_INDEX_CACHE: dict[str, str] = {}


def _cleanup_index_caches() -> None:
    """Remove the per-process persisted-index temp dirs on exit
    (rebuilt lazily per process; never shared across runs) and clear
    every in-memory parameter cache in lockstep, so pq_knn/sq8_knn
    can't keep serving quantizers trained on data a refreshed sf_dir
    would replace.

    Round-13: enumerate the caches by module introspection instead of
    a hand-maintained tuple — the r11 mid-build round added
    ``_IVFPQ_TWOLEVEL_INDEX_CACHE`` / ``_IVFPQ_STREAM_INDEX_CACHE``
    without wiring them in here, leaving their temp dirs behind and
    (worse) serving stale index paths after a rebuild.  Any future
    ``*_CACHE`` module global is picked up automatically;
    tests/test_r13_optimizations.py pins that."""
    import shutil as _shutil

    for name, cache in list(globals().items()):
        if not (name.endswith("_CACHE") and isinstance(cache, dict)):
            continue
        if "INDEX" in name:  # dir-valued: delete the temp dirs too
            for d in cache.values():
                _shutil.rmtree(d, ignore_errors=True)
        cache.clear()


import atexit as _atexit  # noqa: E402

_atexit.register(_cleanup_index_caches)


def _minhash_index_for(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _MINHASH_INDEX_CACHE:
        import tempfile

        d = tempfile.mkdtemp(prefix="dlmps_mh_idx_")
        corpus = t(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        build_minhash_index(corpus, d, k=3, num_perm=64, bands=16)
        _MINHASH_INDEX_CACHE[sf_dir] = d
    return _MINHASH_INDEX_CACHE[sf_dir]


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: the 10 % of documents with doc_id % 10 == 0
    arrive as a NEW batch and are near-dup-checked against a PERSISTED
    MinHash-LSH index of the other 90 % (banded signatures + shingle
    sets built once — the daily-batch shape where re-running
    full-corpus dedup per batch would be quadratic over the corpus
    lifetime). Same banding recipe as `minhash_lsh_near_dup`
    (signatures depend only on each doc's own shingles, so banding
    matches are identical to the full-corpus run's and the measured
    recall-1.0 argument carries over); candidates exact-verified, so
    the exact cross-subset Jaccard SQL is the oracle."""
    batch = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return minhash_dedup_incremental(
        batch, _minhash_index_for(spark, sf_dir), threshold=0.5
    )


ORACLE_MINHASH_INCREMENTAL = f"""
WITH d0 AS (SELECT doc_id, {_SQL_TOKS_RAW} AS toks FROM documents),
d AS (SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(toks)-2, 1)+1),
          i -> array_to_string(toks[i:least(i+2, len(toks))], ' '))) AS sh
      FROM d0),
pairs AS (
  SELECT a.doc_id AS doc_new, b.doc_id AS doc_corpus,
         ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
               / len(list_distinct(a.sh || b.sh)), 6) AS jac
  FROM d a JOIN d b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
SELECT doc_new, doc_corpus, jac FROM pairs WHERE jac >= 0.5
"""


def _ivf_index_for(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _IVF_INDEX_CACHE:
        import tempfile

        d = tempfile.mkdtemp(prefix="dlmps_ivf_idx_")
        build_ivf_index(
            t(spark, sf_dir, "embeddings"), d, n_cells=8, seed=7
        )
        _IVF_INDEX_CACHE[sf_dir] = d
    return _IVF_INDEX_CACHE[sf_dir]


def q_ivf_knn_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN over the PERSISTED IVF index (corpus Hive-partitioned by
    ivf_cell + centroid table): same math as ``ivf_knn`` — identical
    seed, cells and probe count, so the same measured-recall-1.0
    argument makes the exact-kNN SQL the oracle — but the probed
    cells now prune at the FILE level (n_probe/n_cells of the bytes;
    pinned by tests/test_ivf_index.py via input_file_name)."""
    idx = _ivf_index_for(spark, sf_dir)
    return ivf_topk_indexed(
        spark, idx, _query_vec(spark, sf_dir), k=10, n_probe=4
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs (≥ 0.35 on this synthetic corpus),
    summarized per id_a."""
    emb = t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.35)
    return pairs.groupBy("id_a").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.sum("cos_sim"), 4).alias("sum_cos"),
    )


ORACLE_EMBEDDING_NEAR_DUP = """
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT id_a, COUNT(*) AS n_pairs, ROUND(SUM(cos_sim), 4) AS sum_cos
FROM pairs WHERE cos_sim >= 0.35
GROUP BY id_a
"""


def q_embedding_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pairs — precision 1.0 by exact
    verification, and recall driven to MEASURED 1.0 on this corpus by
    loose banding (2 planes × 24 tables; theory: miss ≈ 1.2e-5 per
    marginal pair at sim 0.35), pinned by test_lsh_recall — so the
    exact-pairs SQL twin is the oracle. The corpus only has
    moderate-similarity pairs; production near-dup (sim ≥0.95) uses
    the tighter defaults."""
    emb = t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs_lsh(
        emb, threshold=0.35, n_tables=24, n_planes=2, strategy="bucket_local"
    )
    return pairs.groupBy("id_a").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.sum("cos_sim"), 4).alias("sum_cos"),
    )


# ── text analysis ───────────────────────────────────────────────────


def q_token_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting, aggregated per source."""
    docs = t(spark, sf_dir, "documents")
    counted = docs.select(
        "source",
        token_count(F.col("text")).alias("n_tok"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe"),
    )
    return counted.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
    )


ORACLE_TOKEN_COUNT_STATS = f"""
WITH c AS (
  SELECT source,
         len(string_split_regex({_SQL_NORM}, ' ')) AS n_tok,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe
  FROM documents)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       ROUND(AVG(n_tok), 4) AS avg_tokens
FROM c GROUP BY source
"""


def q_lang_id_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language-ID vs the labeled lang column —
    confusion counts. Deterministic scoring, oracle-matched."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("lang", predict_lang(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


def _oracle_lang_sql() -> str:
    from ..functions.text import LANG_MARKERS

    score_exprs = []
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"len(list_intersect(ts, [{lst}])) AS s_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{l} > 0 AND s_{l} = {best} THEN '{l}'" for l in langs
    ) + " ELSE 'und' END"
    return f"""
WITH toks AS (SELECT lang, {_SQL_TOKENS} AS ts FROM documents),
scored AS (SELECT lang, {', '.join(score_exprs)} FROM toks)
SELECT lang, {case} AS predicted, COUNT(*) AS n
FROM scored GROUP BY lang, predicted
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring, histogrammed by score."""
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        F.round(quality_score(F.col("text"), QUALITY_STOPWORDS), 2).alias("score")
    )
    return scored.groupBy("score").agg(F.count("*").alias("n_docs"))


ORACLE_DOC_QUALITY = f"""
SELECT score, COUNT(*) AS n_docs FROM ({_SQL_DOC_SCORE}) GROUP BY score
"""


# ── multimodal ──────────────────────────────────────────────────────


def q_multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: synthesize media payloads from the
    documents table, aggregate byte stats per media_type (the
    metadata path the real decode pipeline shares)."""
    docs = t(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("meta.byte_len").alias("total_bytes"),
        F.min("meta.byte_len").alias("min_bytes"),
        F.max("meta.byte_len").alias("max_bytes"),
    )


ORACLE_MULTIMODAL_BYTE_STATS = """
WITH media AS (
  SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         octet_length(encode(text)) AS byte_len
  FROM documents)
SELECT media_type, COUNT(*) AS n_media,
       CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
       MIN(byte_len) AS min_bytes, MAX(byte_len) AS max_bytes
FROM media GROUP BY media_type
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (stubbed
    decode, real Arrow plumbing): per-type feature-vector stats.

    The stub features are per-bucket byte SUMS — integer-valued, so
    summing a payload's feature vector reproduces its total byte sum
    exactly in both engines, making the Python stage's arithmetic
    SQL-checkable: the oracle recomputes each payload's byte sum from
    hex pairs in DuckDB."""
    docs = t(spark, sf_dir, "documents")
    feats = extract_features(synthesize_media_from_documents(docs))
    per_doc = feats.select(
        "media_type",
        F.aggregate(
            "feature", F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ).alias("feature_sum"),
    )
    return per_doc.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("feature_sum"), 4).alias("avg_feature_sum"),
        F.sum("feature_sum").cast("long").alias("total_feature_sum"),
    )


# recompute the stub's byte-sum features from hex pairs — validates
# the mapInPandas decode output value-for-value
ORACLE_MULTIMODAL_FEATURES = """
WITH m AS (
  SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         hex(encode(text)) AS h, octet_length(encode(text)) AS bl
  FROM documents),
s AS (
  SELECT media_type,
         list_sum(list_transform(range(1, bl+1),
           i -> (strpos('0123456789ABCDEF', h[2*i-1]) - 1) * 16
              + (strpos('0123456789ABCDEF', h[2*i]) - 1))) AS byte_sum
  FROM m)
SELECT media_type, COUNT(*) AS n,
       ROUND(AVG(byte_sum), 4) AS avg_feature_sum,
       CAST(SUM(byte_sum) AS BIGINT) AS total_feature_sum
FROM s GROUP BY media_type
"""


# ── streaming-shaped (batch tumbling window) ────────────────────────


def q_tumbling_window_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute tumbling window over the event stream — the
    Structured-Streaming windowed-agg shape (SURVEY §2.10), computed
    in batch with ``window()`` (epoch-aligned)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


ORACLE_TUMBLING_WINDOW = """
SELECT CAST(CAST(to_timestamp(FLOOR(epoch(ts) / 1800) * 1800) AS TIMESTAMP) AS VARCHAR) AS window_start,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval leakage scan: docs with ``doc_id % 10 == 0`` act as
    the held-out eval set; every other doc is training. Reports the
    training docs sharing ≥1 verbatim char-16-gram with any eval doc
    and how many distinct shingles leak."""
    from ..operators.data_mix import contamination_pairs

    docs = t(spark, sf_dir, "documents")
    return contamination_pairs(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        k=16,
    )


ORACLE_DECONTAMINATION = f"""
WITH d AS (
  SELECT doc_id, {_SQL_NORM} AS nrm FROM documents),
sh AS (
  SELECT doc_id,
         md5(substr(nrm, CAST(pos AS INTEGER), 16)) AS shingle
  FROM d, LATERAL (
    SELECT unnest(range(1, greatest(length(nrm) - 15, 1) + 1)) AS pos)),
trs AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0),
evs AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0)
SELECT trs.doc_id, COUNT(*) AS n_shared
FROM trs JOIN evs USING (shingle)
GROUP BY trs.doc_id
"""


def q_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic weighted sampling (domain rebalancing):
    keep 50% of en, 25% of es, 10% of everything else — decisions are
    a pure hash of (seed, doc_id), so the oracle replays them exactly
    and any cluster layout reproduces the same sample."""
    from ..operators.data_mix import sample_mix

    docs = t(spark, sf_dir, "documents")
    kept = sample_mix(
        docs,
        {"en": 0.5, "es": 0.25},
        category_col="lang",
        seed="mix-v1",
        default_fraction=0.1,
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test assignment (80/10/10):
    the split is the first cumulative-weight interval containing
    uniform_hash(seed, doc_id) — disjoint, exhaustive, reproducible
    under any partitioning/retry (same contract as `sample_mix`), and
    the oracle replays every assignment exactly. Output: per (split,
    lang) doc counts — pins both the marginals and the independence
    of split from strata."""
    from ..operators.data_mix import split_assign

    docs = t(spark, sf_dir, "documents")
    assigned = split_assign(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed="split-v1"
    )
    return assigned.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


ORACLE_STRATIFIED_SPLIT = f"""
WITH hashed AS (
  SELECT doc_id, lang,
         md5('split-v1:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
decided AS (
  SELECT doc_id, lang,
         CAST(({_md5_hex8_bigint_sql()}) AS DOUBLE) / 4294967296.0 AS u
  FROM hashed)
SELECT CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM decided
GROUP BY 1, 2
"""


ORACLE_SAMPLE_MIX = f"""
WITH hashed AS (
  SELECT lang, n_chars,
         md5('mix-v1:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
decided AS (
  SELECT lang, n_chars,
         CAST(({_md5_hex8_bigint_sql()}) AS DOUBLE) / 4294967296.0 AS u
  FROM hashed)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM decided
WHERE u < (CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.25
           ELSE 0.1 END)
GROUP BY lang
"""


def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing summary: shard id by exclusive
    running token count in doc_id order (two-pass DISTRIBUTED prefix
    sum — no single-partition window; the oracle's global window is
    the semantic twin, not the physical plan)."""
    from ..operators.data_mix import pack_shards
    from ..operators.spread import release_pins

    docs = t(spark, sf_dir, "documents")
    pins: list = []
    shards = release_pins(
        pack_shards(docs, budget_tokens=2000, pins=pins), pins
    )
    return shards.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


ORACLE_PACK_SHARDS = """
WITH tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
cum AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM tok)
SELECT CAST(FLOOR(prior / 2000) AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM cum
GROUP BY 1
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concatenate-and-cut sequence packing, row-level: one
    row per (doc, 512-token training sequence) overlap with the slice
    offsets — boundary docs split across sequences, no padding. The
    oracle's global cumsum window is the semantic twin of the two-pass
    distributed prefix sum (``operators/data_mix.token_offsets``)."""
    from ..operators.data_mix import pack_sequences
    from ..operators.spread import release_pins

    docs = t(spark, sf_dir, "documents")
    pins: list = []
    seqs = release_pins(
        pack_sequences(docs, seq_tokens=512, pins=pins), pins
    )
    return seqs.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "seq_id",
        "doc_off",
        "seq_off",
        "slice_tok",
    )


ORACLE_PACK_SEQUENCES = """
WITH tok AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents),
cum AS (
  SELECT doc_id, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS tok_begin
  FROM tok),
spanned AS (
  SELECT doc_id, n_tok, tok_begin,
         unnest(generate_series(tok_begin // 512,
                                (tok_begin + n_tok - 1) // 512)) AS seq_id
  FROM cum)
SELECT doc_id, n_tok, seq_id,
       GREATEST(tok_begin, seq_id * 512) - tok_begin AS doc_off,
       GREATEST(tok_begin, seq_id * 512) - seq_id * 512 AS seq_off,
       LEAST(tok_begin + n_tok, (seq_id + 1) * 512)
         - GREATEST(tok_begin, seq_id * 512) AS slice_tok
FROM spanned
"""


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain sampling (budgets ∝ count^0.5):
    the small languages are upsampled relative to their share, the
    keep decision is the seeded hash of ``sample_mix``, and the
    per-domain probability is a round-6 literal both engines land on
    (one bounded groupBy to the driver, then a map-only filter)."""
    from ..operators.data_mix import temperature_mix

    docs = t(spark, sf_dir, "documents")
    kept = temperature_mix(
        docs, alpha=0.5, target_total=200, category_col="lang",
        seed="temp-v1",
    )  # fmt: skip
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.any_value(F.col("keep_prob")), 6).alias("keep_prob"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


ORACLE_TEMPERATURE_MIX = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
denom AS (
  SELECT SUM(POW(CAST(c AS DOUBLE), 0.5)) AS d FROM counts),
probs AS (
  SELECT lang,
         ROUND(LEAST(1.0, 200 * POW(CAST(c AS DOUBLE), 0.5) / d / c), 6)
           AS p
  FROM counts, denom),
decided AS (
  SELECT h.lang, h.doc_id, p.p,
         CAST(({_md5_hex8_bigint_sql()}) AS DOUBLE) / 4294967296.0 AS u
  FROM (SELECT lang, doc_id,
               md5('temp-v1:' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents) h JOIN probs p USING (lang))
SELECT lang, COUNT(*) AS n_docs,
       ROUND(ANY_VALUE(p), 6) AS keep_prob,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM decided
WHERE u < p
GROUP BY lang
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "decontamination": q_decontamination,
    "sample_mix": q_sample_mix,
    "stratified_split": q_stratified_split,
    "pack_shards": q_pack_shards,
    "pack_sequences": q_pack_sequences,
    "temperature_mix": q_temperature_mix,
    "doc_fingerprints": q_doc_fingerprints,
    "exact_dedup_summary": q_exact_dedup_summary,
    "token_jaccard_near_dup": q_token_jaccard_near_dup,
    "minhash_lsh_near_dup": q_minhash_lsh_near_dup,
    "minhash_incremental": q_minhash_incremental,
    "simhash_near_dup": q_simhash_near_dup,
    "winnowing_fingerprints": q_winnowing_fingerprints,
    "dedup_clusters": q_dedup_clusters,
    "dedup_survivors": q_dedup_survivors,
    "embedding_knn": q_embedding_knn,
    "embedding_lsh_knn": q_embedding_lsh_knn,
    "ivf_knn": q_ivf_knn,
    "ivf_knn_indexed": q_ivf_knn_indexed,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_lsh_near_dup": q_embedding_lsh_near_dup,
    "token_count_stats": q_token_count_stats,
    "lang_id_agreement": q_lang_id_agreement,
    "doc_quality": q_doc_quality,
    "multimodal_byte_stats": q_multimodal_byte_stats,
    "multimodal_features": q_multimodal_features,
    "tumbling_window_30m": q_tumbling_window_30m,
}

ORACLE: dict[str, str] = {
    "decontamination": ORACLE_DECONTAMINATION,
    "sample_mix": ORACLE_SAMPLE_MIX,
    "stratified_split": ORACLE_STRATIFIED_SPLIT,
    "pack_shards": ORACLE_PACK_SHARDS,
    "pack_sequences": ORACLE_PACK_SEQUENCES,
    "temperature_mix": ORACLE_TEMPERATURE_MIX,
    "doc_fingerprints": ORACLE_DOC_FINGERPRINTS,
    "exact_dedup_summary": ORACLE_EXACT_DEDUP_SUMMARY,
    "token_jaccard_near_dup": ORACLE_TOKEN_JACCARD,
    "minhash_lsh_near_dup": ORACLE_MINHASH_LSH,
    "minhash_incremental": ORACLE_MINHASH_INCREMENTAL,
    "simhash_near_dup": ORACLE_SIMHASH_NEAR_DUP,
    "winnowing_fingerprints": ORACLE_WINNOWING,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "dedup_survivors": ORACLE_DEDUP_SURVIVORS,
    "embedding_knn": ORACLE_EMBEDDING_KNN,
    "embedding_lsh_knn": ORACLE_EMBEDDING_KNN,
    "ivf_knn": ORACLE_EMBEDDING_KNN,
    "ivf_knn_indexed": ORACLE_EMBEDDING_KNN,
    "embedding_near_dup": ORACLE_EMBEDDING_NEAR_DUP,
    "embedding_lsh_near_dup": ORACLE_EMBEDDING_NEAR_DUP,
    "token_count_stats": ORACLE_TOKEN_COUNT_STATS,
    "lang_id_agreement": _oracle_lang_sql(),
    "doc_quality": ORACLE_DOC_QUALITY,
    "multimodal_byte_stats": ORACLE_MULTIMODAL_BYTE_STATS,
    "multimodal_features": ORACLE_MULTIMODAL_FEATURES,
    "tumbling_window_30m": ORACLE_TUMBLING_WINDOW,
}


# ── round-7: scalar-quantized (int8) ANN ────────────────────────────


# train-once-per-process quantizer params (the _PQ_CODEBOOK_CACHE
# pattern): the bench docstring promises the warm-up pass pays the
# one-time min/max aggregate — round-12 makes that true (it was
# re-aggregated per call)
_SQ8_PARAMS_CACHE: dict[tuple, list] = {}
_BATCH_QUERIES_CACHE: dict[tuple, dict] = {}


def _sq8_params_for(spark: SparkSession, sf_dir: str) -> list:
    key = _emb_cache_key(sf_dir)
    if key not in _SQ8_PARAMS_CACHE:
        from ..operators.similarity import sq8_params

        _SQ8_PARAMS_CACHE[key] = sq8_params(
            t(spark, sf_dir, "embeddings"), dim=64
        )
    return _SQ8_PARAMS_CACHE[key]


def q_sq8_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SQ8 ANN: int8 dequantized-dot screen over the
    4x-smaller code representation, exact rescore of the top-40
    candidates, final top-10. The oracle replays the identical
    algorithm (min/max params, floor-half-up codes, affine approx
    score with the same left-to-right fold, candidate cut, exact
    rescore) — and the result equals exact brute-force top-10 on this
    corpus (recall 1.0, pinned by tests/test_sq8.py)."""
    from ..operators.similarity import sq8_topk

    emb = t(spark, sf_dir, "embeddings")
    return sq8_topk(
        emb, _query_vec(spark, sf_dir), k=10, overfetch=4,
        params=_sq8_params_for(spark, sf_dir),
    )  # fmt: skip


def _sq8_oracle_sql(dim: int = 64, k: int = 10, overfetch: int = 4) -> str:
    los = ", ".join(
        f"min(CAST(embedding[{i + 1}] AS DOUBLE)) AS lo{i},"
        f" max(CAST(embedding[{i + 1}] AS DOUBLE)) AS hi{i}"
        for i in range(dim)
    )
    scales = ", ".join(
        f"CASE WHEN hi{i} > lo{i} THEN (hi{i} - lo{i}) / 255.0"
        f" ELSE 1.0 END AS s{i}"
        for i in range(dim)
    )
    code = (
        "least(floor((CAST(e.embedding[{j}] AS DOUBLE) - s.lo{i})"
        " / s.s{i} + 0.5), 255.0)"
    )
    terms = " + ".join(
        "(" + code.format(i=i, j=i + 1) + f" * (s.s{i} * q.qv[{i + 1}]))"
        for i in range(dim)
    )
    offset = " + ".join(f"(s.lo{i} * q.qv[{i + 1}])" for i in range(dim))
    return f"""
WITH p AS (SELECT {los} FROM embeddings),
s AS (SELECT p.*, {scales} FROM p),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = 0),
ap AS (
  SELECT e.vec_id, ({terms} + ({offset})) AS approx
  FROM embeddings e CROSS JOIN s CROSS JOIN q),
cand AS (SELECT vec_id FROM ap
         ORDER BY approx DESC, vec_id LIMIT {k * overfetch}),
resc AS (
  SELECT e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      q.qv), 6) AS cos_sim
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q)
SELECT vec_id, cos_sim,
       ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank
FROM resc QUALIFY rank <= {k}
"""


QUERIES["sq8_knn"] = q_sq8_knn
ORACLE["sq8_knn"] = _sq8_oracle_sql()


# ── round-7: MMR diversified retrieval ──────────────────────────────


def q_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-5 for the vec_id=0 query (lam=0.7): greedy
    selection maximizing relevance minus max-similarity-to-selected.
    vec_id 0 itself anchors rank 1 (cos 1.0); later ranks trade
    relevance against redundancy. The oracle replays every greedy
    step with unrolled CTEs; scores round to 6 before each argmax so
    fold-order noise cannot flip a selection on either engine."""
    from ..operators.retrieval import mmr_topk

    emb = t(spark, sf_dir, "embeddings")
    return mmr_topk(emb, _query_vec(spark, sf_dir), k=5, lam=0.7)


def _mmr_oracle_sql(k: int = 5, lam: float = 0.7) -> str:
    cos = (
        "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), {v})"
    )
    parts = [
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings"
        " WHERE vec_id = 0)"
    ]
    for i in range(1, k + 1):
        prev = [f"s{j}" for j in range(1, i)]
        pen = (
            "greatest("
            + ", ".join(
                cos.format(v=f"CAST({s}.embedding AS DOUBLE[])")
                for s in prev
            )
            + ")"
            if prev
            else "0.0"
        )
        joins = " ".join(f"CROSS JOIN {s}" for s in prev)
        excl = (
            "WHERE e.vec_id NOT IN ("
            + " UNION ALL ".join(f"SELECT vec_id FROM {s}" for s in prev)
            + ")"
            if prev
            else ""
        )
        parts.append(
            f"""s{i} AS (
  SELECT e.vec_id, e.embedding,
         {cos.format(v='q.qv')} AS rel, {pen} AS pen,
         ROUND({lam} * {cos.format(v='q.qv')} - {1.0 - lam} * {pen}, 6)
           AS mmr
  FROM embeddings e CROSS JOIN q {joins}
  {excl}
  ORDER BY mmr DESC, e.vec_id LIMIT 1)"""
        )
    finals = " UNION ALL ".join(
        f"SELECT {i} AS rank, vec_id, ROUND(rel, 6) AS relevance,"
        f" ROUND(pen, 6) AS redundancy, mmr AS mmr_score FROM s{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + finals


QUERIES["mmr_topk"] = q_mmr_topk
ORACLE["mmr_topk"] = _mmr_oracle_sql()


def q_mmr_topk_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled MMR — the 100 TB execution shape: ONE distributed
    relevance pass (TakeOrderedAndProject, overfetch pool of 320 out
    of the 500-vector corpus, so the pool is a strict subset) then
    driver-side greedy MMR over the bounded pool with bit-identical
    arithmetic.  The oracle is the SAME full-corpus exact greedy
    replay as ``mmr_topk`` — the gate therefore proves the bounded
    pool reproduces the exact selection, not merely that the code
    runs (this clears the round-7 'k full scans' scale flag)."""
    from ..operators.retrieval import mmr_topk_pooled

    emb = t(spark, sf_dir, "embeddings")
    return mmr_topk_pooled(
        emb, _query_vec(spark, sf_dir), k=5, lam=0.7, pool_size=320
    )


QUERIES["mmr_topk_pooled"] = q_mmr_topk_pooled
ORACLE["mmr_topk_pooled"] = _mmr_oracle_sql()


def q_sq8_knn_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 ANN over the at-rest codes layout: the screen scans an
    sq8_encode codes table, the rescore reads the float vectors for
    k*overfetch ids only. Same algorithm, same code values, same
    fold — bit-identical to sq8_knn, so the same replayed-algorithm
    oracle applies (the ivf_knn_indexed pattern)."""
    from ..operators.similarity import sq8_encode, sq8_topk_indexed

    emb = t(spark, sf_dir, "embeddings")
    params = _sq8_params_for(spark, sf_dir)
    codes = sq8_encode(emb, params)
    return sq8_topk_indexed(
        codes, emb, _query_vec(spark, sf_dir), params, k=10, overfetch=4
    )


QUERIES["sq8_knn_indexed"] = q_sq8_knn_indexed
ORACLE["sq8_knn_indexed"] = _sq8_oracle_sql()


# ── round-8: product-quantization (PQ) ANN ──────────────────────────

_PQ_CODEBOOK_CACHE: dict[str, list] = {}


def _pq_codebooks_for(spark: SparkSession, sf_dir: str) -> list:
    """Train-once-per-process codebooks (the lazy prebuilt-state
    pattern the IVF/MinHash index gates use): pq_knn and
    pq_knn_indexed share one training run per sf_dir."""
    if sf_dir not in _PQ_CODEBOOK_CACHE:
        from ..operators.pq import pq_train

        _PQ_CODEBOOK_CACHE[sf_dir] = pq_train(
            t(spark, sf_dir, "embeddings"), m=8, ksub=16, iters=2
        )
    return _PQ_CODEBOOK_CACHE[sf_dir]


def q_pq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase product-quantization ANN (m=8 subspaces, ksub=16,
    2 Lloyd iterations, deterministic smallest-id init): ADC screen on
    the norm-corrected approximate cosine over 8 int codes per vector
    (~32x smaller at rest than float32), exact rescore of the top-160
    candidates, final top-10. The oracle replays the ENTIRE algorithm
    relationally — both training iterations, the per-subspace argmin
    encoding, the ADC lookup tables, the rounded approximate-cosine
    cut, and the exact rescore — and the result equals exact
    brute-force top-10 on this corpus (recall 1.0 at overfetch=16,
    pinned by tests/test_pq.py)."""
    from ..operators.pq import pq_topk

    emb = t(spark, sf_dir, "embeddings")
    return pq_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=10,
        overfetch=16,
        codebooks=_pq_codebooks_for(spark, sf_dir),
    )


_PQ_INDEX_CACHE: dict[str, str] = {}


def _pq_index_for(spark: SparkSession, sf_dir: str) -> str:
    """Persist the at-rest PQ index once per sf_dir (codes parquet +
    codebooks.json) — the online query then never touches the float
    column until the rescore, and never re-plans the m·ksub encoding
    projection (measured: re-encoding per call costs ~7s of pure
    driver-side analysis+codegen at dim 64/ksub 16 — the index is the
    whole point of the at-rest layout)."""
    if sf_dir not in _PQ_INDEX_CACHE:
        import tempfile

        from ..operators.pq import build_pq_index

        d = tempfile.mkdtemp(prefix="dlmps_pq_idx_")
        cb = build_pq_index(
            t(spark, sf_dir, "embeddings"), d, m=8, ksub=16, iters=2
        )
        _PQ_CODEBOOK_CACHE.setdefault(sf_dir, cb)
        _PQ_INDEX_CACHE[sf_dir] = d
    return _PQ_INDEX_CACHE[sf_dir]


def q_pq_knn_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN over the PERSISTED at-rest codes layout: the ADC screen
    scans the codes parquet (8 small ints per vector, ~32x below the
    float column), the rescore reads float vectors for 160 ids only.
    Identical code values, lookup tables and folds as the inline path
    — bit-for-bit the same results (the ivf/sq8 two-layout pattern),
    so the same replayed-algorithm oracle applies."""
    from ..operators.pq import load_pq_index, pq_topk_indexed

    idx = _pq_index_for(spark, sf_dir)
    codes, cb, _meta = load_pq_index(spark, idx)
    emb = t(spark, sf_dir, "embeddings")
    return pq_topk_indexed(
        codes, emb, _query_vec(spark, sf_dir), cb, k=10, overfetch=16
    )


def _pq_oracle_sql(
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    k: int = 10,
    overfetch: int = 16,
) -> str:
    """Full relational replay of pq_topk: subspace split, smallest-id
    distinct init, assignment iteration (rounded dists, lowest-cid
    ties), rounded centroid update, final encoding, ADC lookup tables
    (same left-to-right folds), rounded approximate-cosine candidate
    cut, exact rescore. DuckDB lists are 1-based; every fold is
    written left-associative to match the Spark/Python folds."""
    dsub = dim // m

    def sq(i: int) -> str:  # (sv[i] - c.v[i])^2, 1-based
        return f"(s.sv[{i}] - c.v[{i}]) * (s.sv[{i}] - c.v[{i}])"

    dist = " + ".join(sq(t + 1) for t in range(dsub))
    lut_dq = " + ".join(
        f"c1.v[{t + 1}] * q.qv[c1.j * {dsub} + {t + 1}]" for t in range(dsub)
    )
    lut_n2 = " + ".join(
        f"c1.v[{t + 1}] * c1.v[{t + 1}]" for t in range(dsub)
    )
    qnorm = " + ".join(f"q.qv[{i + 1}] * q.qv[{i + 1}]" for i in range(dim))
    kcols = ", ".join(
        f"MAX(CASE WHEN j = {j} THEN cid END) AS k{j}" for j in range(m)
    )
    lut_joins = " ".join(
        f"JOIN lut l{j} ON l{j}.j = {j} AND l{j}.cid = p.k{j}"
        for j in range(m)
    )
    adc_dot = " + ".join(f"l{j}.dq" for j in range(m))
    adc_n2 = " + ".join(f"l{j}.n2" for j in range(m))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dims AS (SELECT unnest(generate_series(0, {m - 1})) AS j),
sub AS (
  SELECT e.vec_id, dims.j,
         list_slice(e.v, dims.j * {dsub} + 1, dims.j * {dsub} + {dsub}) AS sv
  FROM e CROSS JOIN dims),
c0 AS (
  SELECT j, CAST(ROW_NUMBER() OVER (PARTITION BY j ORDER BY mid) - 1 AS INT)
           AS cid, sv AS v
  FROM (SELECT j, sv, MIN(vec_id) AS mid FROM sub GROUP BY j, sv)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY j ORDER BY mid) <= {ksub}),
d0 AS (
  SELECT s.vec_id, s.j, c.cid, ROUND({dist}, 6) AS d
  FROM sub s JOIN c0 c ON s.j = c.j),
a0 AS (
  SELECT vec_id, j, cid FROM (
    SELECT vec_id, j, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
    FROM d0) WHERE rn = 1),
u1 AS (
  SELECT a0.j, a0.cid, ts.t, ROUND(AVG(s.sv[ts.t]), 6) AS cv
  FROM a0 JOIN sub s ON a0.vec_id = s.vec_id AND a0.j = s.j
  CROSS JOIN (SELECT unnest(generate_series(1, {dsub})) AS t) ts
  GROUP BY a0.j, a0.cid, ts.t),
c1 AS (SELECT j, cid, array_agg(cv ORDER BY t) AS v FROM u1 GROUP BY j, cid),
d1 AS (
  SELECT s.vec_id, s.j, c.cid, ROUND({dist}, 6) AS d
  FROM sub s JOIN c1 c ON s.j = c.j),
enc AS (
  SELECT vec_id, j, cid FROM (
    SELECT vec_id, j, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
    FROM d1) WHERE rn = 1),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = 0),
lut AS (
  SELECT c1.j, c1.cid, ({lut_dq}) AS dq, ({lut_n2}) AS n2
  FROM c1 CROSS JOIN q),
qn AS (SELECT SQRT({qnorm}) AS qnorm FROM q),
p AS (SELECT vec_id, {kcols} FROM enc GROUP BY vec_id),
ap AS (
  SELECT p.vec_id,
         ROUND(({adc_dot}) / (SQRT({adc_n2}) * qn.qnorm), 6) AS approx
  FROM p {lut_joins} CROSS JOIN qn),
cand AS (SELECT vec_id FROM ap
         ORDER BY approx DESC, vec_id LIMIT {k * overfetch}),
resc AS (
  SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 6) AS cos_sim
  FROM e JOIN cand USING (vec_id) CROSS JOIN q)
SELECT vec_id, cos_sim,
       ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank
FROM resc QUALIFY rank <= {k}
"""


QUERIES["pq_knn"] = q_pq_knn
ORACLE["pq_knn"] = _pq_oracle_sql()
QUERIES["pq_knn_indexed"] = q_pq_knn_indexed
ORACLE["pq_knn_indexed"] = _pq_oracle_sql()


_IVFPQ_INDEX_CACHE: dict[str, str] = {}
_IVFPQ_INCR_INDEX_CACHE: dict[str, str] = {}
_IVFPQ_RES_INDEX_CACHE: dict[str, str] = {}
_IVFPQ_RES_BIG_INDEX_CACHE: dict[str, str] = {}
_IVFPQ_TWOLEVEL_INDEX_CACHE: dict[str, str] = {}
_IVFPQ_STREAM_INDEX_CACHE: dict[str, str] = {}


def _ivfpq_index_for(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _IVFPQ_INDEX_CACHE:
        import tempfile

        from ..operators.pq import build_ivfpq_index

        d = tempfile.mkdtemp(prefix="dlmps_ivfpq_idx_")
        # store_vectors=True: the same index serves both the ADC+rescore
        # gate (ivfpq_knn, which reads codes/ + the source corpus) and
        # the fully file-pruned composed retrieval gate (mmr_topk_ivfpq,
        # which reads codes/ + vectors/ and never scans the corpus)
        build_ivfpq_index(
            t(spark, sf_dir, "embeddings"), d,
            n_cells=8, m=8, ksub=16, iters=2, seed=7,
            store_vectors=True,
        )  # fmt: skip
        _IVFPQ_INDEX_CACHE[sf_dir] = d
    return _IVFPQ_INDEX_CACHE[sf_dir]


def q_ivfpq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN — the canonical billion-scale at-rest layout
    (coarse-cell file pruning x 32x-smaller PQ codes): the ADC screen
    reads ONLY the 4-of-8 probed cells' code files, the exact rescore
    touches 160 float vectors. Measured recall 1.0 with exact order
    match for the gate query at these parameters (deterministic
    build: seeded IVF sample, smallest-id PQ init — pinned by
    tests/test_pq.py), so the exact-kNN SQL is a valid oracle (the
    ivf_knn / lsh_knn justification)."""
    from ..operators.pq import ivfpq_topk

    idx = _ivfpq_index_for(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        spark, idx, emb, _query_vec(spark, sf_dir),
        k=10, n_probe=4, overfetch=16,
    )  # fmt: skip


QUERIES["ivfpq_knn"] = q_ivfpq_knn
ORACLE["ivfpq_knn"] = ORACLE_EMBEDDING_KNN


def q_mmr_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully FILE-PRUNED composed retrieval stack (round 9): ADC
    screen over the probed cells' code files → exact-relevance pool
    fetched from the cell-partitioned vectors/ dataset (the source
    float corpus is never scanned) → driver-side greedy MMR with the
    same bit-identical arithmetic as ``mmr_topk_pooled``.  The oracle
    is the full-corpus exact greedy replay — the gate proves the
    cell-pruned + screened pool reproduces the exact selection at
    n_probe=4 of 8 cells, pool 320, screen overfetch 4 (the honest
    caveat: equality holds when cell+screen recall covers the
    selection's support, measured here and in tests/test_mmr_pooled.py,
    certified within the screen by the pool bound)."""
    from ..operators.retrieval import mmr_topk_ivfpq

    idx = _ivfpq_index_for(spark, sf_dir)
    return mmr_topk_ivfpq(
        spark, idx, _query_vec(spark, sf_dir),
        k=5, lam=0.7, pool_size=320, n_probe=4, overfetch=4,
    )  # fmt: skip


QUERIES["mmr_topk_ivfpq"] = q_mmr_topk_ivfpq
ORACLE["mmr_topk_ivfpq"] = _mmr_oracle_sql()


def _ivfpq_incr_index_for(spark: SparkSession, sf_dir: str) -> str:
    """An IVF-PQ index GROWN incrementally: built on the even vec_ids,
    then the odd half appended with ``ivfpq_add`` (frozen quantizers,
    map-only encode, per-cell parquet append)."""
    if sf_dir not in _IVFPQ_INCR_INDEX_CACHE:
        import tempfile

        from ..operators.pq import build_ivfpq_index, ivfpq_add

        d = tempfile.mkdtemp(prefix="dlmps_ivfpq_incr_")
        emb = t(spark, sf_dir, "embeddings")
        build_ivfpq_index(
            emb.filter(F.col("vec_id") % 2 == 0), d,
            n_cells=8, m=8, ksub=16, iters=2, seed=7,
        )  # fmt: skip
        ivfpq_add(spark, d, emb.filter(F.col("vec_id") % 2 == 1))
        _IVFPQ_INCR_INDEX_CACHE[sf_dir] = d
    return _IVFPQ_INCR_INDEX_CACHE[sf_dir]


def q_ivfpq_knn_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance (round 9): the index is built on
    HALF the corpus and the other half arrives via ``ivfpq_add`` —
    frozen coarse centroids + codebooks, map-only encode, append-only
    per-cell files (the FAISS ``IVF.add`` contract; the growing-corpus
    twin of ``minhash_incremental``).  The query must return the exact
    top-10 over ORIGINAL + ADDED vectors: added vectors are screened
    and rescored exactly like built ones, with no reload step (the
    directory listing is the index).  Exact-kNN oracle justified the
    same way as ``ivfpq_knn``: deterministic build + measured exact
    order match at these parameters.  The parameters are themselves a
    measured drift datapoint: the full-trained ``ivfpq_knn`` index
    matches exact at n_probe=4/8, but the HALF-trained coarse cells
    put 2 of the query's true top-10 (all from the unseen half) in
    cells ranked 5th-6th — n_probe=6 + overfetch 32 recovers exact
    order (n_probe=4 cannot at any overfetch; cell recall, not screen
    recall).  That is the add-without-retrain trade the operator
    docstring warns about, quantified."""
    from ..operators.pq import ivfpq_topk

    idx = _ivfpq_incr_index_for(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        spark, idx, emb, _query_vec(spark, sf_dir),
        k=10, n_probe=6, overfetch=32,
    )  # fmt: skip


QUERIES["ivfpq_knn_incremental"] = q_ivfpq_knn_incremental
ORACLE["ivfpq_knn_incremental"] = ORACLE_EMBEDDING_KNN


def _ivfpq_res_index_for(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _IVFPQ_RES_INDEX_CACHE:
        import tempfile

        from ..operators.pq import build_ivfpq_index

        d = tempfile.mkdtemp(prefix="dlmps_ivfpq_res_")
        build_ivfpq_index(
            t(spark, sf_dir, "embeddings"), d,
            n_cells=8, m=8, ksub=16, iters=2, seed=7,
            residual=True,
        )  # fmt: skip
        _IVFPQ_RES_INDEX_CACHE[sf_dir] = d
    return _IVFPQ_RES_INDEX_CACHE[sf_dir]


def q_ivfpq_knn_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIDUAL-codebook IVF-PQ (round 10; FAISS's default IVFPQ
    encoding): PQ is trained and encoded over r = x − anchor(cell)
    with the anchor the cell MEAN, and the ADC screen scores
    x = a + recon(r) with per-cell cross-term lookup tables
    (pq._approx_cos_sql_residual).  Exists because the GLOBAL-codebook
    screen degenerates on clustered corpora — whole clusters share one
    code, measured at 5M in SCALE.md r10; residual codes stay
    near-unique per vector (pinned in tests/test_pq.py).  Same
    file-pruned two-phase query shape as ``ivfpq_knn``; exact-kNN
    oracle justified identically: deterministic build + measured
    recall 1.0 with exact order match at these parameters on the gate
    corpus."""
    from ..operators.pq import ivfpq_topk

    idx = _ivfpq_res_index_for(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        spark, idx, emb, _query_vec(spark, sf_dir),
        k=10, n_probe=4, overfetch=16,
    )  # fmt: skip


QUERIES["ivfpq_knn_residual"] = q_ivfpq_knn_residual
ORACLE["ivfpq_knn_residual"] = ORACLE_EMBEDDING_KNN


def _ivfpq_res_big_index_for(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _IVFPQ_RES_BIG_INDEX_CACHE:
        import tempfile

        from ..operators.pq import build_ivfpq_index

        d = tempfile.mkdtemp(prefix="dlmps_ivfpq_resbig_")
        build_ivfpq_index(
            t(spark, sf_dir, "embeddings"), d,
            n_cells=300, m=8, ksub=16, iters=2, seed=7,
            residual=True,
        )  # fmt: skip
        _IVFPQ_RES_BIG_INDEX_CACHE[sf_dir] = d
    return _IVFPQ_RES_BIG_INDEX_CACHE[sf_dir]


def q_ivfpq_knn_residual_bigcells(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Round-11: the LARGE-cell-count residual regime.  Past
    ``pq._ANCHOR_LITERAL_MAX_CELLS`` (256) the encode broadcast-joins
    a tiny anchors relation instead of inlining the n_cells×dim
    anchor table as literal SQL (``pq._with_residual`` — plan text
    O(1) in n_cells; at 100-TB-realistic coarse counts, n_cells ~ √N,
    the literal would be tens of MB per build/add), and the anchors
    persist in an ``anchors/`` parquet instead of inline
    codebooks.json.  n_cells=300 puts this gate in that regime on the
    gate corpus, so the driver covers the new path end to end: build
    → parquet anchors → per-cell CASE screen over EVERY cell
    (n_probe = n_cells, the 256+-branch expression ADVICE r10 asked
    to exercise) → exact rescore.  The exact-kNN oracle is GUARANTEED
    here, not merely measured: probing all cells with k·overfetch =
    640 ≥ the 500-row correctness corpus passes every row through the
    screen to the exact rescore.  Bit-parity of broadcast-joined vs
    literal encodes is pinned in tests/test_pq.py."""
    from ..operators.pq import ivfpq_topk

    idx = _ivfpq_res_big_index_for(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        spark, idx, emb, _query_vec(spark, sf_dir),
        k=10, n_probe=300, overfetch=64,
    )  # fmt: skip


QUERIES["ivfpq_knn_residual_bigcells"] = q_ivfpq_knn_residual_bigcells
ORACLE["ivfpq_knn_residual_bigcells"] = ORACLE_EMBEDDING_KNN


def _ivfpq_twolevel_index_for(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _IVFPQ_TWOLEVEL_INDEX_CACHE:
        import tempfile

        from ..operators.pq import build_ivfpq_index

        d = tempfile.mkdtemp(prefix="dlmps_ivfpq_2l_")
        build_ivfpq_index(
            t(spark, sf_dir, "embeddings"), d,
            n_cells=9, m=8, ksub=16, iters=2, seed=7,
            residual=True, coarse="two_level", branch=3,
        )  # fmt: skip
        _IVFPQ_TWOLEVEL_INDEX_CACHE[sf_dir] = d
    return _IVFPQ_TWOLEVEL_INDEX_CACHE[sf_dir]


def q_ivfpq_knn_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12: HIERARCHICAL (two-level) coarse quantizer — the
    100-TB-scale coarse-cell path.  Flat k-means training costs
    O(sample·n_cells·dim) per Lloyd iteration and flat per-row
    assignment O(n_cells·dim); at n_cells ~ √N (tens of thousands of
    cells for 10⁹+ vectors) those terms dominated the r11 4096-cell
    build (854 s at 5M vectors).  ``coarse="two_level"``
    (``similarity.train_ivf_centroids_two_level``, FAISS-IMI-style)
    trains k1 ≈ √n_cells level-1 centers then k2 sub-centers per
    region and assigns each row with TWO small argmaxes —
    O(√n_cells·dim) on both sides.  Leaf ids index the same flat
    centroid list, so the at-rest layout, probing, residual screens
    and this oracle are identical to the flat build; ``ivfpq_add`` /
    ``ivfpq_drift_stats`` reproduce the frozen hierarchical
    assignment via ``pq._assign_index_cells`` (pinned in
    tests/test_pq.py).  The exact-kNN oracle is GUARANTEED: full
    probe (n_probe = n_cells = 9) + covering overfetch passes every
    row through the screen to the exact rescore."""
    from ..operators.pq import ivfpq_topk

    idx = _ivfpq_twolevel_index_for(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        spark, idx, emb, _query_vec(spark, sf_dir),
        k=10, n_probe=9, overfetch=64,
    )  # fmt: skip


QUERIES["ivfpq_knn_twolevel"] = q_ivfpq_knn_twolevel
ORACLE["ivfpq_knn_twolevel"] = ORACLE_EMBEDDING_KNN


def _ivfpq_stream_index_for(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _IVFPQ_STREAM_INDEX_CACHE:
        import os
        import shutil
        import tempfile

        from ..operators.pq import build_ivfpq_index
        from ..streaming.index_stream import stream_index_maintenance

        work = tempfile.mkdtemp(prefix="dlmps_ivfpq_stream_")
        d = os.path.join(work, "idx")
        emb = t(spark, sf_dir, "embeddings")
        build_ivfpq_index(
            emb.filter(F.col("vec_id") % 3 == 0), d,
            n_cells=4, m=8, ksub=16, iters=2, seed=7, residual=True,
        )  # fmt: skip
        src = os.path.join(work, "arrivals")
        os.makedirs(src)
        for i in (1, 2):
            tmp = os.path.join(work, f"_stage{i}")
            (
                emb.filter(F.col("vec_id") % 3 == i)
                .coalesce(1).write.mode("overwrite").parquet(tmp)
            )  # fmt: skip
            part = next(
                p for p in os.listdir(tmp) if p.endswith(".parquet")
            )
            os.replace(
                os.path.join(tmp, part), os.path.join(src, f"b{i}.parquet")
            )
            shutil.rmtree(tmp, ignore_errors=True)
        q = stream_index_maintenance(
            spark, src, d, os.path.join(work, "ckpt")
        )
        q.awaitTermination()
        _IVFPQ_STREAM_INDEX_CACHE[sf_dir] = d
    return _IVFPQ_STREAM_INDEX_CACHE[sf_dir]


def q_ivfpq_knn_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12: STREAMING index maintenance — the IVF-PQ lifecycle
    (recover → drift monitor → threshold-gated compaction →
    incremental add) as a Structured Streaming query
    (``streaming.index_stream``), with row-level EXACTLY-ONCE adds
    across micro-batch replays: the frozen-quantizer encode is
    deterministic and ``ivfpq_add(write_token=batch_id)`` writes each
    touched cell's rows onto the deterministic name
    ``add-b<id>.parquet`` via os.replace, so a replayed batch rewrites
    the same rows onto the same files instead of appending duplicates
    (crash-injected in tests/test_index_stream.py).  This gate builds
    the index on a THIRD of the corpus, lands the other two thirds as
    two parquet arrival files, drains the stream (AvailableNow), and
    queries the maintained index — the result must be the exact
    top-10 over ALL vectors (full probe + covering overfetch passes
    every built AND streamed row through the screen to the exact
    rescore, so the exact-kNN oracle is GUARANTEED)."""
    from ..operators.pq import ivfpq_topk

    idx = _ivfpq_stream_index_for(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        spark, idx, emb, _query_vec(spark, sf_dir),
        k=10, n_probe=4, overfetch=64,
    )  # fmt: skip


QUERIES["ivfpq_knn_streamed"] = q_ivfpq_knn_streamed
ORACLE["ivfpq_knn_streamed"] = ORACLE_EMBEDDING_KNN


def q_ivfpq_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11: BATCHED ANN — 5 queries answered in ONE shared pass
    over the (cached residual) index: one pruned scan of the union of
    probed cells, each code row fanned out to the queries probing its
    cell via a broadcast per-query LUT relation, one windowed
    per-query candidate cut, one exact-rescore join
    (``pq.ivfpq_topk_batch``).  Per-query plans are O(Q) job chains —
    a serving tier amortizes them to O(1).  Arithmetic is
    bit-identical to Q separate ``ivfpq_topk`` calls (pinned in
    tests/test_pq.py); the per-query exact-kNN oracle is GUARANTEED at
    these parameters (full probe of the 8 cells + k·overfetch = 640 ≥
    the 500-row correctness corpus passes every row to the exact
    rescore)."""
    from ..operators.pq import ivfpq_topk_batch

    idx = _ivfpq_res_index_for(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    cache_key = _emb_cache_key(sf_dir)
    if cache_key not in _BATCH_QUERIES_CACHE:
        _BATCH_QUERIES_CACHE[cache_key] = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id") < 5).collect()
        }
    queries = _BATCH_QUERIES_CACHE[cache_key]
    return ivfpq_topk_batch(
        spark, idx, emb, queries, k=10, n_probe=8, overfetch=64
    )


QUERIES["ivfpq_knn_batch"] = q_ivfpq_knn_batch
ORACLE["ivfpq_knn_batch"] = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cos_sim
  FROM embeddings e CROSS JOIN q)
SELECT query_id, vec_id, cos_sim,
       ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC
       ) AS rank
FROM scored
QUALIFY rank <= 10
"""
