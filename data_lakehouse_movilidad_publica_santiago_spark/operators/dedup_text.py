"""Document deduplication operators (beyond-reference, BASELINE.json):
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.

Scale design notes (the point of each variant):
- exact: one hash-groupBy shuffle on a 16-byte key — the cheapest
  pass, run it first at any scale.
- n-gram Jaccard: EXACT all-pairs, pruned by the size bound
  |A|·t ≤ |B| ≤ |A|/t implied by jaccard ≥ t — quadratic, for
  small/medium corpora and as the differential oracle for the
  probabilistic variants.
- MinHash+LSH: the 100 TB path — fixed-size signature per doc (one
  narrow shuffle), banding turns near-dup search into equality
  buckets; candidates verified with exact Jaccard so precision is 1.
- SimHash: 64-bit sketch + banded Hamming candidates — cheaper
  signatures than MinHash, catches small edits.
- embedding cosine: exact pairs over a normalized-vector cross join
  (use the LSH route in ``similarity`` for the approximate path).

All signature math is Column expressions over xxhash64 — no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, jaccard, token_set, word_shingles


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicates via content fingerprint: one row per duplicated
    fingerprint with the member count and the keeper (min id)."""
    fp = df.select(
        F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fingerprint")
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _shingled(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    sh = word_shingles(F.col(text_col), k) if k > 1 else token_set(F.col(text_col))
    return df.select(F.col(id_col).alias("doc_id"), sh.alias("sh")).withColumn(
        "sh_n", F.size("sh")
    )


def jaccard_pairs_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    k: int = 1,
) -> DataFrame:
    """EXACT near-duplicate pairs with Jaccard ≥ threshold over word
    k-gram shingle sets (k=1 → token sets). All-pairs join pruned by
    the size bound; output (doc_a, doc_b, jac) with doc_a < doc_b."""
    a = _shingled(df, id_col, text_col, k).alias("a")
    b = _shingled(df, id_col, text_col, k).alias("b")
    t = F.lit(threshold)
    cand = a.join(
        b,
        (F.col("a.doc_id") < F.col("b.doc_id"))
        # jaccard >= t  ⇒  t·|A| ≤ |B| ≤ |A|/t  (size-band pruning)
        & (F.col("b.sh_n") >= F.ceil(F.col("a.sh_n") * t))
        & (F.col("b.sh_n") <= F.floor(F.col("a.sh_n") / t)),
        "inner",
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        cand.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("n_inter"),
            union.alias("n_union"),
            F.round(inter.cast("double") / union, 6).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def minhash_signature(sh: Column, num_perm: int = 64) -> Column:
    """MinHash signature (array<bigint>): per permutation i, the min
    of xxhash64(shingle, seed=i) over the shingle set."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
    )


def _minhash_sig(shingled: DataFrame, num_perm: int) -> DataFrame:
    """(doc_id, sig: array<bigint>) MinHash signatures from a
    ``_shingled`` frame, via explode + codegen'd MIN aggregates
    (map-side combine; whole-stage codegen) instead of nested array
    lambdas — the lambda form is interpreted per shingle×perm and
    ~50× slower."""
    exploded = shingled.select("doc_id", F.explode("sh").alias("s"))
    return (
        exploded.groupBy("doc_id")
        .agg(
            *[
                F.min(F.xxhash64("s", F.lit(i))).alias(f"h{i}")
                for i in range(num_perm)
            ]
        )
        .select(
            "doc_id",
            F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig"),
        )
    )


def _band_rows(sig: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(doc_id, band, bucket) LSH rows from a ``_minhash_sig`` frame.
    Bucket values are bit-identical to hashing the h0..hN min columns
    directly (element_at reads the same bigints), so persisted indexes
    and the gate oracles are unaffected by the signature refactor."""
    rows_per_band = num_perm // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("sig", i + 1)
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")


def _minhash_banded(shingled: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(doc_id, band, bucket) LSH rows from a ``_shingled`` frame.

    Bucket rows carry ONLY (doc_id, band, bucket) — the shingle
    arrays never enter any downstream join shuffle. A document's
    signature depends only on its own shingles, so banding is stable
    across corpus subsets — the property the incremental index
    (``build_minhash_index``) rests on."""
    return _band_rows(_minhash_sig(shingled, num_perm), num_perm, bands)


def _drop_hot_buckets(
    banded: DataFrame, max_bucket: int, stats: dict | None
) -> DataFrame:
    """Drop (band, bucket) groups with more than ``max_bucket`` member
    docs — the standard guard against boilerplate/template text whose
    identical band minima otherwise create O(bucket²) candidate pairs
    (published MinHash-dedup pipelines drop these mega-buckets; their
    members are near-dups of a template, not of each other). One
    window over the same (band, bucket) keys the candidate self-join
    shuffles on. NOT silent: pass ``stats`` to receive the dropped
    bucket/row counts, which callers must surface."""
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    sized = banded.withColumn("__bn", F.count("*").over(w))
    if stats is not None:
        hot = (
            sized.filter(F.col("__bn") > max_bucket)
            .groupBy("band", "bucket")
            .count()
        )
        agg = hot.agg(
            F.count("*").alias("nb"), F.coalesce(F.sum("count"), F.lit(0)).alias("nr")
        ).collect()[0]
        stats["hot_buckets_dropped"] = int(agg["nb"])
        stats["banded_rows_dropped"] = int(agg["nr"])
    return sized.filter(F.col("__bn") <= max_bucket).drop("__bn")


def _est_match_count(sig_a: Column, sig_b: Column) -> Column:
    """Number of matching MinHash permutations between two signatures
    — an unbiased Jaccard estimate (matches/num_perm) with std
    sqrt(J(1-J)/num_perm), used to prune candidate pairs before the
    exact shingle-set verify."""
    return F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    pins: list | None = None,
    est_margin: float | None = None,
    max_bucket: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified.

    shingle → signature (num_perm mins) → band into ``bands`` groups
    of num_perm/bands rows → hash each band → explode → equality
    self-join per (band_id, band_hash) bucket → dedup candidate pairs
    → verify with exact Jaccard ≥ threshold (precision 1.0; recall
    1-(1-t^r)^b).

    Scale: the explode produces bands×N tiny rows; the bucket join is
    an equality shuffle join on (band, hash) — no quadratic work
    outside genuinely colliding buckets. Two opt-in guards for
    corpora where buckets DO collide pathologically (boilerplate /
    shared template passages make every carrier's band minima land on
    the same shared shingles → one bucket holds every carrier and the
    verify join drags |bucket|² shingle-array rows through a shuffle;
    measured: a 5M-doc probe with a 16-token passage shared by 10% of
    docs spilled >60 GB and GC-stalled the driver):

    - ``est_margin``: prune candidates whose SIGNATURE-estimated
      Jaccard (matching perms / num_perm, unbiased, std
      sqrt(J(1-J)/num_perm)) is below ``threshold - est_margin``
      before the shingle-array verify. The join shrinks from 1.5 KB
      shingle rows to num_perm×8 B signature rows, and shared-passage
      false candidates (est ≈ their true low Jaccard) die before the
      expensive join. With num_perm=64, margin 0.25 at threshold 0.7
      keeps a TRUE pair with probability 1-Φ(-4.4) ≈ 1-5e-6 —
      precision stays 1.0 (exact verify still runs), recall loss is
      negligible but NOT exactly zero, so the default (None) keeps
      the oracle-gated bit-exact path.
    - ``max_bucket``: drop (band, bucket) groups larger than this
      before pairing (see ``_drop_hot_buckets``; pass ``stats`` —
      callers must surface the drop counts, never cap silently).
    """
    # spread docs across cores before the CPU-heavy shingling (a small
    # parquet arrives as one partition), and cache: the shingle sets
    # feed the signature pass AND both sides of the verify join
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    shingled = _shingled(df.repartition(n_part), id_col, text_col, k).cache()
    if pins is not None:
        pins.append(shingled)
    sig = _minhash_sig(shingled, num_perm)
    if est_margin is not None:
        # the sig frame feeds banding AND the est prefilter join —
        # pin it so the min-agg over the shingle explode runs once
        sig = sig.cache()
        if pins is not None:
            pins.append(sig)
    banded = _band_rows(sig, num_perm, bands)
    if max_bucket is not None:
        banded = _drop_hot_buckets(banded, max_bucket, stats)

    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    if est_margin is not None:
        import math as _math

        min_match = max(0, _math.ceil((threshold - est_margin) * num_perm))
        cand = (
            cand.join(
                sig.select(
                    F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")
                ),
                "doc_a",
            )
            .join(
                sig.select(
                    F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")
                ),
                "doc_b",
            )
            .filter(
                _est_match_count(F.col("sig_a"), F.col("sig_b")) >= min_match
            )
            .select("doc_a", "doc_b")
        )
    sh_only = shingled.select("doc_id", "sh")
    verified = (
        cand.join(
            sh_only.select(
                F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
            ),
            "doc_a",
        )
        .join(
            sh_only.select(
                F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
            ),
            "doc_b",
        )
    )
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return verified.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jac")
    ).filter(F.col("jac") >= threshold)



def _md5_nibble_sql(j: int) -> str:
    """Hex nibble ``j`` (0-based) of a lowercase-hex digest column
    ``h``, as dialect-agnostic SQL (identical text runs on Spark SQL
    and DuckDB — this sharing is what keeps the md5-sketch operators
    and their DuckDB oracles bit-identical; instr/strpos can't be used
    because Spark's needs a literal needle)."""
    c = f"ascii(substr(h, {j + 1}, 1))"
    return f"(CASE WHEN {c} >= 97 THEN {c} - 87 ELSE {c} - 48 END)"


def _md5_hex8_bigint_sql() -> str:
    """First 8 hex nibbles of digest column ``h`` packed into a BIGINT
    (BIGINT per term — INT32 would silently wrap in Spark and raise in
    DuckDB). Same dialect-agnostic property as ``_md5_nibble_sql``."""
    return " + ".join(
        f"(CAST({_md5_nibble_sql(j)} AS BIGINT) * {16 ** (7 - j)})"
        for j in range(8)
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme: Schleimer,
    Wilkerson & Aiken, SIGMOD'03): hash every character k-gram, then
    keep the MIN hash of each window of ``w`` consecutive k-grams —
    the distinct kept hashes are the document's fingerprint set, which
    two documents share iff they share sufficiently long substrings.

    Set-based shape (no per-row Python, no sequential scan): k-gram
    positions come from ``posexplode(sequence(...))``, the per-gram
    hash is md5-derived (first 8 hex nibbles → int, so a DuckDB oracle
    recomputes it bit-identically — classic Rabin-Karp rolling hashes
    are an O(1)-per-step sequential optimization with the same output
    set; distributed, the window-min over position IS the rolling
    structure), and window selection is one ``min() OVER (PARTITION BY
    doc ORDER BY pos ROWS w-1 FOLLOWING)`` pass. One shuffle on
    doc_id; output is the distinct (doc_id, fingerprint) set.

    Documents shorter than ``k`` chars contribute their whole text as
    a single gram; fewer than ``w`` grams yield one whole-document
    window. Window starts run 1..max(n_grams-w+1, 1).
    """
    from pyspark.sql import Window as W

    norm = (
        f"trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' '))"
    )
    normed = df.select(
        F.col(id_col).alias("doc_id"), F.expr(norm).alias("nrm")
    )
    # posexplode is 0-based; +1 aligns positions with the 1-based
    # oracle SQL (matters for the short-document window boundary)
    grams = normed.selectExpr(
        "doc_id",
        f"posexplode(transform(sequence(1, greatest(length(nrm) - {k} + 1, 1)),"
        f" i -> substring(nrm, i, {k}))) AS (pos0, g)",
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    if hash_fn == "xxhash64":
        # production default: one 64-bit hash per gram, ~5x the
        # md5-nibble path (measured at sf0.1); engine-specific
        hashed = grams.select(
            "doc_id", "pos", F.xxhash64("g").alias("hv")
        )
    elif hash_fn == "md5":
        hashed = grams.withColumn("h", F.md5("g")).select(
            "doc_id",
            "pos",
            F.expr(f"CAST({_md5_hex8_bigint_sql()} AS BIGINT)").alias("hv"),
        )
    else:  # pragma: no cover - contract
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    win = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, w - 1)
    )
    n_win = W.partitionBy("doc_id")
    kept = (
        hashed.withColumn("wmin", F.min("hv").over(win))
        .withColumn("n_grams", F.max("pos").over(n_win))
        .filter(F.col("pos") <= F.greatest(F.col("n_grams") - w + 1, F.lit(1)))
        .select("doc_id", F.col("wmin").alias("fingerprint"))
        .distinct()
    )
    return kept


def winnowing_oracle_sql(
    table: str, id_col: str, text_col: str, k: int = 8, w: int = 4
) -> str:
    """DuckDB SQL recomputing ``winnowing_fingerprints`` exactly."""
    norm = (
        f"trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' ', 'g'))"
    )
    val = _md5_hex8_bigint_sql()
    return f"""
WITH d AS (SELECT {id_col} AS doc_id, {norm} AS nrm FROM {table}),
g0 AS (
  SELECT doc_id, nrm,
         unnest(range(1, greatest(length(nrm) - {k} + 1, 1) + 1)) AS pos
  FROM d),
grams AS (SELECT doc_id, pos, md5(substr(nrm, pos, {k})) AS h FROM g0),
hashed AS (SELECT doc_id, pos, CAST({val} AS BIGINT) AS hv FROM grams),
kept AS (
  SELECT doc_id, pos,
         MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wmin,
         MAX(pos) OVER (PARTITION BY doc_id) AS n_grams
  FROM hashed)
SELECT DISTINCT doc_id, wmin AS fingerprint
FROM kept
WHERE pos <= greatest(n_grams - {w} + 1, 1)
"""


# SQL-expr form because the Python F.shiftright/shiftleft helpers only
# accept literal shift amounts; the SQL functions take full expressions
_SIMHASH_SQL = """
aggregate(
  zip_with(
    aggregate(
      {toks},
      array_repeat(0, 64),
      (acc, tok) -> zip_with(
        acc,
        transform(sequence(0, 63),
                  i -> CASE WHEN (shiftright(xxhash64(tok), i) & 1) = 1
                            THEN 1 ELSE -1 END),
        (a, b) -> a + b)),
    sequence(0, 63),
    (c, i) -> CASE WHEN c > 0 THEN shiftleft(CAST(1 AS BIGINT), i)
                   ELSE CAST(0 AS BIGINT) END),
  CAST(0 AS BIGINT),
  (acc, x) -> acc | x)
"""


def simhash64(text_col_name: str) -> Column:
    """64-bit SimHash of the token set: per bit, sum +1/-1 weighted by
    each token-hash's bit, take the sign. Pure JVM expressions."""
    toks_sql = (
        "array_distinct(split(trim(regexp_replace(lower("
        f"{text_col_name}), '[^a-z0-9]+', ' ')), ' '))"
    )
    return F.expr(_SIMHASH_SQL.format(toks=toks_sql))


def simhash60_md5(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Engine-portable 60-bit SimHash sketch → (doc_id, sim).

    Per-token bits come from the first 15 hex nibbles of md5(token)
    (both Spark and DuckDB ship bit-identical lowercase-hex md5), so a
    DuckDB oracle can recompute the IDENTICAL sketch — unlike the
    xxhash64 variant (``simhash64``), which stays the fast
    production default. 60 bits (not 64) keeps every shift inside a
    signed BIGINT's non-negative range in both engines.

    Shape: explode tokens → 15 nibble columns → 60 codegen'd SUM
    aggregates (±1 per bit) → sign → bit-pack. One shuffle on doc_id
    with map-side partial aggregation — the same scale shape as the
    MinHash signature pass."""
    toks = (
        "array_distinct(split(trim(regexp_replace(lower("
        f"{text_col}), '[^a-z0-9]+', ' ')), ' '))"
    )
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(toks)).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok")))
    # hex nibble j of the md5 digest, via ascii (instr needs a literal
    # needle, so the alphabet-lookup form isn't expressible)
    nibbles = tok.select(
        "doc_id",
        *[F.expr(_md5_nibble_sql(j)).alias(f"n{j}") for j in range(15)],
    )
    sums = nibbles.groupBy("doc_id").agg(
        *[
            F.sum(
                F.expr(
                    f"CASE WHEN (shiftright(n{i // 4}, {i % 4}) & 1) = 1 "
                    "THEN 1 ELSE -1 END"
                )
            ).alias(f"b{i}")
            for i in range(60)
        ]
    )
    packed = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) "
        "ELSE CAST(0 AS BIGINT) END)"
        for i in range(60)
    )
    return sums.select("doc_id", F.expr(packed).alias("sim"))


def simhash_md5_oracle_sql(table: str, text_col: str, max_hamming: int) -> str:
    """DuckDB SQL recomputing ``simhash60_md5`` bit-identically and
    filtering ALL pairs by true Hamming distance — the differential
    oracle for ``simhash_pairs(hash_fn='md5')`` (valid because 15×4-bit
    banding has recall 1.0 for Hamming ≤ 14 by pigeonhole)."""
    nibbles = ", ".join(
        f"{_md5_nibble_sql(j)} AS n{j}" for j in range(15)
    )
    sums = ", ".join(
        f"SUM(CASE WHEN ((n{i // 4} >> {i % 4}) & 1) = 1 "
        f"THEN 1 ELSE -1 END) AS b{i}"
        for i in range(60)
    )
    packed = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i in range(60)
    )
    norm = (
        f"trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' ', 'g'))"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, md5(unnest(list_distinct(string_split({norm}, ' ')))) AS h
  FROM {table}),
nib AS (SELECT doc_id, {nibbles} FROM tok),
bits AS (SELECT doc_id, {sums} FROM nib GROUP BY doc_id),
sk AS (SELECT doc_id, {packed} AS sim FROM bits)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sim, b.sim)) AS hamming
FROM sk a JOIN sk b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
"""


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    hash_fn: str = "xxhash64",
    cache_sketch: bool = True,
) -> DataFrame:
    """SimHash near-dup candidates: band the sketch into 4-bit
    chunks — by pigeonhole, any pair with Hamming ≤ chunks−1 shares at
    least one exact chunk, so recall is GUARANTEED for the default
    max_hamming=8 (unlike coarser bandings); precision comes from the
    true-Hamming filter.

    ``hash_fn='xxhash64'`` (default): 64-bit sketch, cheapest (one JVM
    expression). ``hash_fn='md5'``: 60-bit engine-portable sketch
    (``simhash60_md5``) whose DuckDB twin is bit-identical — the
    differential-oracle path."""
    if hash_fn == "md5":
        sh = simhash60_md5(df, id_col, text_col)
        n_chunks = 15
    elif hash_fn == "xxhash64":
        sh = df.select(
            F.col(id_col).alias("doc_id"), simhash64(text_col).alias("sim")
        )
        n_chunks = 16
    else:  # pragma: no cover - contract
        raise ValueError(f"unknown hash_fn {hash_fn!r}")

    # Exact-dedup BEFORE near-dedup (the standard pipeline order): a
    # duplicate-heavy corpus floods every chunk bucket with identical
    # sketches, making the banding join quadratic in MEMBER count.
    # Banding over DISTINCT sketches is quadratic only in distinct-
    # sketch count; same-sketch pairs (Hamming 0) and the member
    # expansion of surviving sketch pairs are pure equality joins
    # bounded by OUTPUT size — semantically identical, and the
    # sketch-level dedup shuffle is ``n_chunks×`` smaller.
    # cache: the sketch feeds the distinct-sketch banding AND both
    # member-expansion joins. Spark's CacheManager dedups cache entries
    # by logical plan, so repeated calls over the same input reuse one
    # entry rather than accumulating; for one-shot batch use the entry
    # dies with the session.  A long-lived server sweeping MANY
    # DIFFERENT corpora accumulates one entry per distinct input plan:
    # pass ``cache_sketch=False`` there (the sketch is recomputed per
    # consumer — 3 map-side passes, no pinned memory) or evict between
    # corpora via ``spark.catalog.clearCache()``.
    if cache_sketch:
        sh = sh.cache()
    sketches = sh.select("sim").distinct()

    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col("sim"), i * 4)
                .bitwiseAND(F.lit(0xF))
                .alias("val"),
            )
            for i in range(n_chunks)
        ]
    )
    banded = sketches.select(
        "sim", F.explode(chunks).alias("c")
    ).select("sim", "c.chunk", "c.val")
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
    sketch_pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.sim") < F.col("b.sim")),
        )
        .select(
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["sim_a", "sim_b"])
    )
    ma = sh.select(F.col("sim").alias("sim_a"), F.col("doc_id").alias("id_a"))
    mb = sh.select(F.col("sim").alias("sim_b"), F.col("doc_id").alias("id_b"))
    cross = (
        sketch_pairs.join(ma, "sim_a")
        .join(mb, "sim_b")
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            "hamming",
        )
    )
    same = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.sim") == F.col("y.sim"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def build_minhash_index(
    df: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
) -> dict:
    """Persist the corpus side of MinHash-LSH dedup so NEW batches can
    be deduped against the corpus without recomputing it — the daily
    incremental shape of a 100 TB training-data pipeline (a full-corpus
    re-run per arriving batch is quadratic in total over a corpus's
    lifetime; the index makes each batch O(batch + matches)).

    Writes to ``index_dir``:
      - ``banded.parquet`` — (doc_id, band, bucket) LSH rows,
      - ``sigs.parquet`` — (doc_id, sig array<bigint>) MinHash
        signatures, for the ``est_margin`` candidate prefilter,
      - ``shingles.parquet`` — (doc_id, sh, sh_n) for exact verify of
        candidates only,
      - ``meta.json`` — the (k, num_perm, bands) recipe; queries must
        hash with the SAME recipe or buckets never match.

    Returns the meta dict. Like ``build_ivf_index``, this is the
    ANALYZE-once/query-many trade: signatures are computed once per
    corpus revision."""
    import json as _json
    from pathlib import Path as _Path

    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    shingled = _shingled(df.repartition(n_part), id_col, text_col, k).cache()
    out = _Path(index_dir)
    out.mkdir(parents=True, exist_ok=True)
    # persist signatures once, derive band rows from the PERSISTED
    # sigs — one min-agg pass total, and the banding provably hashes
    # the exact longs the est prefilter will later compare against
    _minhash_sig(shingled, num_perm).write.mode("overwrite").parquet(
        str(out / "sigs.parquet")
    )
    sig = spark.read.parquet(str(out / "sigs.parquet"))
    _band_rows(sig, num_perm, bands).write.mode("overwrite").parquet(
        str(out / "banded.parquet")
    )
    shingled.write.mode("overwrite").parquet(str(out / "shingles.parquet"))
    n_docs = spark.read.parquet(str(out / "shingles.parquet")).count()
    shingled.unpersist()
    meta = {"k": k, "num_perm": num_perm, "bands": bands, "n_docs": n_docs}
    (out / "meta.json").write_text(_json.dumps(meta), encoding="utf-8")
    return meta


def minhash_dedup_incremental(
    new_docs: DataFrame,
    index_dir: str,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    est_margin: float | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and the indexed corpus:
    (doc_new, doc_corpus, jac) with exact Jaccard ≥ ``threshold``.

    The batch is shingled/banded with the index's recipe (signatures
    depend only on a doc's own shingles, so banding matches are
    IDENTICAL to what a full-corpus run would produce — the measured
    recall of the full-corpus banding carries over exactly); the
    bucket join touches only (id, band, bucket) rows; exact
    verification joins shingle sets for CANDIDATES only. Batch-
    internal duplicates are the existing ``minhash_lsh_pairs`` job.

    ``est_margin``: same opt-in signature-estimate candidate prune as
    ``minhash_lsh_pairs`` (see there for the recall math) — candidates
    below ``threshold - est_margin`` estimated Jaccard are dropped
    against the index's persisted ``sigs.parquet`` before the shingle
    verify join. Requires an index written by this version (raises a
    clear error on a legacy index without sigs.parquet).

    Per-batch cost contract: with batch ≪ corpus the candidate set is
    batch-sized, so the corpus-side sig/shingle frames are pruned by a
    BROADCAST candidate-id semi-join BEFORE their equi-joins — the
    at-rest index is only ever SCANNED (embarrassingly parallel),
    never shuffled or sorted. Without the prune, Catalyst plans a
    sort-merge join whose shuffle carries the ENTIRE shingle index
    (measured at a 10M-doc index / 1M-doc batch: 1188 s → the shuffle
    and sort of ~15 GB of corpus shingle arrays dominated; with the
    prune the same probe is O(batch + matches)). The one remaining
    O(corpus) exchange is the banding join on (band, bucket) — the
    candidate generator itself, which cannot be pruned by ids it has
    not produced yet. ``pins`` collects the frames this function
    persists (candidates are consumed by two joins each); callers
    should unpersist them after their action, as with
    ``minhash_lsh_pairs``."""
    import json as _json
    from pathlib import Path as _Path

    spark = new_docs.sparkSession
    meta = _json.loads(
        (_Path(index_dir) / "meta.json").read_text(encoding="utf-8")
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    new_sh = _shingled(
        new_docs.repartition(n_part), id_col, text_col, meta["k"]
    ).cache()
    new_sig = _minhash_sig(new_sh, meta["num_perm"])
    if est_margin is not None:
        if not (_Path(index_dir) / "sigs.parquet").exists():
            raise ValueError(
                f"est_margin needs {index_dir}/sigs.parquet; this index "
                "predates signature persistence — rebuild it with "
                "build_minhash_index"
            )
        new_sig = new_sig.cache()
    new_banded = _band_rows(new_sig, meta["num_perm"], meta["bands"])
    corpus_banded = spark.read.parquet(str(_Path(index_dir) / "banded.parquet"))
    cand = (
        new_banded.alias("a")
        .join(
            corpus_banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.doc_id").alias("doc_new"),
            F.col("b.doc_id").alias("doc_corpus"),
        )
        .dropDuplicates(["doc_new", "doc_corpus"])
        # candidates feed a broadcast-id prune AND an equi-join each
        # stage — pin so the banding join runs once
        .persist()
    )
    if pins is not None:
        pins.append(cand)

    def _prune_by_cand(indexed: DataFrame, ids: DataFrame) -> DataFrame:
        """Restrict an at-rest index frame to candidate corpus docs
        via a broadcast semi-join: the index is SCANNED map-side, its
        rows never enter a shuffle or sort (batch ≪ corpus makes the
        id set broadcast-sized by construction)."""
        return indexed.withColumnRenamed("doc_id", "doc_corpus").join(
            F.broadcast(ids), "doc_corpus", "left_semi"
        )

    if est_margin is not None:
        import math as _math

        min_match = max(
            0, _math.ceil((threshold - est_margin) * meta["num_perm"])
        )
        corpus_sig = _prune_by_cand(
            spark.read.parquet(str(_Path(index_dir) / "sigs.parquet")),
            cand.select("doc_corpus").distinct(),
        )
        cand = (
            cand.join(
                new_sig.select(
                    F.col("doc_id").alias("doc_new"),
                    F.col("sig").alias("sig_a"),
                ),
                "doc_new",
            )
            .join(
                corpus_sig.select("doc_corpus", F.col("sig").alias("sig_b")),
                "doc_corpus",
            )
            .filter(
                _est_match_count(F.col("sig_a"), F.col("sig_b")) >= min_match
            )
            .select("doc_new", "doc_corpus")
            .persist()
        )
        if pins is not None:
            pins.append(cand)
    corpus_sh = _prune_by_cand(
        spark.read.parquet(str(_Path(index_dir) / "shingles.parquet")),
        cand.select("doc_corpus").distinct(),
    )
    verified = cand.join(
        new_sh.select(F.col("doc_id").alias("doc_new"), F.col("sh").alias("sh_a")),
        "doc_new",
    ).join(
        corpus_sh.select("doc_corpus", F.col("sh").alias("sh_b")),
        "doc_corpus",
    )
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return verified.select(
        "doc_new", "doc_corpus", F.round(jac, 6).alias("jac")
    ).filter(F.col("jac") >= threshold)
