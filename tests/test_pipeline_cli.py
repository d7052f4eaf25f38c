"""End-to-end corpus build via the library entry and the CLI."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.pipeline import (
    build_corpus,
)


def _write_corpus(spark, path):
    base = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "in the park with a friend that it is good to see "
    )
    rows = []
    for i in range(40):
        # 35 distinct docs; ids 35..39 duplicate ids 0..4's text exactly
        j = i % 35
        rows.append((i, base * 3 + f"variant {j} contact u{j}@example.com"))
    # two junk docs that fail the quality gate (no stopwords, shouty)
    rows += [(100, "#### $$$$ %%%% !!!!"), (101, "x")]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(path))


def test_build_corpus_end_to_end(spark, tmp_path):
    src = tmp_path / "docs.parquet"
    out = tmp_path / "out"
    _write_corpus(spark, src)

    summary = build_corpus(spark, str(src), str(out), seed="s1")
    assert summary["n_docs_raw"] == 42
    # 35 unique texts survive quality+dedup; junk docs filtered
    assert summary["n_docs_kept"] == 35
    assert summary["n_chunks"] >= summary["n_docs_kept"]
    assert (out / "summary.json").exists()
    assert json.loads((out / "summary.json").read_text()) == summary

    chunks = spark.read.parquet(summary["chunks_path"])
    # PII is gone from every chunk's id... chunks carry hashes only;
    # verify redaction via the doc count and re-reading text is not
    # possible (chunks store md5) — instead check schema + ordering
    assert {"doc_id", "chunk_idx", "start_tok", "n_tok", "chunk_md5",
            "pos", "sample_id"} <= set(chunks.columns)
    # sample_id is globally unique and the files are range-ordered
    n = chunks.count()
    assert chunks.select("sample_id").distinct().count() == n

    # determinism: same seed → same layout; different seed → different
    s2 = build_corpus(spark, str(src), str(out / "b"), seed="s1")
    assert s2["n_chunks"] == summary["n_chunks"]
    a = spark.read.parquet(summary["chunks_path"]).select(
        "doc_id", "pos"
    ).distinct()
    b = spark.read.parquet(s2["chunks_path"]).select(
        "doc_id", "pos"
    ).distinct()
    assert a.exceptAll(b).count() == 0


def test_corpus_cli(spark, tmp_path, monkeypatch, capsys):
    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs.parquet"
    out = tmp_path / "cli_out"
    _write_corpus(spark, src)
    # the CLI builds its own session via get_spark() — same JVM reuse
    rc = cli.main(
        [
            "corpus",
            "--input", str(src),
            "--output", str(out),
            "--seed", "cli-1",
        ]
    )
    assert rc == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["n_docs_kept"] == 35
    assert (out / "chunks.parquet").exists()


def test_build_corpus_redaction_applied(spark, tmp_path):
    src = tmp_path / "docs2.parquet"
    _write_corpus(spark, src)
    a = build_corpus(spark, str(src), str(tmp_path / "r1"), redact=True)
    b = build_corpus(spark, str(src), str(tmp_path / "r0"), redact=False)
    ca = spark.read.parquet(a["chunks_path"])
    cb = spark.read.parquet(b["chunks_path"])
    # same layout, different chunk content where the email lived
    assert a["n_chunks"] == b["n_chunks"]
    diff = (
        ca.select("doc_id", "chunk_idx", "chunk_md5")
        .join(
            cb.select(
                "doc_id", "chunk_idx", F.col("chunk_md5").alias("md5_b")
            ),
            ["doc_id", "chunk_idx"],
        )
        .filter(F.col("chunk_md5") != F.col("md5_b"))
        .count()
    )
    assert diff > 0


def test_build_corpus_near_dedup(spark, tmp_path):
    """--near-dedup collapses the variant docs (identical base text,
    tiny suffix → word-3-gram Jaccard ≈ 0.7) to survivors, composed from the gated
    minhash/cluster/survivor operators; summary accounts exactly."""
    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)

    plain = build_corpus(spark, str(src), str(tmp_path / "plain"), seed="s1")
    near = build_corpus(
        spark,
        str(src),
        str(tmp_path / "near"),
        seed="s1",
        near_dedup=True,
        near_threshold=0.7,
    )
    assert near["near_dedup"] is True
    assert near["n_near_dups_removed"] > 0
    assert (
        near["n_docs_kept"]
        == plain["n_docs_kept"] - near["n_near_dups_removed"]
    )
    chunks = spark.read.parquet(near["chunks_path"])
    assert chunks.select("doc_id").distinct().count() == near["n_docs_kept"]
    # permutation layout intact after the extra stage
    assert (
        chunks.select("sample_id").distinct().count() == chunks.count()
    )
    spark.catalog.clearCache()


def test_corpus_cli_near_dedup_flag(spark, tmp_path, capsys):
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "o"),
         "--near-dedup", "--near-threshold", "0.7"]
    )  # fmt: skip
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["near_dedup"] is True and summary["n_near_dups_removed"] > 0


def test_corpus_cli_checkpoint_stages_flag(spark, tmp_path, capsys):
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "o"),
         "--near-dedup", "--near-threshold", "0.7", "--checkpoint-stages"]
    )  # fmt: skip
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["checkpoint_stages"] is True
    assert (tmp_path / "o" / "_stages" / "near_dedup").is_dir()


def test_build_corpus_span_mask(spark, tmp_path):
    """--span-mask-window cuts corpus-duplicated passages: the shared
    base text vanishes from every doc, fully-duplicated docs drop."""
    src = tmp_path / "docs_mask.parquet"
    base = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "in the park with a friend that it is good to see "
    )
    rows = [(i, base * 3 + f"unique tail number {i} here") for i in range(6)]
    rows.append((50, base * 3))  # all-duplicated -> masked to empty
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(src))

    summary = build_corpus(
        spark,
        str(src),
        str(tmp_path / "masked"),
        seed="s1",
        span_mask_window=8,
    )
    assert summary["span_mask_window"] == 8
    assert summary["n_docs_emptied_by_mask"] == 1
    assert summary["n_docs_kept"] == 6
    # every surviving chunk comes from the unique tails only: with the
    # base text cut, each doc's remaining text is far under one chunk
    assert summary["n_chunks"] == 6
    assert summary["n_tokens"] < 6 * 12
    spark.catalog.clearCache()


def test_build_corpus_ppl_filter(spark, tmp_path):
    """--ppl-threshold drops out-of-distribution docs under the
    self-trained bigram LM; the threshold sits between the measured
    in-distribution and OOD score levels."""
    from pyspark.sql import functions as SF

    from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (
        score_perplexity,
        train_bigram_lm,
    )

    src = tmp_path / "docs_ppl.parquet"
    base = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "in the park with a friend that it is good to see "
    )
    rows = [(i, base * 3 + f"variant {i}") for i in range(10)]
    # passes the quality gate (stopwords, length, clean punctuation)
    # but its bigrams never occur elsewhere -> high cross-entropy
    ood = (
        "the zebra quantum warbles of nebular kumquat to distant argon "
        "whispers and the vortex mangles it with plasmid echoes that is "
        "a riddle in the bramble of a glacial photon sea to see"
    )
    rows.append((90, ood))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    docs.write.mode("overwrite").parquet(str(src))

    model = train_bigram_lm(docs)
    scores = {
        r["doc_id"]: r["cross_entropy"]
        for r in score_perplexity(docs, model).collect()
    }
    in_max = max(v for k, v in scores.items() if k != 90)
    assert scores[90] > in_max  # OOD really is separable
    thr = (in_max + scores[90]) / 2

    summary = build_corpus(
        spark, str(src), str(tmp_path / "ppl"), seed="s1", ppl_threshold=thr
    )
    assert summary["n_docs_dropped_by_ppl"] == 1
    assert summary["n_docs_kept"] == 10
    chunks = spark.read.parquet(summary["chunks_path"])
    assert chunks.filter(SF.col("doc_id") == 90).count() == 0
    spark.catalog.clearCache()


def test_corpus_cli_new_stage_flags(spark, tmp_path, capsys):
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "o2"),
         "--span-mask-window", "8", "--ppl-threshold", "99.0"]
    )  # fmt: skip
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["span_mask_window"] == 8
    assert summary["ppl_threshold"] == 99.0
    # lenient threshold drops nothing; masking still accounted
    assert summary["n_docs_dropped_by_ppl"] == 0


def test_build_corpus_gopher_filter(spark, tmp_path, capsys):
    """--gopher swaps the quality screen for the published rule
    battery: repetitive docs (HIGH_DUP_2GRAM) and short docs fall."""
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs_gopher.parquet"
    # 6 clean docs (unique bigrams, stopwords, 60 words) + 1
    # repetitive doc + 1 short doc
    clean = [
        (i, " ".join(f"the item{i}x{j} holds value{i}x{j}" for j in range(15)))
        for i in range(6)
    ]
    rows = clean + [
        (50, " ".join(["the dogs ate bones"] * 15)),  # dup-2gram
        (51, "the of short"),                          # too few words
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(src))

    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "g"),
         "--gopher"]
    )  # fmt: skip
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["gopher"] is True
    assert summary["n_docs_kept"] == 6


def test_corpus_cli_all_stages_composed(spark, tmp_path, capsys):
    """Kitchen sink: gopher quality + exact dedup + MinHash near-dedup
    + ExactSubstr masking + CCNet screen + redaction + chunk/shuffle
    layout in ONE invocation — the stages must compose, and the
    accounting must add up."""
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    def gooddoc(tag, n=15):
        return " ".join(f"the {tag}{j} holds value{tag}{j}" for j in range(n))

    shared = " ".join(f"the common{j} block holds part{j}" for j in range(4))
    rows = [
        (0, gooddoc("alpha")),
        (1, gooddoc("beta")),
        (2, gooddoc("gamma")),
        (3, gooddoc("alpha") + " tiny suffix change here"),  # near-dup of 0
        (4, gooddoc("delta", 10) + " " + shared),            # share a passage
        (5, gooddoc("omega", 10) + " " + shared),
        (6, gooddoc("beta")),                                # exact dup of 1
        (7, "the of short"),                                 # gopher: too few words
    ]
    src = tmp_path / "docs_all.parquet"
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(src))

    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "all"),
         "--gopher", "--near-dedup", "--near-threshold", "0.7",
         "--span-mask-window", "8", "--ppl-threshold", "99.0",
         "--seed", "mix-1"]
    )  # fmt: skip
    assert rc == 0
    s = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_docs_raw"] == 8
    assert s["gopher"] is True
    # doc 7 fails gopher; doc 6 exact-dedups; doc 3 near-dedups into 0
    assert s["n_near_dups_removed"] >= 1
    assert s["n_docs_dropped_by_ppl"] == 0  # lenient threshold
    assert s["n_docs_emptied_by_mask"] == 0
    assert 4 <= s["n_docs_kept"] <= 5
    chunks = spark.read.parquet(s["chunks_path"])
    assert chunks.select("doc_id").distinct().count() == s["n_docs_kept"]
    assert chunks.select("sample_id").distinct().count() == chunks.count()
    spark.catalog.clearCache()


def _write_lang_corpus(spark, path):
    """10 English docs (stopword-rich, shared bigrams) + 5 'xx' docs
    (no stopwords, disjoint bigram space). Every text is unique so
    exact dedup keeps all 15; every doc passes quality_min=0.0."""
    en_base = (
        "the quick brown fox jumps over the lazy dog and it is a fine "
        "day in the park with a friend that it is good to see "
    )
    rows = [(i, en_base + f"variant {i} of the tale", "en") for i in range(10)]
    rows += [
        (100 + i, f"zorp{i} blick quax flem zorp{i} drun quax blick flem wex", "xx")
        for i in range(5)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    ).write.mode("overwrite").parquet(str(path))


def test_build_corpus_quality_model(spark, tmp_path):
    """--quality-model trains the gated logreg screen on a weak label
    evaluated against the RAW frame (lang survives there even though
    the dedup projection drops it) and drops docs below the cutoff;
    the kept set matches an independent replay of fit+score."""
    from data_lakehouse_movilidad_publica_santiago_spark.functions.text import (
        QUALITY_STOPWORDS,
        mean_word_length,
        punct_ratio,
        stopword_ratio,
        token_count,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.logreg import (
        logreg_fit,
        logreg_score,
    )

    src = tmp_path / "docs_qm.parquet"
    _write_lang_corpus(spark, src)
    docs = spark.read.parquet(str(src))

    # independent replay: same features, same label, same 3 GD steps
    feats = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("label"),
        stopword_ratio(F.col("text"), QUALITY_STOPWORDS).alias("f1"),
        punct_ratio(F.col("text")).alias("f2"),
        (mean_word_length(F.col("text")) / F.lit(10.0)).alias("f3"),
        (token_count(F.col("text")) / F.lit(100.0)).alias("f4"),
    )
    fcols = ["f1", "f2", "f3", "f4"]
    w = logreg_fit(feats, fcols, "label", iters=3, lr=1.0)
    scored = {
        r["doc_id"]: r["p"]
        for r in logreg_score(feats, w, fcols).collect()
    }
    # a cutoff strictly between the two groups' learned scores
    p_en = [scored[i] for i in range(10)]
    p_xx = [scored[100 + i] for i in range(5)]
    assert min(p_en) > max(p_xx)  # the screen really separates
    cutoff = (min(p_en) + max(p_xx)) / 2

    summary = build_corpus(
        spark,
        str(src),
        str(tmp_path / "qm"),
        seed="s1",
        quality_min=0.0,
        quality_model_label="lang = 'en'",
        quality_model_min=cutoff,
    )
    assert summary["quality_model_label"] == "lang = 'en'"
    assert summary["n_docs_dropped_by_quality_model"] == 5
    assert summary["n_docs_kept"] == 10
    assert summary["quality_model_weights"] == w
    chunks = spark.read.parquet(summary["chunks_path"])
    assert chunks.filter(F.col("doc_id") >= 100).count() == 0
    spark.catalog.clearCache()


def test_build_corpus_dsir_selection(spark, tmp_path):
    """--dsir-target/--dsir-top-k keep only the K most target-like
    survivors: with an English target slice, the disjoint-bigram 'xx'
    docs rank below every English doc and fall out."""
    src = tmp_path / "docs_dsir.parquet"
    _write_lang_corpus(spark, src)

    summary = build_corpus(
        spark,
        str(src),
        str(tmp_path / "dsir"),
        seed="s1",
        quality_min=0.0,
        dsir_target="lang = 'en'",
        dsir_top_k=8,
    )
    assert summary["dsir_target"] == "lang = 'en'"
    assert summary["dsir_top_k"] == 8
    assert summary["n_docs_kept"] == 8
    assert summary["n_docs_dropped_by_dsir"] == 15 - 8
    chunks = spark.read.parquet(summary["chunks_path"])
    kept_ids = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    assert len(kept_ids) == 8
    assert all(i < 100 for i in kept_ids)  # all selected docs are 'en'
    spark.catalog.clearCache()


def test_build_corpus_dsir_requires_top_k(spark, tmp_path):
    import pytest

    src = tmp_path / "docs_dsir2.parquet"
    _write_lang_corpus(spark, src)
    with pytest.raises(ValueError, match="dsir_top_k"):
        build_corpus(
            spark, str(src), str(tmp_path / "x"),
            quality_min=0.0, dsir_target="lang = 'en'",
        )  # fmt: skip


def test_corpus_cli_selection_flags(spark, tmp_path, capsys):
    """CLI round-trip for --quality-model and --dsir-target: both
    stages run in one invocation and the accounting composes."""
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs_sel.parquet"
    _write_lang_corpus(spark, src)
    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "sel"),
         "--quality-min", "0.0",
         "--quality-model", "lang = 'en'", "--quality-model-min", "0.01",
         "--dsir-target", "lang = 'en'", "--dsir-top-k", "6",
         "--seed", "sel-1"]
    )  # fmt: skip
    assert rc == 0
    s = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # lenient model cutoff drops nothing; DSIR then caps at 6
    assert s["quality_model_label"] == "lang = 'en'"
    assert s["quality_model_weights"] is not None
    assert s["n_docs_kept"] == 6
    assert s["n_docs_dropped_by_dsir"] == 15 - s["n_docs_dropped_by_quality_model"] - 6
    spark.catalog.clearCache()


def test_build_corpus_split(spark, tmp_path):
    """--split partitions the chunk layout into leakage-free document-
    level splits: every doc's chunks live in exactly one split, the
    splits are exhaustive, and the assignment is seed-deterministic."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
        split_assign,
    )

    src = tmp_path / "docs_split.parquet"
    _write_corpus(spark, src)
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    summary = build_corpus(
        spark, str(src), str(tmp_path / "split"), seed="s1",
        split_weights=weights,
    )  # fmt: skip
    assert summary["split_weights"] == weights
    chunks = spark.read.parquet(summary["chunks_path"])
    assert "split" in chunks.columns
    # exhaustive + doc-level: each doc maps to exactly one split
    per_doc = chunks.select("doc_id", "split").distinct()
    assert per_doc.count() == summary["n_docs_kept"]
    assert (
        sum(summary["n_chunks_per_split"].values()) == summary["n_chunks"]
    )
    # the assignment replays exactly from the gated split operator
    expected = {
        r["doc_id"]: r["split"]
        for r in split_assign(
            chunks.select("doc_id").distinct(), weights, seed="s1:split"
        ).collect()
    }
    got = {r["doc_id"]: r["split"] for r in per_doc.collect()}
    assert got == expected
    spark.catalog.clearCache()


def test_corpus_cli_split_flag(spark, tmp_path, capsys):
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "sp"),
         "--split", "train=0.8,val=0.1,test=0.1"]
    )  # fmt: skip
    assert rc == 0
    s = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(s["n_chunks_per_split"]) <= {"train", "val", "test"}
    assert sum(s["n_chunks_per_split"].values()) == s["n_chunks"]
    # bad spec fails fast with exit code 1
    rc_bad = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "spb"),
         "--split", "train=big"]
    )  # fmt: skip
    assert rc_bad == 1


def test_corpus_report_cli(spark, tmp_path, capsys):
    """corpus-report audits a documents parquet: counts, dup
    accounting, Gopher outcomes, PII, mixes, top trigrams — json+md."""
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs_report.parquet"
    rows = [
        (i, " ".join(f"the item{i}x{j} holds value{i}x{j}" for j in range(15)),
         "en" if i % 2 == 0 else "es", f"src{i % 2}")
        for i in range(5)
    ]
    rows.append((50, rows[0][1], "en", "src0"))        # exact duplicate
    rows.append((51, "contact me at a@b.com now", "en", "src1"))  # PII + short
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(src))

    out = tmp_path / "rep"
    rc = cli.main(["corpus-report", "--input", str(src), "--out", str(out)])
    assert rc == 0
    printed = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    disk = _json.loads((out / "corpus_report.json").read_text())
    assert printed == disk
    assert disk["n_docs"] == 7
    assert disk["exact_dup_docs"] == 1
    assert disk["distinct_fingerprints"] == 6
    assert disk["docs_with_pii"] == 1
    assert disk["gopher_reasons"]["PASS"] == disk["gopher_pass"] == 6
    assert disk["gopher_reasons"]["TOO_FEW_WORDS"] == 1
    assert disk["lang_distribution"] == {"en": 5, "es": 2}
    assert disk["source_distribution"] == {"src0": 4, "src1": 3}
    assert len(disk["top_trigrams"]) == 10
    md = (out / "corpus_report.md").read_text()
    assert "# Corpus report" in md and "TOO_FEW_WORDS" in md


def test_corpus_cli_lsh_guard_flags(spark, tmp_path, capsys):
    """--lsh-est-margin/--lsh-max-bucket reach the near-dedup stage:
    output matches the unguarded build (the guards only prune work,
    not verified pairs, on this corpus) and drop accounting lands in
    the summary."""
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "g"),
         "--near-dedup", "--near-threshold", "0.7",
         "--lsh-est-margin", "0.25", "--lsh-max-bucket", "100000"]
    )  # fmt: skip
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["lsh_est_margin"] == 0.25
    assert summary["lsh_max_bucket"] == 100000
    assert summary["lsh_hot_buckets_dropped"] == 0  # nothing hot here
    assert summary["n_near_dups_removed"] > 0
    base = build_corpus(
        spark, str(src), str(tmp_path / "b"), seed="epoch-0",
        near_dedup=True, near_threshold=0.7,
    )  # fmt: skip
    assert summary["n_near_dups_removed"] == base["n_near_dups_removed"]
    assert summary["n_docs_kept"] == base["n_docs_kept"]
    spark.catalog.clearCache()


def test_corpus_cli_c4_stage(spark, tmp_path, capsys):
    """--c4 cleans line structure FIRST: failing pages drop with
    summary accounting, surviving pages' dropped lines never reach
    the chunker."""
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    good_lines = "\n".join(
        f"the quick brown fox number {i} jumps over the lazy dog today."
        for i in range(6)
    )
    rows = [
        # 8 clean pages (distinct bodies -> survive dedup too)
        *[
            (i, good_lines.replace("today.", f"on day {i}."))
            for i in range(8)
        ],
        # lorem-ipsum page, curly-brace page, blocklist page
        (100, "lorem ipsum dolor sit amet.\n" + good_lines),
        (101, "broken { markup } here.\n" + good_lines),
        (102, "mentions blockedword sadly here.\n" + good_lines),
        # too few sentences after line filters
        (103, "one good line is not enough."),
        # page whose unterminated line is dropped but page survives
        (104, "this line has no terminal punctuation\n" + good_lines),
    ]
    src = tmp_path / "docs.parquet"
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(src))

    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "g"),
         "--c4", "--c4-blocklist", "blockedword"]
    )  # fmt: skip
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["c4"] is True
    assert summary["n_docs_dropped_by_c4"] == 4  # 100-103
    assert summary["n_docs_kept"] == 9  # 8 clean + doc 104
    # without --c4 nothing is dropped structurally
    base = build_corpus(spark, str(src), str(tmp_path / "b"), seed="epoch-0")
    assert base["n_docs_dropped_by_c4"] == 0 and base["c4"] is False

    def _md5s(out_dir, doc):
        df = spark.read.parquet(str(out_dir / "chunks.parquet"))
        return {
            r["chunk_md5"]
            for r in df.filter(F.col("doc_id") == doc).collect()
        }

    # doc 104's unpunctuated line was rewritten away before chunking
    # (different tokens -> different chunk hashes vs the un-cleaned
    # build); doc 0 is untouched by the line filters -> identical
    assert _md5s(tmp_path / "g", 104) != _md5s(tmp_path / "b", 104)
    assert _md5s(tmp_path / "g", 0) == _md5s(tmp_path / "b", 0)
    spark.catalog.clearCache()


def test_corpus_report_bpe_accounting(spark, tmp_path, capsys):
    """--bpe-merges adds subword-token accounting: the merge list and
    the encoded total, consistent with a direct bpe_encode_counts run."""
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli
    from data_lakehouse_movilidad_publica_santiago_spark.operators.bpe import (
        bpe_encode_counts,
        bpe_train,
    )

    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    rc = cli.main(
        ["corpus-report", "--input", str(src), "--out",
         str(tmp_path / "rep"), "--bpe-merges", "3"]
    )  # fmt: skip
    assert rc == 0
    disk = _json.loads((tmp_path / "rep" / "corpus_report.json").read_text())
    assert disk["bpe_merges"] == 3 and len(disk["bpe_merge_list"]) == 3
    docs = spark.read.parquet(str(src))
    _, words = bpe_train(docs, num_merges=3)
    expect = (
        bpe_encode_counts(docs, words)
        .agg(F.sum("n_bpe_tokens").alias("s"))
        .collect()[0]["s"]
    )
    assert disk["bpe_total_tokens"] == int(expect)
    assert "BPE (3 merges)" in (tmp_path / "rep" / "corpus_report.md").read_text()
    spark.catalog.clearCache()


def test_build_corpus_sentence_dedup(spark, tmp_path):
    """--sentence-dedup cuts corpus-repeated sentences, keeps the
    first occurrence (minimal doc_id, pos), and drops docs
    deduplicated to nothing; summary accounts exactly."""
    shared = "It is a fine day in the park with a friend today."
    rows = [
        (
            i,
            f"The document number {i} talks about the topic of it "
            f"with many good words here. " + shared,
        )
        for i in range(20)
    ]
    rows.append((50, shared))  # only a repeat → emptied → dropped
    src = tmp_path / "docs.parquet"
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(src)
    )
    summary = build_corpus(
        spark,
        str(src),
        str(tmp_path / "out"),
        seed="s1",
        quality_min=0.0,
        sentence_dedup=True,
    )
    assert summary["sentence_dedup"] is True
    # the shared sentence survives once (doc 0) — 19 in-doc repeats
    # cut plus doc 50's sole sentence
    assert summary["n_sentences_removed"] == 20
    assert summary["n_docs_emptied_by_sentence_dedup"] == 1
    assert summary["n_docs_kept"] == 20
    spark.catalog.clearCache()


def test_build_corpus_soft_dedup(spark, tmp_path):
    """--soft-dedup-n down-samples the boilerplate-heavy fixture
    (every doc shares the tripled base text → high trigram
    commonness → weights well below 1) deterministically."""
    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    plain = build_corpus(spark, str(src), str(tmp_path / "plain"), seed="s1")
    soft = build_corpus(
        spark, str(src), str(tmp_path / "soft"), seed="s1", soft_dedup_n=3
    )
    assert soft["soft_dedup_n"] == 3
    assert 0.0 < soft["soft_dedup_avg_weight"] < 1.0
    assert soft["n_docs_dropped_by_soft_dedup"] > 0
    assert (
        soft["n_docs_kept"]
        == plain["n_docs_kept"] - soft["n_docs_dropped_by_soft_dedup"]
    )
    # deterministic: same seed reproduces the identical sample
    again = build_corpus(
        spark, str(src), str(tmp_path / "soft2"), seed="s1", soft_dedup_n=3
    )
    assert (
        again["n_docs_dropped_by_soft_dedup"]
        == soft["n_docs_dropped_by_soft_dedup"]
    )
    spark.catalog.clearCache()


def test_corpus_cli_dedup_stage_flags(spark, tmp_path, capsys):
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "o"),
         "--sentence-dedup", "--soft-dedup-n", "3"]
    )  # fmt: skip
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["sentence_dedup"] is True
    assert summary["soft_dedup_n"] == 3
    assert summary["n_docs_dropped_by_soft_dedup"] > 0


def test_build_corpus_containment_mode(spark, tmp_path):
    """--near-dedup-mode containment: the variant docs share the
    tripled base (containment of the shorter in the longer ≈ 1), so
    the asymmetric miner collapses them like the minhash mode does;
    summary records the mode and accounts exactly."""
    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    plain = build_corpus(spark, str(src), str(tmp_path / "plain"), seed="s1")
    near = build_corpus(
        spark,
        str(src),
        str(tmp_path / "cont"),
        seed="s1",
        near_dedup=True,
        near_threshold=0.7,
        near_dedup_mode="containment",
        containment_k=3,
    )
    assert near["near_dedup_mode"] == "containment"
    assert near["containment_k"] == 3
    assert near["n_near_dups_removed"] > 0
    assert (
        near["n_docs_kept"]
        == plain["n_docs_kept"] - near["n_near_dups_removed"]
    )
    chunks = spark.read.parquet(near["chunks_path"])
    assert chunks.select("doc_id").distinct().count() == near["n_docs_kept"]
    spark.catalog.clearCache()


def test_build_corpus_trigram_ppl_model(spark, tmp_path):
    """--ppl-model trigram: the stupid-backoff scorer drives the same
    keep-if-NULL-or-below contract; an out-of-distribution doc is
    dropped while the in-distribution bulk survives."""
    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    tri = build_corpus(
        spark,
        str(src),
        str(tmp_path / "tri"),
        seed="s1",
        ppl_threshold=4.0,
        ppl_model="trigram",
    )
    assert tri["ppl_model"] == "trigram"
    assert tri["n_docs_kept"] > 0
    # the fixture's 35 survivors share one template → low trigram
    # cross-entropy under the self-trained LM → none dropped at 4.0
    assert tri["n_docs_dropped_by_ppl"] == 0
    # determinism across partitionings/seeds of the same input
    again = build_corpus(
        spark,
        str(src),
        str(tmp_path / "tri2"),
        seed="s1",
        ppl_threshold=4.0,
        ppl_model="trigram",
    )
    assert again["n_docs_kept"] == tri["n_docs_kept"]
    spark.catalog.clearCache()


def test_build_corpus_tfidf_selection(spark, tmp_path):
    """--select-query/--select-top-k keeps exactly the K most
    query-relevant survivors (tf-idf cosine), accounted in the
    summary."""
    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    plain = build_corpus(spark, str(src), str(tmp_path / "plain"), seed="s1")
    sel = build_corpus(
        spark,
        str(src),
        str(tmp_path / "sel"),
        seed="s1",
        select_query="variant fox",
        select_top_k=10,
    )
    assert sel["select_query"] == "variant fox"
    assert sel["select_top_k"] == 10
    assert sel["n_docs_kept"] == 10
    assert (
        sel["n_docs_dropped_by_select"]
        == plain["n_docs_kept"] - 10
    )
    chunks = spark.read.parquet(sel["chunks_path"])
    assert chunks.select("doc_id").distinct().count() == 10
    spark.catalog.clearCache()


def test_build_corpus_round8_stage_validation(spark, tmp_path):
    import pytest as _pytest

    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    with _pytest.raises(ValueError, match="near_dedup_mode"):
        build_corpus(
            spark, str(src), str(tmp_path / "x"), near_dedup_mode="nope"
        )
    with _pytest.raises(ValueError, match="ppl_model"):
        build_corpus(spark, str(src), str(tmp_path / "x"), ppl_model="gpt")
    with _pytest.raises(ValueError, match="go together"):
        build_corpus(
            spark, str(src), str(tmp_path / "x"), select_query="fox"
        )


def test_corpus_cli_round8_stage_flags(spark, tmp_path, capsys):
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    src = tmp_path / "docs.parquet"
    _write_corpus(spark, src)
    rc = cli.main(
        ["corpus", "--input", str(src), "--output", str(tmp_path / "o"),
         "--near-dedup", "--near-threshold", "0.7",
         "--near-dedup-mode", "containment", "--containment-k", "3",
         "--ppl-threshold", "4.0", "--ppl-model", "trigram",
         "--select-query", "variant fox", "--select-top-k", "5"]
    )  # fmt: skip
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["near_dedup_mode"] == "containment"
    assert summary["ppl_model"] == "trigram"
    assert summary["select_top_k"] == 5
    # containment at 0.7 collapses the template-sharing variants into
    # ONE component (every doc contains the tripled base), so the
    # top-k selection sees fewer than 5 survivors — the budget is an
    # upper bound, not a quota
    assert summary["n_near_dups_removed"] > 0
    assert 1 <= summary["n_docs_kept"] <= 5
