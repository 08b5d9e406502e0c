"""Corpus-hygiene operators: repetition signals, top-n-gram fraction,
test-set decontamination, sequence packing. Expected values are
hand-computed on tiny fixtures; packing is checked for invariants and
determinism."""

import pytest

from pyspark.sql import functions as F

from getl_spark.functions import text


# ------------------------------------------------------- repetition signals
def test_repetition_signals_dup_lines(spark):
    # 5 non-blank lines: aa, bb, aa, bb, c -> 2 distinct dup'd of 5
    doc = "aa\nbb\naa\nbb\nc"
    df = spark.createDataFrame([(1, doc)], "doc_id BIGINT, text STRING")
    row = text.repetition_signals(df).first()
    # Gopher convention: all 4 occurrences of the duplicated lines count
    assert row.rep_dup_line_frac == pytest.approx(0.8)
    # chars in duplicated lines: aa+aa+bb+bb = 8 of total 9
    assert row.rep_dup_line_char_frac == pytest.approx(round(8 / 9, 4))


def test_repetition_signals_paragraphs_and_blanks(spark):
    # paragraphs split on blank lines; the repeated paragraph spans lines
    doc = "p one\np two\n\np one\np two\n\nunique"
    df = spark.createDataFrame([(1, doc)], "doc_id BIGINT, text STRING")
    row = text.repetition_signals(df).first()
    # paragraphs: "p one\np two" x2, "unique" -> dup frac 2/3
    assert row.rep_dup_para_frac == pytest.approx(round(2 / 3, 4))
    # line-level: every line of the repeated para is duplicated
    assert row.rep_dup_line_frac == pytest.approx(0.8)  # 4 of 5 lines


def test_repetition_signals_clean_doc_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "alpha\nbeta\ngamma"), (2, ""), (3, None)],
        "doc_id BIGINT, text STRING",
    )
    rows = {r.doc_id: r for r in text.repetition_signals(df).collect()}
    assert rows[1].rep_dup_line_frac == 0.0
    assert rows[1].rep_dup_line_char_frac == 0.0
    assert rows[2].rep_dup_line_frac == 0.0
    assert rows[3].rep_dup_para_char_frac is None or (
        rows[3].rep_dup_para_char_frac == 0.0
    )


# ---------------------------------------------------------- top n-gram frac
def test_top_ngram_frac_hand_computed(spark):
    # normalized text: "the cat sat the cat ran" (23 chars)
    # top 2-gram "the cat" (7 chars) occurs twice -> 14/23
    df = spark.createDataFrame(
        [(1, "The cat sat; the cat ran.")], "doc_id BIGINT, text STRING"
    )
    row = text.top_ngram_frac(df, n=2).first()
    assert row.top_2gram_char_frac == pytest.approx(round(14 / 23, 4))


def test_top_ngram_frac_capped_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a a a a a a"), (2, ""), (3, "word")],
        "doc_id BIGINT, text STRING",
    )
    rows = {r.doc_id: r for r in text.top_ngram_frac(df, n=2).collect()}
    assert rows[1].top_2gram_char_frac == 1.0  # overlap-capped
    assert rows[2].top_2gram_char_frac == 0.0  # empty -> no n-grams
    # doc shorter than n: whole-doc gram, frac 4/4 = 1.0
    assert rows[3].top_2gram_char_frac == 1.0


def test_top_ngram_keeps_all_rows_and_columns(spark):
    df = spark.createDataFrame(
        [(1, "x y", "k"), (2, "", "k2")], "doc_id BIGINT, text STRING, extra STRING"
    )
    out = text.top_ngram_frac(df, n=2)
    assert out.count() == 2
    assert set(out.columns) == {"doc_id", "text", "extra", "top_2gram_char_frac"}


# ---------------------------------------------------------- decontamination
@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "completely unrelated text about parquet files and big data engines"),
            (3, "short doc"),
        ],
        "doc_id BIGINT, text STRING",
    )


def test_decontaminate_flags_overlapping_doc(spark, corpus):
    evals = spark.createDataFrame(
        [("Q: the quick brown fox jumps over the lazy dog?",)], "text STRING"
    )
    out = {r.doc_id: r.contaminated for r in text.decontaminate(corpus, evals).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_decontaminate_remove_drops_rows(spark, corpus):
    evals = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text STRING"
    )
    out = text.decontaminate(corpus, evals, remove=True)
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]
    assert "contaminated" not in out.columns


def test_decontaminate_short_eval_matches_short_doc(spark, corpus):
    # eval doc shorter than n -> whole-doc n-gram; matches doc 3 exactly
    evals = spark.createDataFrame([("Short DOC!",)], "text STRING")
    out = {r.doc_id: r.contaminated for r in text.decontaminate(corpus, evals, n=8).collect()}
    assert out == {1: False, 2: False, 3: True}


def test_decontaminate_yaml_two_input_block(spark, tmp_path, corpus):
    """text.decontaminate as a two-input function in transform::generic."""
    from getl_spark import lift

    docs_p, eval_p = str(tmp_path / "docs"), str(tmp_path / "evals")
    corpus.write.parquet(docs_p)
    spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text STRING"
    ).write.parquet(eval_p)

    log = lift(
        spark,
        f"""
LiftJob:
  Docs:
    Type: load::batch_parquet
    Properties: {{Path: {docs_p}}}
  Evals:
    Type: load::batch_parquet
    Properties: {{Path: {eval_p}}}
  Clean:
    Type: transform::generic
    Input: [Docs, Evals]
    Properties:
      Functions:
        - text.decontaminate: {{remove: true}}
""",
    )
    assert sorted(r.doc_id for r in log.get("Clean").collect()) == [2, 3]


def test_decontaminate_normalization_defeats_formatting(spark, corpus):
    evals = spark.createDataFrame(
        [("THE  Quick,   brown FOX jumps over the lazy dog",)], "text STRING"
    )
    out = {r.doc_id: r.contaminated for r in text.decontaminate(corpus, evals).collect()}
    assert out[1] is True


def test_stats_profile_counts(spark):
    from getl_spark.functions import stats

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, None, 5.0), (3, "b", None)],
        "id BIGINT, s STRING, d DOUBLE",
    )
    rows = {r["column"]: r for r in stats.profile(df).collect()}
    assert rows["id"].n_rows == 4 and rows["id"].n_null == 0
    assert rows["id"].n_distinct == 3
    assert rows["s"].n_null == 1 and rows["s"].n_distinct == 2
    assert rows["d"].n_null == 2 and rows["d"].n_distinct == 1
    with pytest.raises(ValueError, match="not in DataFrame"):
        stats.profile(df, columns=["nope"])


def test_corpus_curation_example_pipeline(spark, tmp_path):
    """The examples/corpus_curation.yaml recipe end-to-end at sf0.001."""
    import os

    from getl_spark import lift

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log = lift(
        spark,
        os.path.join(repo, "examples", "corpus_curation.yaml"),
        {
            "source_dir": "/root/testdata/sf0.001",
            "out_dir": str(tmp_path / "curation"),
        },
    )
    n_docs = log.get("LoadDocs").count()
    n_clean = log.get("Decontaminated").count()
    assert 0 < n_clean < n_docs  # eval-overlapping docs were dropped
    packs = log.get("Packs")
    assert {"doc_id", "n_tokens", "pack_id", "pack_pos", "oversize"} <= set(
        packs.columns
    )
    assert (tmp_path / "curation" / "chunks").exists()


# --------------------------------------------------- paragraph dedup / gate
def test_dedup_paragraphs_keeps_first_occurrence(spark):
    doc = "intro para\n\nbody text\n\nintro para\n\nconclusion"
    df = spark.createDataFrame([(1, doc)], "doc_id BIGINT, text STRING")
    out = text.dedup_paragraphs(df).first().text
    assert out == "intro para\n\nbody text\n\nconclusion"


def test_dedup_paragraphs_trim_compare_and_null(spark):
    doc = "para one\n\n  para one  \n\npara two"
    df = spark.createDataFrame(
        [(1, doc), (2, None), (3, "")], "doc_id BIGINT, text STRING"
    )
    rows = {r.doc_id: r.text for r in text.dedup_paragraphs(df).collect()}
    assert rows[1] == "para one\n\npara two"
    assert rows[2] is None
    assert rows[3] == ""


def test_gopher_filter_rules(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and runs far into "
        "the woods where it finds a quiet stream and rests for a while "
        "before returning home to the den with food for the young ones "
        "it is a calm day in the forest and all the animals are busy"
    )
    too_short = "tiny doc"
    no_stopwords = " ".join(f"tok{i}" for i in range(60))
    repetitive = "\n".join(["same line here"] * 40)
    df = spark.createDataFrame(
        [(1, good), (2, too_short), (3, no_stopwords), (4, repetitive), (5, None)],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r.gopher_keep for r in text.gopher_filter(df).collect()}
    assert out == {1: True, 2: False, 3: False, 4: False, 5: False}
    kept = text.gopher_filter(df, remove=True)
    assert [r.doc_id for r in kept.collect()] == [1]
    assert "gopher_keep" not in kept.columns


# -------------------------------------------------------- sequence packing
def _mk_docs(spark, sizes):
    rows = [(i, "w " * t) for i, t in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_pack_sequences_invariants(spark):
    sizes = [100, 900, 300, 700, 650, 350, 200, 50, 1024, 10]
    df = _mk_docs(spark, sizes)
    out = text.pack_sequences(df, max_tokens=1024, buckets=2).collect()
    # every doc appears exactly once
    assert sorted(r.doc_id for r in out) == list(range(len(sizes)))
    # no pack over budget
    fills = {}
    for r in out:
        fills.setdefault(r.pack_id, []).append(r)
    for pack, rows in fills.items():
        assert sum(r.n_tokens for r in rows) <= 1024
        # pack_pos is 0..k-1 within each pack
        assert sorted(r.pack_pos for r in rows) == list(range(len(rows)))
    assert not any(r.oversize for r in out)


def test_pack_sequences_oversize_isolated(spark):
    df = _mk_docs(spark, [5000, 10, 20])
    out = text.pack_sequences(df, max_tokens=1024, buckets=1).collect()
    big = next(r for r in out if r.doc_id == 0)
    assert big.oversize and big.pack_pos == 0
    assert sum(1 for r in out if r.pack_id == big.pack_id) == 1


def test_pack_sequences_deterministic(spark):
    df = _mk_docs(spark, [100, 900, 300, 700, 650, 350])
    a = sorted(map(tuple, text.pack_sequences(df, max_tokens=1000, buckets=3).collect()))
    b = sorted(map(tuple, text.pack_sequences(df, max_tokens=1000, buckets=3).collect()))
    assert a == b


def test_pack_sequences_token_col_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None, 10), (2, "irrelevant", 20)],
        "doc_id BIGINT, text STRING, n_tok BIGINT",
    )
    out = text.pack_sequences(df, token_col="n_tok", max_tokens=64, buckets=1).collect()
    assert {r.doc_id: r.n_tokens for r in out} == {1: 10, 2: 20}


def test_normalize_unicode_nfc_and_control_strip(spark):
    from getl_spark.functions import text as T

    composed = "\u00e9cole"                    # e-acute as one codepoint
    decomposed = "e\u0301cole"                 # e + combining acute
    df = spark.createDataFrame(
        [(0, composed), (1, decomposed), (2, "tab\there\x00bad\x1fxy"), (3, None)],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r.text_nfc for r in T.normalize_unicode(df).collect()}
    assert out[0] == out[1] == composed      # NFC unifies the two forms
    assert out[2] == "tab\therebadxy"        # C0/C1 stripped, tab kept
    assert out[3] is None
    # NFKC additionally folds compatibility chars (fi ligature)
    df2 = spark.createDataFrame([(0, "\ufb01le")], "doc_id BIGINT, text STRING")
    assert T.normalize_unicode(df2, form="NFKC").first().text_nfc == "file"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown form"):
        T.normalize_unicode(df, form="NFX")


def test_normalize_unicode_fixes_dedup_fingerprints(spark):
    """The motivating case: visually identical strings with different
    codepoint sequences must fingerprint identically after NFC."""
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [(0, "\u00e9cole"), (1, "e\u0301cole")], "doc_id BIGINT, text STRING"
    )
    raw = [r.fingerprint for r in T.fingerprint(df).collect()]
    assert raw[0] != raw[1]  # without normalization they differ
    normed = T.normalize_unicode(df).drop("text").withColumnRenamed(
        "text_nfc", "text"
    )
    fixed = [r.fingerprint for r in T.fingerprint(normed).collect()]
    assert fixed[0] == fixed[1]


def test_strip_html_tags_entities_blocks(spark):
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (0, "<html><head><style>p {color: red}</style></head><body>"
                "<p>Hello <b>world</b></p><!-- hidden --><script>if (1 < 2) x();"
                "</script>A &amp; B &lt;ok&gt; &quot;q&quot; &#39;s&#39; &nbsp;end"
                "</body></html>"),
            (1, "no markup at all"),
            (2, "<div class='x'>multi\n  line</div>"),
            (3, None),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r.text_plain for r in T.strip_html(df).collect()}
    assert out[0] == "Hello world A & B <ok> \"q\" 's' end"
    assert out[1] == "no markup at all"
    assert out[2] == "multi line"
    assert out[3] is None


def test_script_id_detects_writing_systems(spark):
    from getl_spark.functions import text as T

    rows = [
        (0, "plain english text with latin letters"),
        (1, "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440 \u043a\u0430\u043a \u0434\u0435\u043b\u0430"),   # russian
        (2, "\u4f60\u597d\u4e16\u754c \u8fd9\u662f\u4e2d\u6587"),                       # chinese
        (3, "\u05e9\u05dc\u05d5\u05dd \u05e2\u05d5\u05dc\u05dd"),                       # hebrew
        (4, "\u0645\u0631\u062d\u0628\u0627 \u0628\u0627\u0644\u0639\u0627\u0644\u0645"),  # arabic
        (5, "12345 67890 !!!"),                                          # no script
        (6, "\u03b3\u03b5\u03b9\u03b1 \u03c3\u03bf\u03c5 \u03ba\u03bf\u03c3\u03bc\u03b5"),  # greek
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r.script_pred for r in T.script_id(df).collect()}
    assert out == {
        0: "latin", 1: "cyrillic", 2: "han", 3: "hebrew",
        4: "arabic", 5: "und", 6: "greek",
    }


def test_script_id_split_cjk_and_new_scripts(spark):
    """Round-13 SCRIPT_RANGES extension: the merged 'cjk' bucket is
    split into han/kana/hangul (ja/ko/zh routing), and Thai + the
    major non-Devanagari Indic scripts are detected instead of
    falling through to 'und'."""
    from getl_spark.functions import text as T

    rows = [
        (0, "你好世界 这是中文"),      # zh: pure han
        (1, "こんにちは せかい"),      # ja: pure kana
        (2, "안녕하세요 세계"),            # ko: hangul
        (3, "สวัสดีโลก"), # thai
        (4, "হ্যালো বিশ্ব"),  # bengali
        (5, "வணக்கம் உலகம்"),  # tamil
        (6, "హలో ప్రపంచం"),  # telugu
        # ja prose: kana majority over han (typical japanese mixes both)
        (7, "日本語のぶんしょうはかながゆうせい"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r.script_pred for r in T.script_id(df).collect()}
    assert out == {
        0: "han", 1: "kana", 2: "hangul", 3: "thai",
        4: "bengali", 5: "tamil", 6: "telugu", 7: "kana",
    }
    assert T.SCRIPT_ALIASES["cjk"] == ("han", "kana", "hangul")


def test_lang_mix_ja_ko_blend_is_mixed(spark):
    """A Japanese-vs-Korean blend is a genuine script mix after the
    CJK split — pre-round-13 it read as pure 'cjk'. Also pins that
    script_mixed uses the UNROUNDED fraction (ADVICE r12)."""
    from getl_spark.functions import text as T

    rows = [
        # 6 kana + 4 hangul chars -> kana main, mix 0.4
        (0, "こんにちはね 안녕하세"),
        (1, "你好世界"),                               # pure han
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {
        r.doc_id: (r.script_main, r.script_mix_frac, r.script_mixed)
        for r in T.lang_mix(df).collect()
    }
    assert got[0][0] == "kana" and abs(got[0][1] - 0.4) < 1e-9 and got[0][2]
    assert got[1] == ("han", 0.0, False)


def test_unigram_logprob_hand_computed(spark):
    """Tiny corpus with a hand-derived distribution: vocabulary =
    words with count >= 2; p(w) = (c+0.5)/(T + 0.5*(V+1))."""
    import math

    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the dog sat"),
            (3, "the zyx"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.unigram_logprob(df, min_count=2).collect()}
    # counts: the=3, sat=2 (vocab); cat/dog/zyx=1 (OOV). T=5, V=2
    denom = 5 + 0.5 * 3
    lp = lambda c: math.log((c + 0.5) / denom)
    exp1 = (lp(3) + lp(0) + lp(2)) / 3
    exp3 = (lp(3) + lp(0)) / 2
    assert out[1].n_tokens == 3
    assert abs(out[1].logprob - exp1) < 1e-9
    assert abs(out[3].logprob - exp3) < 1e-9
    # doc 2 has the same shape as doc 1 (dog vs cat, both OOV)
    assert abs(out[2].logprob - out[1].logprob) < 1e-12


def test_unigram_logprob_separates_gibberish_from_common_text(spark):
    from getl_spark.functions import text as T

    common = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    gibberish = [(100 + i, f"qwx{i}zk jvb{i}qp xxqj{i}") for i in range(3)]
    df = spark.createDataFrame(common + gibberish, "doc_id long, text string")
    out = T.unigram_logprob(df)
    rows = {r.doc_id: r.logprob for r in out.collect()}
    worst_common = min(rows[i] for i in range(20))
    best_gib = max(rows[100 + i] for i in range(3))
    assert best_gib < worst_common  # gibberish scores strictly below


def test_unigram_logprob_normalization_and_empty_docs(spark):
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (1, "The CAT, the cat!"),  # normalizes to 'the cat the cat'
            (2, "the cat the cat"),
            (3, "   "),  # no words → dropped
            (4, None),  # null → dropped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.unigram_logprob(df).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_tokens == out[2].n_tokens == 4
    assert abs(out[1].logprob - out[2].logprob) < 1e-12


def test_unigram_logprob_validation(spark):
    from getl_spark.functions import text as T

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.unigram_logprob(df, min_count=0)
    with pytest.raises(ValueError):
        T.unigram_logprob(df, smoothing=0.0)


def test_unigram_logprob_empty_vocab_degrades_to_zero_not_null(spark):
    """No word repeats min_count times → smoothing-only distribution:
    every token is the OOV bucket with p=1, logprob exactly 0 — NULL
    scores would silently fail downstream quality gates."""
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [(1, "alpha bravo"), (2, "charlie delta")], "doc_id long, text string"
    )
    out = T.unigram_logprob(df, min_count=5).collect()
    assert len(out) == 2
    assert all(r.logprob == 0.0 for r in out)


# ------------------------------------------------- bloom decontamination
def test_bloom_decontaminate_matches_exact_on_real_corpus(spark):
    """Differential vs the exact broadcast-join path on a generated
    corpus with planted contamination: identical flags (the bloom is
    sized so expected false positives over the corpus ≪ 1, and false
    negatives are impossible by construction)."""
    import random

    rng = random.Random(11)
    words = [f"w{i}" for i in range(300)]
    corpus_rows = [
        (i, " ".join(rng.choice(words) for _ in range(40))) for i in range(120)
    ]
    eval_rows = [(1000 + j, corpus_rows[j * 7][1][:80]) for j in range(8)]
    docs = spark.createDataFrame(corpus_rows, "doc_id BIGINT, text STRING")
    evals = spark.createDataFrame(eval_rows, "eval_id BIGINT, text STRING")
    exact = {
        r.doc_id: r.contaminated
        for r in text.decontaminate(docs, evals, n=8).collect()
    }
    bloom = {
        r.doc_id: r.contaminated
        for r in text.bloom_decontaminate(docs, evals, n=8, fp_rate=1e-6).collect()
    }
    assert any(exact.values())  # the plants actually contaminate
    assert bloom == exact


def test_bloom_decontaminate_no_false_negatives_at_loose_fp(spark, corpus):
    """Even with an absurdly loose fp_rate, every truly contaminated
    doc stays flagged — bloom filters cannot produce false negatives."""
    evals = spark.createDataFrame(
        [("Q: the quick brown fox jumps over the lazy dog?",)], "text STRING"
    )
    out = {
        r.doc_id: r.contaminated
        for r in text.bloom_decontaminate(corpus, evals, fp_rate=0.5).collect()
    }
    assert out[1] is True


def test_bloom_decontaminate_empty_eval_flags_nothing(spark, corpus):
    empty = spark.createDataFrame([], "text STRING")
    out = text.bloom_decontaminate(corpus, empty)
    assert [r.contaminated for r in out.collect()] == [False, False, False]
    assert text.bloom_decontaminate(corpus, empty, remove=True).count() == 3


def test_bloom_decontaminate_null_and_empty_docs_pass(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "the quick brown fox jumps over the lazy dog today")],
        "doc_id BIGINT, text STRING",
    )
    evals = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog",)], "text STRING"
    )
    out = {
        r.doc_id: r.contaminated
        for r in text.bloom_decontaminate(docs, evals).collect()
    }
    assert out == {1: False, 2: False, 3: True}


def test_bloom_decontaminate_param_validation_and_overrides(spark, corpus):
    evals = spark.createDataFrame([("short doc",)], "text STRING")
    with pytest.raises(ValueError, match="fp_rate"):
        text.bloom_decontaminate(corpus, evals, fp_rate=0.0)
    out = {
        r.doc_id: r.contaminated
        for r in text.bloom_decontaminate(
            corpus, evals, num_bits=4096, num_hashes=4
        ).collect()
    }
    assert out[3] is True  # short eval → whole-doc gram still matches


def test_bloom_decontaminate_plan_has_no_join_or_shuffle(spark, corpus):
    """The corpus side is pure map work: no join, no exchange — the
    whole point of the bloom path at 100 TB."""
    evals = spark.createDataFrame([("short doc",)], "text STRING")
    out = text.bloom_decontaminate(corpus, evals)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


# ------------------------------------------------------------- c4_clean
def test_c4_clean_line_and_doc_rules(spark):
    """Each C4 rule on a hand-built doc: terminal punctuation, short
    lines, the javascript word rule, lorem-ipsum and curly-brace doc
    drops, and the three-sentence minimum."""
    docs = spark.createDataFrame(
        [
            # 3 good sentences + a short line + an unterminated line +
            # a javascript line -> kept, cleaned to the 3 sentences
            (0, "one two three four five six.\nshort line.\n"
                "this line has no terminal punctuation at all\n"
                "enable javascript to view this page now please.\n"
                "seven eight nine ten eleven twelve!\n"
                "thirteen fourteen fifteen sixteen seventeen?"),
            # only 2 sentences survive -> dropped
            (1, "one two three four five six.\nseven eight nine ten eleven."),
            # lorem ipsum marker -> dropped regardless of lines
            (2, "Lorem Ipsum dolor sit amet consectetur adipiscing elit.\n"
                "one two three four five six.\nseven eight nine ten eleven.\n"
                "twelve thirteen fourteen fifteen sixteen."),
            # curly brace -> dropped
            (3, "function foo() is code. one two three four five six.\n"
                "seven eight nine ten { eleven twelve.\n"
                "thirteen fourteen fifteen sixteen seventeen."),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.c4_clean(docs).collect()}
    assert out[0].c4_keep is True
    assert out[0].c4_text.count("\n") == 2  # exactly the 3 good lines
    assert "javascript" not in out[0].c4_text
    assert "short" not in out[0].c4_text
    assert out[1].c4_keep is False
    assert out[2].c4_keep is False
    assert out[3].c4_keep is False
    assert out[4].c4_keep is False and out[4].c4_text == ""
    # remove=True keeps cleaned text, drops flag and failing rows
    kept = text.c4_clean(docs, remove=True)
    assert [r.doc_id for r in kept.collect()] == [0]
    assert "c4_keep" not in kept.columns
    with pytest.raises(ValueError):
        text.c4_clean(docs, min_words_per_line=0)
    with pytest.raises(ValueError):
        text.c4_clean(docs, min_sentences=0)


def test_c4_clean_no_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b c d e.")], "doc_id long, text string")
    plan = text.c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # the line-filter chain must be computed ONCE per row: deriving
    # keep/n_sentences from the cleaned expression (not the column
    # attribute) inlines three copies of the
    # array_join(filter(transform(split(…)))) chain into the final
    # Project — up to 3× per-row CPU on a full-corpus scan
    assert plan.count("array_join") == 1


# --------------------------------------------------------- ngram_logprob
def test_ngram_logprob_bigram_signal_and_validation(spark):
    """The bigram LM separates fluent word order from a scrambled bag
    of the same words (identical unigram scores by construction);
    hand-checkable micro case + parameter validation + n=1
    delegation."""
    import math

    import pytest

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "cat the on sat mat the"),  # same words as 1, scrambled
        (4, "zq zq"),
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.ngram_logprob(df).collect()}
    assert set(out) == {1, 2, 3, 4}  # empty/null docs dropped
    assert all(out[i].n_tokens == 6 for i in (1, 2, 3))
    # fluent docs outscore the scrambled permutation of the same words
    assert out[1].logprob > out[3].logprob
    assert out[2].logprob > out[3].logprob
    # unigram scores of docs 1 and 3 are identical (same multiset) —
    # only the bigram model tells them apart
    uni = {r.doc_id: r.logprob for r in text.unigram_logprob(df).collect()}
    assert math.isclose(uni[1], uni[3], rel_tol=1e-12)

    # hand-check doc 4 = "zq zq": corpus counts {the:6,cat:3,sat:3,
    # on:3,mat:2,zq:2,rug:1 (cut)} -> T=19, V=6, denom 19+0.5*7=22.5;
    # bigram "zq zq" count 1 < 2 -> backoff. tok1: ln(2.5/22.5);
    # tok2: ln(0.4) + ln(2.5/22.5)
    expect = (math.log(2.5 / 22.5) + math.log(0.4) + math.log(2.5 / 22.5)) / 2
    assert math.isclose(out[4].logprob, expect, rel_tol=1e-9)

    # n=1 delegates to the unigram model exactly
    n1 = {r.doc_id: r.logprob for r in text.ngram_logprob(df, n=1).collect()}
    assert n1 == uni

    with pytest.raises(NotImplementedError, match="n=2"):
        text.ngram_logprob(df, n=3)
    with pytest.raises(ValueError, match="min_count"):
        text.ngram_logprob(df, min_count=0)
    with pytest.raises(ValueError, match="smoothing"):
        text.ngram_logprob(df, smoothing=0.0)
    with pytest.raises(ValueError, match="alpha"):
        text.ngram_logprob(df, alpha=0.0)


# ------------------------------------------------------- logprob_buckets
def test_logprob_buckets_tiers_and_validation(spark):
    """Common-word docs land in the head tier (bucket 0), rare-word
    gibberish in the tail; buckets are near-equal population on a
    tie-free corpus."""
    rows = (
        [(i, "the cat sat on the mat near the door") for i in range(0, 6)]
        + [(i, "the dog ran fast cat door mat") for i in range(6, 12)]
        + [(i, f"zzq{i} xkcd{i} qwrt{i} vbnm{i}") for i in range(12, 18)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.bucket for r in text.logprob_buckets(df, buckets=3).collect()}
    # gibberish docs (all OOV tokens) must all sit in the worst tier
    assert all(out[i] == 2 for i in range(12, 18))
    # the repeated common-word docs score best
    assert all(out[i] == 0 for i in range(0, 6))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        text.logprob_buckets(df, buckets=1)


def test_logprob_buckets_equal_population(spark):
    """On a corpus with distinct scores the tiers split the population
    within one doc of equal thirds."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    counts = dict(
        (r.bucket, r.n)
        for r in text.logprob_buckets(docs, buckets=3)
        .groupBy("bucket").agg(F.count("*").alias("n")).collect()
    )
    total = sum(counts.values())
    assert set(counts) == {0, 1, 2}
    for b in counts.values():
        assert abs(b - total / 3) <= 2


# ---------------------------------------------------------- filter_hosts
def test_filter_hosts_list_and_dataframe(spark):
    import pytest

    df = spark.createDataFrame(
        [
            (1, "https://WWW.Bad.com/x"),
            (2, "http://good.org/y"),
            (3, "https://bad.com:443/z?utm_source=a"),
            (4, None),
            (5, "not a url"),
        ],
        "doc_id long, url string",
    )
    blocked = sorted(
        r.doc_id for r in text.filter_hosts(df, ["bad.com"], mode="block").collect()
    )
    assert blocked == [2, 4, 5]  # both bad.com spellings out, null/unparseable kept
    allowed = sorted(
        r.doc_id
        for r in text.filter_hosts(
            df, ["bad.com"], mode="allow", keep_null=False
        ).collect()
    )
    assert allowed == [1, 3]
    # DataFrame-shaped host set: broadcast anti join path
    hosts = spark.createDataFrame([("WWW.bad.com",)], "host string")
    blocked2 = sorted(
        r.doc_id for r in text.filter_hosts(df, hosts, mode="block").collect()
    )
    assert blocked2 == [2, 4, 5]
    assert "url" in text.filter_hosts(df, ["bad.com"]).columns
    with pytest.raises(ValueError):
        text.filter_hosts(df, ["x"], mode="maybe")
    with pytest.raises(ValueError):
        text.filter_hosts(df, [])


def test_c4_clean_line_invariants_property(spark):
    """Property: every surviving line ends in terminal punctuation,
    meets the word minimum, and contains no blocked word — on randomly
    assembled multi-line documents."""
    import random

    rng = random.Random(99)
    vocab = ["alpha", "beta", "gamma", "javascript", "delta", "x"]
    docs = []
    for i in range(40):
        lines = []
        for _ in range(rng.randrange(1, 8)):
            words = [rng.choice(vocab) for _ in range(rng.randrange(1, 9))]
            line = " ".join(words) + rng.choice([".", "!", "?", "", " etc"])
            lines.append(line)
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = text.c4_clean(df, min_words_per_line=3).collect()
    import re as _re

    for r in out:
        for line in (r.c4_text or "").split("\n"):
            if not line:
                continue
            assert _re.search(r'[.!?"]$', line), line
            assert len(line.split()) >= 3, line
            assert "javascript" not in line.lower(), line


# ------------------------------------------------------------ readability
def test_readability_hand_case_and_edges(spark):
    """Hand-computed Flesch/FK on a 2-sentence doc; empty/null docs are
    dropped; sentence floor of 1 for unpunctuated text."""
    import math

    rows = [
        (1, "The cat sat. The dog ran away!"),
        (2, "word " * 4),          # no terminal punctuation
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.readability(df).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    # words: the cat sat the dog ran away (7); sentences: 2 runs;
    # syllables: all monosyllabic but "away" (a-ay -> 2) = 8
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (7, 2, 8)
    wps, spw = 7 / 2, 8 / 7
    assert math.isclose(r1.flesch, round(206.835 - 1.015 * wps - 84.6 * spw, 4))
    assert math.isclose(r1.fk_grade, round(0.39 * wps + 11.8 * spw - 15.59, 4))
    assert out[2].n_sentences == 1  # floored


# ------------------------------------------------------------- pii_report
def test_pii_report_counts_and_flag(spark):
    rows = [
        (1, "mail me at a.b@example.com or c@d.org, site https://x.io/a"),
        (2, "call +1 (555) 123-4567 from 10.0.0.1 please"),
        (3, "clean prose with no contact details at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.pii_report(df).collect()}
    assert (out[1].pii_emails, out[1].pii_urls) == (2, 1)
    assert out[2].pii_phones == 1 and out[2].pii_ips == 1
    assert out[1].has_pii and out[2].has_pii
    assert not out[3].has_pii and not out[4].has_pii
    # audit matches the redactor: scrubbed text reports zero
    # email/url/phone hits (the patterns are shared)
    scrubbed = text.pii_report(text.scrub(df), text_col="text_scrubbed")
    for r in scrubbed.collect():
        assert r.pii_emails == 0 and r.pii_urls == 0 and r.pii_phones == 0


# ------------------------------------------------------------ dedup_lines
def test_dedup_lines_keeps_first_occurrence_in_order(spark):
    rows = [
        (1, "nav bar\nreal content A\nnav bar\nreal content B\nnav bar"),
        (2, "a\nb\nc"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.dedup_lines(df).collect()}
    assert out[1].text_deduped == "nav bar\nreal content A\nreal content B"
    assert out[1].n_lines_removed == 2
    assert out[2].text_deduped == "a\nb\nc" and out[2].n_lines_removed == 0
    assert out[3].text_deduped is None and out[3].n_lines_removed == 0


def test_readability_yaml_block(spark, tmp_path):
    """New function ops resolve through the YAML transform::generic
    chain with zero registration (module.function lookup)."""
    from getl_spark import lift

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "The cat sat. The dog ran away!")], "doc_id long, text string"
    ).write.parquet(p)
    log = lift(
        spark,
        f"""
LiftJob:
  Docs:
    Type: load::batch_parquet
    Properties: {{Path: {p}}}
  Scored:
    Type: transform::generic
    Input: Docs
    Properties:
      Functions:
        - text.readability: {{}}
""",
    )
    row = log.get("Scored").first()
    assert row.n_words == 7 and row.n_sentences == 2


def test_char_entropy_matches_counter(spark):
    """Scan-fused entropy equals the Counter formula; empty/null -> 0;
    repetitive text scores below diverse text."""
    import math
    from collections import Counter

    from getl_spark.functions import text

    samples = ["aaaa", "abab", "The quick brown fox.", "", "aab", "zzzzzzy"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)] + [(99, None)],
        "id INT, text STRING",
    )
    out = {r["id"]: r["char_entropy"] for r in text.char_entropy(df).collect()}

    def ent(s):
        c = Counter(s)
        n = len(s)
        return round(-sum(v / n * math.log2(v / n) for v in c.values()), 4) if n else 0.0

    for i, s in enumerate(samples):
        assert out[i] == pytest.approx(ent(s)), (i, s)
    assert out[99] == 0.0
    assert out[0] < out[1] < out[2]  # monotone with diversity


def test_char_entropy_plan_is_shuffle_free(spark):
    from getl_spark.functions import text

    df = spark.createDataFrame([(1, "abc")], "id INT, text STRING")
    plan = text.char_entropy(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_collocations_pmi_hand_check(spark):
    """PMI ranking equals the exhaustive bigram computation; the
    min_count floor removes hapax noise; tiebreak is deterministic."""
    import math
    from collections import Counter

    from getl_spark.functions import text

    docs = spark.createDataFrame(
        [
            (
                i,
                "alpha beta " * 5
                + "gamma delta " * 3
                + "alpha delta noise%d x" % i,
            )
            for i in range(20)
        ],
        "doc_id INT, text STRING",
    )
    rows = text.collocations(docs, min_count=5, top_k=10).collect()

    pairs = []
    for i in range(20):
        t = (
            "alpha beta " * 5 + "gamma delta " * 3 + "alpha delta noise%d x" % i
        ).lower().split()
        pairs += list(zip(t, t[1:]))
    pc = Counter(pairs)
    la = Counter(a for a, _ in pairs)
    rb = Counter(b for _, b in pairs)
    T = len(pairs)
    want = sorted(
        (
            (round(math.log(c * T / (la[a] * rb[b])), 6), a, b, c)
            for (a, b), c in pc.items()
            if c >= 5
        ),
        key=lambda x: (-x[0], x[1], x[2]),
    )
    got = [(r["pmi"], r["token_a"], r["token_b"], r["pair_count"]) for r in rows]
    assert got == want[: len(got)]
    # hapax pairs (noise<i> x) never appear despite maximal PMI
    assert not any(a.startswith("noise") for _, a, _, _ in got)
    import pytest

    with pytest.raises(ValueError, match="min_count"):
        text.collocations(docs, min_count=0)
    with pytest.raises(ValueError, match="top_k"):
        text.collocations(docs, top_k=0)


# -------------------------------------------------------- template dedup
def test_template_key_masks_slots(spark):
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (1, "Order #8812 shipped to bob@example.com on 2024-01-05"),
            (2, "Order #41 shipped to alice@test.org on 2023-12-31"),
            (3, "ORDER   #7  shipped to x@y.io\n on 1999-01-01"),
            (4, "Totally different content, see https://a.example/x?id=77"),
            (5, "Totally different content, see http://b.example/y?id=9001"),
            (6, "unique document with no slots at all"),
        ],
        "doc_id LONG, text STRING",
    )
    keys = {r.doc_id: r.template_key for r in T.template_key(df).collect()}
    assert keys[1] == keys[2] == keys[3]
    assert keys[4] == keys[5]
    assert len({keys[1], keys[4], keys[6]}) == 3


def test_by_template_lowest_id_survives(spark):
    from getl_spark.functions import dedup as D

    df = spark.createDataFrame(
        [
            (9, "Invoice 99 for user 12"),
            (2, "Invoice 1 for user 3"),
            (5, "a distinct doc"),
        ],
        "doc_id LONG, text STRING",
    )
    out = D.by_template(df)
    assert {r.doc_id for r in out.collect()} == {2, 5}
    assert out.columns == ["doc_id", "text"]


def test_code_blocks_extracts_fences(spark):
    """Fences extract with CommonMark info strings; single backticks
    inside code survive; inline fences are info-only; unclosed
    trailing fences drop; prose-only docs emit nothing."""
    from getl_spark.functions import text as T

    md1 = (
        "intro\n```python\na = `1`\nb = 2\n```\nmiddle\n"
        "```\nplain\n```\ntail ```inline``` done\n```unclosed\nnope"
    )
    df = spark.createDataFrame(
        [(1, md1), (2, "no code here at all")], "doc_id long, text string"
    )
    rows = sorted(
        (r.id, r.block_idx, r.lang, r.code)
        for r in T.code_blocks(df).collect()
    )
    assert rows == [
        (1, 0, "python", "a = `1`\nb = 2\n"),
        (1, 1, "", "plain\n"),
        (1, 2, "inline", ""),
    ]


def test_sentences_rule_and_indexing(spark):
    """Maximal punctuation-cluster rule: ellipses stay whole, trailing
    fragments kept, indexes contiguous after empty-drop, no-punct doc
    is one sentence, empty doc emits nothing."""
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (1, "One two. Three four! Is five? yes... trailing frag"),
            (2, "no punctuation at all"),
            (3, ""),
            (4, "..."),   # punctuation only: no sentence content
        ],
        "doc_id long, text string",
    )
    rows = sorted((r.id, r.sent_idx, r.sentence) for r in T.sentences(df).collect())
    assert rows == [
        (1, 0, "One two."),
        (1, 1, "Three four!"),
        (1, 2, "Is five?"),
        (1, 3, "yes..."),
        (1, 4, "trailing frag"),
        (2, 0, "no punctuation at all"),
    ]


# ------------------------------------------------------------ bpe counts
def _bpe_sequential_reference(text, merges, byte_map):
    """Independent replay: apply merges one at a time IN RANK ORDER,
    exhaustively per rank (the HuggingFace-style formulation) — for a
    rank-prioritized table this is equivalent to the min-pair loop the
    operator uses, so any divergence flags a bug in either."""
    import re as _re

    from getl_spark.functions.text import _BPE_PRETOKEN_RE

    total = 0
    for m in _BPE_PRETOKEN_RE.finditer(text):
        pre = m.group(0)
        word = (
            [byte_map[b] for b in pre.encode("utf-8")]
            if byte_map
            else list(pre)
        )
        for a, b in merges:
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        total += len(word)
    return total


def test_bpe_token_count_pinned_vocab(spark):
    """Char-level mini-vocab, hand-checkable: 'll'+'he'+'hell'+'hello'
    chain; counts match the pure-python encoder AND the independent
    sequential-replay reference."""
    from getl_spark.functions import text as T

    merges = [("l", "l"), ("h", "e"), ("he", "ll"), ("hell", "o")]
    docs = [
        (0, "hello hello"),   # 'hello' -> 1; ' hello' -> ' ' + 'hello' = 2
        (1, "hell he"),        # 'hell' -> 1; ' he' -> ' ' + 'he' = 2
        (2, "llama"),          # ll,a,m,a = 4
        (3, ""),               # empty -> 0
        (4, None),             # NULL -> NULL
    ]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    out = {
        r.doc_id: r.bpe_token_count
        for r in T.bpe_token_count(
            df, merges, byte_level=False
        ).collect()
    }
    assert out[0] == 3 and out[1] == 3
    assert out[2] == 4
    assert out[3] == 0
    assert out[4] is None
    for i, t in docs[:4]:
        want = T.bpe_encode_count(t, {(a, b): r for r, (a, b) in enumerate(merges)}, None)
        assert out[i] == want == _bpe_sequential_reference(t, merges, None)


def test_bpe_token_count_byte_level_and_utf8(spark):
    """Byte-level mode: the GPT-2 byte map is a bijection over 256
    bytes; multi-byte UTF-8 counts bytes (no merges -> one token per
    byte per pretoken), and an ASCII merge table works verbatim."""
    from getl_spark.functions import text as T

    bm = T._bytes_to_unicode()
    assert len(bm) == 256 and len(set(bm.values())) == 256

    df = spark.createDataFrame(
        [(0, "aa bb"), (1, "é")], "doc_id INT, text STRING"
    )
    # 'a'+'a' merge, byte level; é is 2 UTF-8 bytes, unmerged
    out = {
        r.doc_id: r.bpe_token_count
        for r in T.bpe_token_count(df, [("a", "a")]).collect()
    }
    assert out[0] == 1 + 3  # 'aa' -> 1; ' bb' -> ' ','b','b'
    assert out[1] == 2


def test_bpe_pretokenizer_keeps_underscores(spark):
    """Regression: Python's \\w contains '_' (GPT-2's \\p classes do
    not), so a bare [^\\s\\w] punctuation branch silently DROPPED
    underscores from every pre-token — 'snake_case_name' lost both
    '_'s and bpe_token_count undercounted on exactly the code corpora
    the docstring advertises. Pins the pre-token split against the
    public GPT-2 convention (underscore is punctuation: it splits
    letter runs and fuses with adjacent punctuation) and byte-exact
    counts under an empty merge table."""
    from getl_spark.functions import text as T

    def pretokens(s):
        return [m.group(0) for m in T._BPE_PRETOKEN_RE.finditer(s)]

    # the ADVICE repro: underscores must survive as their own pre-tokens
    assert pretokens("snake_case_name") == ["snake", "_", "case", "_", "name"]
    # code text: '_' fuses into adjacent punctuation runs like GPT-2's
    # [^\s\p{L}\p{N}]+ class does
    assert pretokens("self._x = __init__") == [
        "self", "._", "x", " =", " __", "init", "__",
    ]
    # concatenation of pre-tokens must reproduce the input (nothing dropped)
    for s in ("snake_case_name", "a __b__ c", "_ _ __", "x_1_y"):
        assert "".join(pretokens(s)) == s, s

    # byte-level count with a never-firing merge table == UTF-8 byte
    # length (15 for snake_case_name; the buggy regex returned 13)
    df = spark.createDataFrame(
        [(0, "snake_case_name"), (1, "__main__")], "doc_id INT, text STRING"
    )
    out = {
        r.doc_id: r.bpe_token_count
        for r in T.bpe_token_count(df, [("q", "q")]).collect()
    }
    assert out[0] == 15
    assert out[1] == 8


def test_bpe_token_count_differential_random(spark):
    """Random small-vocab differential: Spark UDF vs the pure-python
    encoder vs the sequential replay, over generated corpora."""
    import random

    from getl_spark.functions import text as T

    rng = random.Random(7)
    alphabet = "abcd"
    # random-but-valid merge chain: products of earlier symbols
    symbols = list(alphabet)
    merges = []
    for _ in range(12):
        a, b = rng.choice(symbols), rng.choice(symbols)
        if (a, b) in merges:
            continue
        merges.append((a, b))
        symbols.append(a + b)
    ranks = {p: i for i, p in enumerate(merges)}
    docs = [
        (i, " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(1, 8))
        ))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    got = {
        r.doc_id: r.bpe_token_count
        for r in T.bpe_token_count(df, merges, byte_level=False).collect()
    }
    for i, t in docs:
        assert got[i] == T.bpe_encode_count(t, ranks, None), (i, t)
        assert got[i] == _bpe_sequential_reference(t, merges, None), (i, t)


def test_bpe_token_count_feeds_token_budget_mix(spark):
    """The documented hand-off: budget in BPE tokens via token_col."""
    from getl_spark.functions import sample, text as T

    df = spark.createDataFrame(
        [(i, "web", "hello hello hello") for i in range(10)],
        "doc_id INT, source STRING, text STRING",
    )
    counted = T.bpe_token_count(
        df, [("l", "l"), ("h", "e"), ("he", "ll"), ("hell", "o")],
        byte_level=False,
    )
    # each doc = 5 bpe tokens ('hello' + 2x ' hello'); budget 12 ->
    # exactly 2 docs survive (10 fits, 15 would overshoot)
    out = sample.token_budget_mix(
        counted, "source", {"web": 12}, ["doc_id"],
        token_col="bpe_token_count",
    )
    assert out.count() == 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="merges"):
        T.bpe_token_count(df, [], byte_level=False)


def test_pack_stats_hand_computed(spark):
    """pack_stats over a hand-built packed frame: every scalar and the
    decile histogram check against pencil-and-paper values."""
    from getl_spark.functions import text as T

    # max=100. pack A: 2 docs fill 90 (util .9 -> h9); pack B: 1 doc
    # fill 45 (util .45 -> h4); pack C: oversize single 130 (capped
    # util 1.0 -> h9, truncated 30); pack D: 3 docs fill 100 (full).
    rows = [
        (1, 50, "A", 0, False),
        (2, 40, "A", 1, False),
        (3, 45, "B", 0, False),
        (4, 130, "C", 0, True),
        (5, 40, "D", 0, False),
        (6, 35, "D", 1, False),
        (7, 25, "D", 2, False),
    ]
    packed = spark.createDataFrame(
        rows, "doc_id INT, n_tokens LONG, pack_id STRING, pack_pos INT, oversize BOOLEAN"
    )
    r = T.pack_stats(packed, max_tokens=100).collect()[0]
    assert (r.n_docs, r.n_packs, r.oversize_docs) == (7, 4, 1)
    assert r.truncated_tokens == 30
    assert r.truncation_rate == pytest.approx(1 / 7, abs=1e-6)
    # used = 90 + 45 + 100 + 100 = 335 over 4*100
    assert r.utilization == pytest.approx(0.8375)
    assert (r.multi_doc_packs, r.crossdoc_docs) == (2, 5)
    hist = [r[f"util_h{i}"] for i in range(10)]
    assert hist == [0, 0, 0, 0, 1, 0, 0, 0, 0, 3]

    with pytest.raises(ValueError, match="max_tokens"):
        T.pack_stats(packed, max_tokens=0)


def test_pack_stats_composes_with_pack_sequences(spark):
    """End-to-end: pack a fixed distribution, grade it — totals must
    reconcile with the packing output itself."""
    from getl_spark.functions import text as T
    from pyspark.sql import functions as F

    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(700)) + 1).alias("n_tok"),
    )
    packed = T.pack_sequences(docs, token_col="n_tok", max_tokens=512, buckets=4)
    r = T.pack_stats(packed, max_tokens=512).collect()[0]
    assert r.n_docs == 200
    assert r.n_packs == packed.select("pack_id").distinct().count()
    over = packed.where("oversize").count()
    assert r.oversize_docs == over and over > 0
    assert 0 < r.utilization <= 1.0
    assert sum(r[f"util_h{i}"] for i in range(10)) == r.n_packs


def _bpe_train_naive(word_count_pairs, num_merges, min_pair_count=2):
    """Independent reference: full pair recount every round (no
    incremental index), same tie-break. O(merges x vocab) - test-sized
    only."""
    from collections import Counter

    vocab = [(list(w), c) for w, c in word_count_pairs if len(w) >= 2]
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for word, c in vocab:
            for i in range(len(word) - 1):
                pc[(word[i], word[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_pair_count:
            break
        merges.append(best)
        nv = []
        for word, c in vocab:
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == best[0] and word[i + 1] == best[1]:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            nv.append((out, c))
        vocab = nv
    return merges


def test_bpe_train_matches_naive_reference(spark):
    """Incremental pair-index training == full-recount reference on a
    random corpus (char-level for readability)."""
    import random
    from collections import Counter

    from getl_spark.functions import text as T
    from getl_spark.functions.text import _BPE_PRETOKEN_RE

    rng = random.Random(11)
    docs = [
        (i, " ".join(
            "".join(rng.choice("abcde") for _ in range(rng.randint(2, 9)))
            for _ in range(rng.randint(2, 10))
        ))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    got = T.bpe_train(df, num_merges=15, byte_level=False)
    wc = Counter()
    for _, t in docs:
        for m in _BPE_PRETOKEN_RE.finditer(t):
            wc[m.group(0)] += 1
    want = _bpe_train_naive(sorted(wc.items()), 15)
    assert got == want
    assert len(got) == 15


def test_bpe_train_first_merge_is_most_frequent_pair(spark):
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [(0, "aaab aaab aaab cd")], "doc_id INT, text STRING"
    )
    merges = T.bpe_train(df, num_merges=3, byte_level=False)
    # 'aa' appears 2x per 'aaab' (adjacent positions) = 6; rest <= 3
    assert merges[0] == ("a", "a")
    # 'cd' pair appears once -> below min_pair_count, never merged
    assert ("c", "d") not in merges


def test_bpe_train_roundtrip_reduces_counts(spark):
    """Trained merges fed to bpe_token_count reduce token counts vs an
    unmergeable table, and the full chain stays consistent."""
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(5)],
        "doc_id INT, text STRING",
    )
    merges = T.bpe_train(df, num_merges=20)
    assert merges  # learned something
    trained = T.bpe_token_count(df, merges, new_col="n_trained")
    baseline = T.bpe_token_count(df, [(" ", "")], new_col="n_base")
    j = trained.join(baseline.select("doc_id", "n_base"), "doc_id")
    rows = j.collect()
    assert all(r.n_trained < r.n_base for r in rows)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="num_merges"):
        T.bpe_train(df, num_merges=0)
    with _pytest.raises(ValueError, match="max_word_types"):
        T.bpe_train(df, max_word_types=2)


def test_host_mix_shares_and_null_bucket(spark):
    """host_mix: counts, global shares, www-stripping, NULL-host
    bucket, top_k cut keeps shares global."""
    from getl_spark.functions import text as T

    rows = [
        (0, "https://www.a.com/x", 10),
        (1, "https://a.com/y", 20),
        (2, "http://B.com/z", 30),
        (3, "not a url", 40),
        (4, None, 50),
        (5, "https://c.org/q", 60),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, url STRING, n INT")
    out = T.host_mix(df, weight_col="n", top_k=10).collect()
    by = {r.host: r for r in out}
    assert by["a.com"].docs == 2 and by["a.com"].weight == 30.0
    assert by["b.com"].docs == 1
    assert by["a.com"].doc_share == pytest.approx(2 / 6, abs=1e-6)
    assert by["a.com"].weight_share == pytest.approx(30 / 210, abs=1e-6)
    # unparseable + NULL urls fold into the NULL bucket
    assert by[None].docs == 2 and by[None].weight == 90.0

    # top_k cut: shares still against the WHOLE corpus
    top1 = T.host_mix(df, weight_col="n", top_k=1).collect()
    assert len(top1) == 1
    assert top1[0].host in ("a.com", None)  # docs=2 tie -> host asc, nulls last
    assert top1[0].host == "a.com"
    assert top1[0].doc_share == pytest.approx(2 / 6, abs=1e-6)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_k"):
        T.host_mix(df, top_k=0)


def test_host_mix_without_weight(spark):
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [(i, f"https://h{i % 3}.org/p") for i in range(9)],
        "doc_id INT, url STRING",
    )
    out = T.host_mix(df)
    assert out.columns == ["host", "docs", "doc_share"]
    rows = out.collect()
    assert all(r.docs == 3 for r in rows)
    assert sum(r.doc_share for r in rows) == pytest.approx(1.0, abs=1e-5)


def test_contamination_report(spark):
    """Fraction graded per doc: a verbatim benchmark copy ~1.0, a
    one-sentence quoter small, a clean doc 0; denominator is DISTINCT
    grams; agrees exactly with decontaminate's boolean; too-short
    docs NULL fraction."""
    from getl_spark.functions import text

    bench = "the quick brown fox jumps over the lazy dog tonight"
    evals = spark.createDataFrame([(bench,)], "text STRING")

    filler = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, bench),                       # verbatim copy
            (2, filler + " " + bench),        # quoter: partial taint
            (3, filler),                      # clean
            (4, "too short"),                 # < n words: 0 grams... (whole-doc gram)
            (5, bench + " " + bench),         # repeated copy: distinct grams
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r.doc_id: r
        for r in text.contamination_report(docs, evals, n=8).collect()
    }
    assert out[1].taint_fraction == 1.0
    assert 0 < out[2].taint_fraction < 0.2
    assert out[3].taint_fraction == 0.0 and out[3].n_tainted == 0
    # doc 4: shorter than n -> one whole-document gram, not in evals
    assert out[4].n_grams == 1 and out[4].taint_fraction == 0.0
    # doc 5: repetition doesn't change the distinct denominator much;
    # every gram inside the doubled benchmark that also occurs in the
    # single benchmark is tainted
    assert out[5].n_tainted == out[1].n_grams
    assert out[5].n_grams > out[1].n_grams  # seam grams are new

    # agreement with the boolean
    flags = {
        r.doc_id: r.contaminated
        for r in text.decontaminate(docs, evals, n=8)
        .select("doc_id", "contaminated")
        .collect()
    }
    for d, r in out.items():
        assert flags[d] == ((r.taint_fraction or 0.0) > 0)

    # python differential on the counts for the quoter
    def grams(s, n=8):
        import re as _re
        t = _re.sub(r"[ \n]+", " ", _re.sub(r"[^a-z0-9 \n]", " ", s.lower())).strip()
        w = t.split(" ")
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    eg = grams(bench)
    for d, s in [(1, bench), (2, filler + " " + bench), (5, bench + " " + bench)]:
        g = grams(s)
        assert out[d].n_grams == len(g)
        assert out[d].n_tainted == len(g & eg)


# ------------------------------------------------------------ extract_links
def test_extract_links_hand_cases(spark):
    """URL boundaries, trailing-punctuation strip, inner punctuation
    kept, host minus userinfo/port/www, multi-link ordering, NULL and
    linkless docs emit nothing."""
    from getl_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (0, "see https://example.org/a. and http://www.Foo.COM:8080/b?q=1,2 end"),
            (1, "paren (https://x.y.z/p_(1)) and <https://u:p@host.net/q;v=2>"),
            (2, "no links here"),
            (3, None),
            (4, "bare https://single.io"),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.link_idx, r.url, r.host)
        for r in T.extract_links(docs).collect()
    )
    assert rows == [
        (0, 0, "https://example.org/a", "example.org"),
        (0, 1, "http://www.Foo.COM:8080/b?q=1,2", "foo.com"),
        (1, 0, "https://x.y.z/p_(1", "x.y.z"),
        (1, 1, "https://u:p@host.net/q;v=2", "host.net"),
        (4, 0, "https://single.io", "single.io"),
    ]
    # with_host=False drops the column
    cols = T.extract_links(docs, with_host=False).columns
    assert cols == ["doc_id", "link_idx", "url"]

    # plan is scan-side: no exchange
    plan = (
        T.extract_links(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_lang_mix_fractions(spark):
    """Script-mixing measurement: pure text scores 0, a half-and-half
    doc crosses the threshold, scriptless text is NULL evidence."""
    from getl_spark.functions import text as T

    rows = [
        (1, "pure latin text here"),
        (2, "latin text с небольшой кириллицей внутри да"),
        (3, "3.14159 + 2 = ???"),
        (4, None),
        (5, "tiny мир"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r.doc_id: (r.script_main, r.script_mix_frac, r.script_mixed)
        for r in T.lang_mix(df).collect()
    }
    assert got[1] == ("latin", 0.0, False)
    main2, frac2, mixed2 = got[2]
    assert main2 == "cyrillic" and 0 < frac2 < 0.5 and mixed2
    assert got[3] == ("und", None, None)
    assert got[4] == (None, None, None)
    # 'tiny мир': latin 4 vs cyrillic 3 -> latin main, 3/7 mixed
    assert got[5][0] == "latin" and abs(got[5][1] - 3 / 7) < 1e-6
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mixed_threshold"):
        T.lang_mix(df, mixed_threshold=1.0)
