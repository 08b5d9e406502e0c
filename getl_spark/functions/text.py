"""Text-analysis transform functions for large-scale corpus pipelines.

All hot-path computation uses built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs — so these run at scan speed on a
100 TB corpus: one narrow projection per document, no shuffles except
where an aggregation is explicitly requested.

YAML-callable as ``text.<name>`` inside ``transform::generic``.
"""

from __future__ import annotations

import re

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from getl_spark.common.scale import pin

# Minimal per-language stopword sets for the language-ID heuristic.
# Public-knowledge common words; extend freely.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
    "sv": ["och", "att", "det", "som", "en", "av", "är", "för", "med", "på"],
}


def tokens(df: DataFrame, text_col: str = "text", new_col: str = "tokens") -> DataFrame:
    """Whitespace tokenization into an array column."""
    return df.withColumn(new_col, F.split(F.col(text_col), r"\s+"))


def quality(df: DataFrame, text_col: str = "text", prefix: str = "q_") -> DataFrame:
    """Quality-scoring signals: length, word count, mean word length,
    stopword ratio (English set), punctuation and digit ratios —
    standard corpus-filtering features (C4/Gopher-style rules)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    words = F.split(text, r"\s+")
    n_words = F.size(words)
    stop_hits = F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    distinct_words = F.size(F.array_distinct(words))
    return (
        df.withColumn(f"{prefix}n_chars", n_chars)
        .withColumn(f"{prefix}n_words", n_words)
        .withColumn(
            f"{prefix}avg_word_len",
            F.round((n_chars - (n_words - F.lit(1))) / n_words.cast("double"), 4),
        )
        .withColumn(
            f"{prefix}stopword_ratio",
            F.round(stop_hits / distinct_words.cast("double"), 4),
        )
        .withColumn(
            f"{prefix}digit_ratio",
            F.round(
                (n_chars - F.length(F.regexp_replace(text, r"[0-9]", "")))
                / n_chars.cast("double"),
                4,
            ),
        )
    )


def token_count(
    df: DataFrame, text_col: str = "text", new_col: str = "n_tokens"
) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish upper-bound
    estimate (``ceil(n_chars / 4)`` — the familiar ~4-chars/token
    rule) without running a real tokenizer."""
    return df.withColumn(new_col, F.size(F.split(F.col(text_col), r"\s+"))).withColumn(
        f"{new_col}_bpe_est", F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("bigint")
    )


def lang_id(
    df: DataFrame,
    text_col: str = "text",
    new_col: str = "lang_pred",
    languages: Optional[List[str]] = None,
) -> DataFrame:
    """Heuristic language ID: argmax over per-language stopword hit
    counts on the document's distinct tokens; ties break on language
    code order; 'und' (undetermined) when no stopwords hit at all.

    Pure JVM expressions: one ``array_intersect`` per language — no
    shuffle, no UDF. For a real pipeline swap in fastText/CLD3 behind
    the same column contract.
    """
    langs = languages or sorted(STOPWORDS)
    words = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    scores = [
        (
            lang,
            F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))),
        )
        for lang in langs
    ]
    best_score = F.greatest(*[s for _, s in scores]) if len(scores) > 1 else scores[0][1]
    result = F.lit("und")
    # first language (in sorted order) achieving the max wins
    for lang, score in reversed(scores):
        result = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(
            result
        )
    return df.withColumn(new_col, result)


def normalize(
    df: DataFrame, text_col: str = "text", new_col: str = "text_norm"
) -> DataFrame:
    """Canonical text normalization: lowercase, strip non-alphanumerics
    (keeping spaces), collapse whitespace, trim. The usual precursor to
    shingling/fingerprinting so trivial formatting differences don't
    defeat dedup."""
    text = F.lower(F.col(text_col))
    text = F.regexp_replace(text, r"[^a-z0-9 ]", " ")
    text = F.regexp_replace(text, r" +", " ")
    return df.withColumn(new_col, F.trim(text))


def scrub(
    df: DataFrame, text_col: str = "text", new_col: str = "text_scrubbed"
) -> DataFrame:
    """Redact emails, URLs, and long digit runs (phone/ID-like) —
    baseline PII/noise scrubbing for training corpora. Patterns are
    deliberately regex-dialect-portable (plain character classes, no
    lookaround) so the same expressions run in Spark and DuckDB."""
    text = F.col(text_col)
    text = F.regexp_replace(text, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]+", "<EMAIL>")
    text = F.regexp_replace(text, r"https?://[^ ]+", "<URL>")
    text = F.regexp_replace(text, r"[0-9][0-9 ()+.-]{7,}[0-9]", "<NUMBER>")
    return df.withColumn(new_col, text)


def pii_report(
    df: DataFrame,
    text_col: str = "text",
    prefix: str = "pii_",
) -> DataFrame:
    """Per-document PII/noise hit counts — the AUDIT side of ``scrub``:
    how many emails, URLs, phone-like digit runs, and IPv4 literals
    each document carries, plus a ``has_pii`` flag. Run it before and
    after ``scrub``/``pseudonymize`` to prove a release corpus is
    clean, or aggregate it for a corpus-level exposure report.

    The email/URL/phone patterns are exactly ``scrub``'s (what this
    reports is what that redacts); all patterns are regex-dialect
    portable (plain character classes, no lookaround) so the same
    expressions run in Spark and DuckDB. Pure JVM ``regexp_count``
    projections — scan speed, zero shuffle, zero UDF.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_emails = F.regexp_count(
        text, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]+")
    )
    n_urls = F.regexp_count(text, F.lit(r"https?://[^ ]+"))
    n_phones = F.regexp_count(text, F.lit(r"[0-9][0-9 ()+.-]{7,}[0-9]"))
    n_ips = F.regexp_count(
        text, F.lit(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")
    )
    out = (
        df.withColumn(f"{prefix}emails", n_emails)
        .withColumn(f"{prefix}urls", n_urls)
        .withColumn(f"{prefix}phones", n_phones)
        .withColumn(f"{prefix}ips", n_ips)
    )
    return out.withColumn(
        "has_pii",
        (
            F.col(f"{prefix}emails")
            + F.col(f"{prefix}urls")
            + F.col(f"{prefix}phones")
            + F.col(f"{prefix}ips")
        )
        > 0,
    )


def readability(
    df: DataFrame,
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per document
    (Flesch 1948; Kincaid et al. 1975) — the classic curation signal
    for audience level: reference prose sits near 60-70 ease, legal or
    machine-generated boilerplate far below, word-salad far above.

    Sentences are terminal-punctuation runs (``[.!?]+``) of the RAW
    text, floored at 1; words are the shared normalized lowercase-alnum
    form; syllables use the standard vowel-group heuristic per word
    (count of ``[aeiouy]+`` runs, minus one for a silent final ``e``
    that is not ``-le``, floored at 1):

        ease  = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
        grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59

    Adds ``n_words``, ``n_sentences``, ``n_syllables``, ``flesch``,
    ``fk_grade``; documents with no words after normalization are
    DROPPED (no denominator). Pure JVM array/regexp expressions —
    scan speed, zero shuffle, zero UDF; exactly replicable in DuckDB
    (the heuristic is deterministic, so the scores value-hash match).
    """
    words = F.filter(
        F.split(_norm_words_expr(text_col), " "), lambda w: w != ""
    )
    base = df.withColumn("__rd_ws", words).where(F.size("__rd_ws") > 0)
    n_words = F.size("__rd_ws")
    n_sentences = F.greatest(
        F.regexp_count(F.coalesce(F.col(text_col), F.lit("")), F.lit(r"[.!?]+")),
        F.lit(1),
    )
    syl = F.aggregate(
        F.transform(
            F.col("__rd_ws"),
            lambda w: F.greatest(
                F.regexp_count(w, F.lit(r"[aeiouy]+"))
                - F.when(
                    w.rlike("e$") & ~w.rlike("le$"), F.lit(1)
                ).otherwise(F.lit(0)),
                F.lit(1),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    wps = n_words.cast("double") / n_sentences.cast("double")
    spw = F.col("n_syllables").cast("double") / n_words.cast("double")
    return (
        base.withColumn("n_words", n_words)
        .withColumn("n_sentences", n_sentences)
        .withColumn("n_syllables", syl)
        .withColumn(
            "flesch",
            F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, round_to),
        )
        .withColumn(
            "fk_grade",
            F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), round_to),
        )
        .drop("__rd_ws")
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    new_col: str = "text_deduped",
    removed_col: str = "n_lines_removed",
) -> DataFrame:
    """Remove EXACT duplicate lines within each document, keeping the
    first occurrence in order — the within-document half of
    boilerplate removal (navigation bars, repeated footers, pasted
    headers); the cross-document half is ``remove_common_lines``.

    ``array_distinct`` preserves first-occurrence order, so this is a
    pure JVM projection: split on newline, distinct, rejoin — scan
    speed, zero shuffle, zero UDF, null text passes through as null.
    ``removed_col`` counts the dropped lines (a useful per-doc
    boilerplate signal on its own).
    """
    lines = F.split(F.col(text_col), "\n")
    deduped = F.array_distinct(lines)
    return df.withColumn(
        new_col,
        F.when(F.col(text_col).isNotNull(), F.array_join(deduped, "\n")),
    ).withColumn(
        removed_col,
        F.when(
            F.col(text_col).isNotNull(), F.size(lines) - F.size(deduped)
        ).otherwise(F.lit(0)),
    )


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    new_col: str = "fingerprint",
    normalize: bool = True,
) -> DataFrame:
    """Document fingerprint: md5 of the normalized text (lowercased,
    whitespace collapsed). Deterministic across engines — the basis
    for exact dedup and incremental-corpus diffing."""
    text = F.col(text_col)
    if normalize:
        text = F.regexp_replace(F.lower(text), r"\s+", " ")
    return df.withColumn(new_col, F.md5(text.cast("string")))


def compression_ratio(
    df: DataFrame, text_col: str = "text", new_col: str = "compression_ratio"
) -> DataFrame:
    """zlib compressed-size / raw-size per document — the standard
    cheap redundancy signal for corpus filtering (highly repetitive
    boilerplate compresses far below ~0.3; near-random noise sits near
    1.0). No JVM zlib expression exists, so this is the one text signal
    computed in Python — Arrow-batched ``pandas_udf``, never per-row
    Python, and deterministic (zlib level pinned)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ratio(texts):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 4)

        return pd.Series([one(t) for t in texts])

    # explicit signature (module uses `from __future__ import annotations`)
    return df.withColumn(new_col, pandas_udf(_ratio, "double")(F.col(text_col)))


def remove_common_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 10,
    new_col: Optional[str] = None,
    min_len: int = 1,
    group_col: Optional[str] = None,
) -> DataFrame:
    """Boilerplate removal: drop every line that occurs in more than
    ``max_df`` documents (nav bars, cookie banners, license footers —
    the RefinedWeb/CCNet-style cleanup). Lines shorter than ``min_len``
    characters are kept unconditionally (blank separators aren't
    boilerplate evidence).

    ``group_col`` (e.g. the host from ``url_host``) scopes the
    document-frequency count WITHIN each group — boilerplate is mostly
    site-specific, so a per-host count catches a small site's nav bar
    (which a global threshold misses) while a sentence that happens to
    be popular across the whole web is no longer over-removed.

    Distributed shape: explode to (doc, pos, line), count distinct-doc
    frequency per line (one shuffle on the line — partial-aggregated,
    so bytes ∝ distinct lines), anti-join the frequent set, reassemble
    in original order with a grouped sort. No Python, no collect;
    line order within each document is preserved exactly.
    """
    out = new_col or text_col
    other_cols = [c for c in df.columns if c != text_col]

    lines = df.select(
        *other_cols,
        F.col(text_col).alias("__orig"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    freq_keys = ["__line"] if group_col is None else [group_col, "__line"]
    frequent = (
        lines.where(F.length("__line") >= min_len)
        .groupBy(*freq_keys)
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .where(F.col("__df") > max_df)
        .select(*freq_keys)
    )
    kept = lines.join(
        frequent.withColumn("__drop", F.lit(True)),
        freq_keys,
        "left",
    ).where(F.col("__drop").isNull() | (F.length("__line") < min_len))
    rebuilt = (
        kept.groupBy(*other_cols, "__orig")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__line")))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias(out)
        )
        .drop("__orig")
    )
    if out == text_col:
        return rebuilt.select(*other_cols, out)
    return rebuilt


def url_host(
    df: DataFrame, url_col: str, new_col: str = "host", strip_www: bool = True
) -> DataFrame:
    """Registrable-host extraction from a URL column (JVM
    ``parse_url``) — the grouping key for per-domain quotas
    (``transform::quota_filter``), per-domain dedup, and domain-level
    quality stats."""
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return df.withColumn(new_col, host)


def _dup_char_frac_expr(col: str) -> "F.Column":
    """Fraction of characters sitting in elements of sorted array column
    ``col`` that occur more than once. The array is pre-sorted so
    duplicates are adjacent — one O(n) pass instead of the O(n²)
    count-each-element shape; everything stays a JVM higher-order
    expression inside whole-stage codegen."""
    total = f"aggregate({col}, 0L, (a, x) -> a + length(x))"
    return F.expr(
        f"""CASE WHEN size({col}) = 0 OR {total} = 0 THEN 0.0
        ELSE round(
          aggregate(
            transform(sequence(0, size({col}) - 1), i ->
              CASE WHEN (i > 0 AND {col}[i] = {col}[i-1])
                     OR (i < size({col}) - 1 AND {col}[i] = {col}[i+1])
                   THEN length({col}[i]) ELSE 0L END),
            0L, (a, x) -> a + x) / cast({total} AS double), 4)
        END"""
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", prefix: str = "rep_"
) -> DataFrame:
    """Within-document repetition signals (Gopher-style filtering
    rules): fraction of duplicate lines / paragraphs, and fraction of
    *characters* inside duplicated lines / paragraphs. Highly
    repetitive documents (scraper loops, keyword stuffing, templated
    listings) score high and are filtered before training.

    Pure JVM array expressions — split, sort, one linear pass per
    document; no shuffle, no UDF, runs at scan speed on a 100 TB
    corpus. Lines split on ``\\n``, paragraphs on blank lines; blank /
    whitespace-only entries are ignored (they are separators, not
    repetition evidence).
    """
    tmp_l, tmp_p = "__rep_lines", "__rep_paras"

    def _split_sorted(pattern: str) -> "F.Column":
        return F.array_sort(
            F.filter(
                F.transform(
                    F.split(F.col(text_col), pattern), lambda x: F.trim(x)
                ),
                lambda x: x != "",
            )
        )

    def _dup_frac(col: str) -> "F.Column":
        # Gopher convention: every occurrence of a value appearing >1
        # time counts as duplicated (so "aa aa bb" -> 2/3, not 1/3).
        # Same sorted-adjacency pass as the char fraction, weight 1.
        return F.expr(
            f"""CASE WHEN size({col}) = 0 THEN 0.0
            ELSE round(
              aggregate(
                transform(sequence(0, size({col}) - 1), i ->
                  CASE WHEN (i > 0 AND {col}[i] = {col}[i-1])
                         OR (i < size({col}) - 1 AND {col}[i] = {col}[i+1])
                       THEN 1L ELSE 0L END),
                0L, (a, x) -> a + x) / cast(size({col}) AS double), 4)
            END"""
        )

    out = (
        df.withColumn(tmp_l, _split_sorted("\n"))
        .withColumn(tmp_p, _split_sorted("\n\\s*\n"))
        .withColumn(f"{prefix}dup_line_frac", _dup_frac(tmp_l))
        .withColumn(f"{prefix}dup_line_char_frac", _dup_char_frac_expr(tmp_l))
        .withColumn(f"{prefix}dup_para_frac", _dup_frac(tmp_p))
        .withColumn(f"{prefix}dup_para_char_frac", _dup_char_frac_expr(tmp_p))
    )
    return out.drop(tmp_l, tmp_p)


def _norm_words_expr(text_col: str) -> "F.Column":
    """Normalized text (lowercase, alnum+space, collapsed) — the shared
    canonical form for n-gram signals so punctuation/casing noise does
    not defeat matching."""
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, r"[^a-z0-9 \n]", " ")
    t = F.regexp_replace(t, r"[ \n]+", " ")
    return F.trim(t)


def _ngram_array_expr(norm_col: str, n: int) -> str:
    """SQL for the array of word ``n``-grams of normalized column
    ``norm_col``. Documents shorter than ``n`` words yield one n-gram
    covering the whole document (so short exact matches still hit)."""
    w = f"split({norm_col}, ' ')"
    return (
        f"transform(sequence(0, greatest(size({w}) - {n}, 0)), "
        f"i -> concat_ws(' ', slice({w}, i + 1, {n})))"
    )


def top_ngram_frac(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    new_col: Optional[str] = None,
) -> DataFrame:
    """Fraction of characters covered by the most frequent word
    ``n``-gram in each document (the Gopher ``top_ngram`` repetition
    rule): ``count × len(ngram) / len(normalized_text)``, capped at
    1.0 (overlapping occurrences can nominally exceed the document
    length). Ties break on longer n-gram, then lexicographic — fully
    deterministic.

    Distributed shape: explode word n-grams (linear in tokens), two
    partial-aggregated shuffles keyed by document id (+ n-gram), then a
    join back on id. No Python, no collect; survives a 100× scale-up
    because every stage is keyed and combiner-friendly.
    """
    out = new_col or f"top_{n}gram_char_frac"
    tmp = "__tnorm"
    base = df.withColumn(tmp, _norm_words_expr(text_col))
    grams = (
        base.where(F.length(tmp) > 0)
        .select(
            F.col(id_col),
            F.length(tmp).alias("__nchars"),
            F.explode(F.expr(_ngram_array_expr(tmp, n))).alias("__ngram"),
        )
        .where(F.col("__ngram") != "")
    )
    counts = grams.groupBy(id_col, "__nchars", "__ngram").agg(
        F.count("*").alias("__cnt")
    )
    tops = counts.groupBy(id_col, "__nchars").agg(
        F.max(
            F.struct(
                F.col("__cnt"),
                F.length("__ngram").alias("__nglen"),
                F.col("__ngram"),
            )
        ).alias("__top")
    )
    fracs = tops.select(
        F.col(id_col),
        F.round(
            F.least(
                F.lit(1.0),
                (F.col("__top.__cnt") * F.col("__top.__nglen"))
                / F.col("__nchars").cast("double"),
            ),
            4,
        ).alias(out),
    )
    return base.drop(tmp).join(fracs, id_col, "left").na.fill({out: 0.0})


def _exploded_ngrams(
    frame: DataFrame, col: str, keep: List[str], n: int
) -> DataFrame:
    """One row per word n-gram of ``col`` (normalized), carrying the
    ``keep`` columns — the shared exploded form for contamination
    checks."""
    tmp = "__dnorm"
    with_norm = frame.withColumn(tmp, _norm_words_expr(col))
    return (
        with_norm.where(F.length(tmp) > 0)
        .select(
            *keep,
            F.explode(F.expr(_ngram_array_expr(tmp, n))).alias("__ngram"),
        )
        .where(F.col("__ngram") != "")
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: Optional[str] = None,
    n: int = 8,
    new_col: str = "contaminated",
    remove: bool = False,
) -> DataFrame:
    """Test-set decontamination: flag (or drop, ``remove=True``) every
    training document sharing any normalized word ``n``-gram with the
    evaluation corpus ``eval_df`` — the standard GPT-3/PaLM-style
    n-gram-overlap contamination check run before training.

    Scale shape: the eval side (benchmarks — thousands of rows, not
    terabytes) collapses to a distinct n-gram set and is **broadcast**;
    the corpus side explodes n-grams map-side and semi-joins with zero
    shuffle. The contaminated-id set (≪ corpus) is broadcast for the
    final flag join, so the whole operator adds no corpus-wide shuffle.
    Eval docs shorter than ``n`` words contribute one whole-document
    n-gram and therefore only match near-identical short documents.
    """
    from pyspark.sql.functions import broadcast

    ecol = eval_text_col or text_col
    eval_grams = _exploded_ngrams(eval_df, ecol, [], n).select("__ngram").distinct()
    doc_grams = _exploded_ngrams(df, text_col, [id_col], n)
    hits = (
        doc_grams.join(broadcast(eval_grams), "__ngram", "left_semi")
        .select(id_col)
        .distinct()
    )
    flagged = df.join(
        broadcast(hits.withColumn(new_col, F.lit(True))), id_col, "left"
    ).withColumn(new_col, F.coalesce(F.col(new_col), F.lit(False)))
    if remove:
        return flagged.where(~F.col(new_col)).drop(new_col)
    return flagged


def bloom_decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: Optional[str] = None,
    n: int = 8,
    new_col: str = "contaminated",
    remove: bool = False,
    fp_rate: float = 1e-4,
    num_bits: Optional[int] = None,
    num_hashes: Optional[int] = None,
) -> DataFrame:
    """``decontaminate``'s scale path: the eval n-gram set is folded
    into a Bloom filter and the membership test runs map-side — the
    broadcast payload is ``num_bits/8`` bytes regardless of n-gram
    string length (a 10⁷-gram eval set at fp_rate 1e-4 is ~24 MB of
    bits vs gigabytes of distinct 8-gram strings), and the corpus side
    never explodes, joins, or shuffles: one Arrow ``pandas_udf`` tests
    each document's grams against the shared bit array.

    Guarantees: NO false negatives — every document the exact
    ``decontaminate`` flags is flagged here too (both sides hash the
    identical normalized grams with the same JVM ``xxhash64`` family).
    False positives (clean docs flagged) occur at ~``fp_rate`` per
    distinct gram; with g grams per document the per-document FP rate
    is ≤ g·fp_rate. Use the exact variant when the eval set broadcasts
    comfortably; this one when it doesn't.

    Sizing (standard Bloom formulas, overridable): bits =
    ⌈-m·ln p / ln²2⌉, hashes = round(bits/m · ln 2) capped at 16. The
    bit array is built DISTRIBUTED: each eval partition ORs its grams'
    positions into a local bitmap (vectorized numpy) and the bitmaps
    tree-reduce — the driver only ever holds O(num_bits/8) bytes, never
    the position stream, and no dedup shuffle is needed (OR is
    idempotent). The distinct eval-gram frame is persisted across its
    two actions (count for sizing, then the bitmap pass).
    """
    import math

    import numpy as np
    import pandas as pd

    if not 0.0 < fp_rate < 1.0:
        raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
    ecol = eval_text_col or text_col
    eval_grams = (
        _exploded_ngrams(eval_df, ecol, [], n).select("__ngram").distinct()
    ).persist()
    try:
        m = eval_grams.count()
        if m == 0:
            flagged = df.withColumn(new_col, F.lit(False))
            return (
                flagged.where(~F.col(new_col)).drop(new_col)
                if remove
                else flagged
            )
        if num_bits is None:
            num_bits = max(
                64, int(math.ceil(-m * math.log(fp_rate) / math.log(2) ** 2))
            )
        if num_hashes is None:
            num_hashes = min(16, max(1, round(num_bits / m * math.log(2))))
        k, bits_n = num_hashes, num_bits
        nbytes = (bits_n + 7) // 8

        def _positions(gram_col):
            return [
                F.pmod(F.xxhash64(F.lit(i), gram_col), F.lit(bits_n))
                for i in range(k)
            ]

        def _partition_bitmap(rows):
            arr = np.fromiter(
                (p for row in rows for p in row[0]), dtype=np.int64
            )
            b = np.zeros(nbytes, dtype=np.uint8)
            if arr.size:
                np.bitwise_or.at(b, arr >> 3, (1 << (arr & 7)).astype(np.uint8))
            yield b

        # coalesce before the bitmap pass: every task allocates (and
        # the reduce ships) a full nbytes array, so the cost is
        # tasks × num_bits/8 — bounded to 16 regardless of how many
        # shuffle partitions the distinct() produced
        bits = (
            eval_grams.select(
                F.array(*_positions(F.col("__ngram"))).alias("ps")
            )
            .coalesce(16)
            .rdd.mapPartitions(_partition_bitmap)
            .treeReduce(np.bitwise_or, depth=2)
        )
    finally:
        eval_grams.unpersist()
    bc = df.sparkSession.sparkContext.broadcast(bits)

    from pyspark.sql.functions import pandas_udf

    def _any_gram_hits_fn(pos_lists):
        b = bc.value
        out = np.zeros(len(pos_lists), dtype=bool)
        for i, doc in enumerate(pos_lists):
            if doc is None or len(doc) == 0:
                continue
            a = np.asarray([np.asarray(g, dtype=np.int64) for g in doc])
            idx, msk = a >> 3, (1 << (a & 7)).astype(np.uint8)
            out[i] = bool(((b[idx] & msk) == msk).all(axis=1).any())
        return pd.Series(out)

    _any_gram_hits = pandas_udf(_any_gram_hits_fn, "boolean")

    tmp = "__bnorm"
    norm = _norm_words_expr(text_col)
    grams = F.when(
        F.length(F.col(tmp)) > 0,
        F.filter(
            F.expr(_ngram_array_expr(tmp, n)), lambda g: g != F.lit("")
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_positions = F.transform(grams, lambda g: F.array(*_positions(g)))
    flagged = (
        df.withColumn(tmp, norm)
        .withColumn(new_col, _any_gram_hits(doc_positions))
        .drop(tmp)
    )
    if remove:
        return flagged.where(~F.col(new_col)).drop(new_col)
    return flagged


def dedup_paragraphs(
    df: DataFrame, text_col: str = "text", new_col: Optional[str] = None
) -> DataFrame:
    """Remove repeated paragraphs within each document, keeping the
    first occurrence (scraper loops and templated listings repeat whole
    paragraphs; corpus-level dedup won't catch repetition *inside* one
    document). Paragraphs are compared trimmed; empty paragraphs are
    dropped; surviving paragraphs are re-joined with a blank line.
    Null documents stay null.

    One JVM array expression per row — no shuffle. The
    ``array_position`` scan is O(k²) in paragraphs-per-document, which
    is tens, not thousands — irrelevant next to the scan cost.
    """
    out = new_col or text_col
    paras = (
        f"transform(split({text_col}, '\\n\\\\s*\\n'), x -> trim(x))"
    )
    expr = (
        f"array_join(filter({paras}, (p, i) -> "
        f"p != '' AND array_position({paras}, p) = i + 1), '\\n\\n')"
    )
    return df.withColumn(
        out,
        F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(F.expr(expr)),
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    min_stopword_hits: int = 2,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    new_col: str = "gopher_keep",
    remove: bool = False,
) -> DataFrame:
    """Composite Gopher-style quality gate: word-count window, mean
    word length window, minimum distinct-stopword hits, and duplicate
    line caps — the published rule set for filtering web-scraped
    training corpora, with every threshold overridable. Adds a boolean
    ``new_col`` (or drops failing rows with ``remove=True``).

    Pure JVM single-pass expressions (same machinery as ``quality`` and
    ``repetition_signals``) — scan speed, no shuffle, no UDF.
    """
    tmp_pfx = "__gf_"
    scored = repetition_signals(df, text_col=text_col, prefix=tmp_pfx)
    text = F.col(text_col)
    words = F.split(F.trim(text), r"\s+")
    n_words = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(words)
    )
    n_chars = F.length(F.trim(text))
    avg_word_len = (n_chars - (n_words - F.lit(1))) / n_words.cast("double")
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, lambda w: F.lower(w)),
            F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
        )
    )
    keep = (
        text.isNotNull()
        & (n_words >= min_words)
        & (n_words <= max_words)
        & (avg_word_len >= min_avg_word_len)
        & (avg_word_len <= max_avg_word_len)
        & (stop_hits >= min_stopword_hits)
        & (F.col(f"{tmp_pfx}dup_line_frac") <= max_dup_line_frac)
        & (F.col(f"{tmp_pfx}dup_line_char_frac") <= max_dup_line_char_frac)
    )
    out = scored.withColumn(new_col, F.coalesce(keep, F.lit(False))).drop(
        *[
            f"{tmp_pfx}{c}"
            for c in (
                "dup_line_frac",
                "dup_line_char_frac",
                "dup_para_frac",
                "dup_para_char_frac",
            )
        ]
    )
    if remove:
        return out.where(F.col(new_col)).drop(new_col)
    return out


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    doc_drop_markers: Sequence[str] = ("lorem ipsum", "{"),
    line_drop_words: Sequence[str] = ("javascript",),
    cleaned_col: str = "c4_text",
    keep_col: str = "c4_keep",
    remove: bool = False,
) -> DataFrame:
    """C4-style heuristic cleaning (Raffel et al. 2020, §2.2 — the
    rule set behind the C4 corpus), line level then document level:

    * keep only lines that end in a terminal punctuation mark
      (``. ! ? "``), have ≥ ``min_words_per_line`` words, and contain
      none of ``line_drop_words`` (word-boundary, case-insensitive);
    * rebuild the document from the surviving lines (``cleaned_col``);
    * keep the document (``keep_col``) only if the cleaned text holds
      ≥ ``min_sentences`` terminal-punctuation sentences and the
      ORIGINAL text contains none of ``doc_drop_markers``
      (case-insensitive substring — C4 drops any page with
      "lorem ipsum" or a curly brace).

    Complements ``gopher_filter`` (statistical signals) with C4's
    structural line rules. Pure JVM array expressions over the split
    lines — scan speed, no shuffle, no UDF; the three-sentence span
    dedup that C4 also applies is ``dedup.substring_spans``.
    ``remove=True`` drops failing rows and the flag column, keeping
    the cleaned text.
    """
    if min_words_per_line < 1:
        raise ValueError(
            f"c4_clean: min_words_per_line must be >= 1, got "
            f"{min_words_per_line}"
        )
    if min_sentences < 1:
        raise ValueError(
            f"c4_clean: min_sentences must be >= 1, got {min_sentences}"
        )
    text = F.col(text_col)
    lines = F.transform(
        F.split(F.coalesce(text, F.lit("")), "\n"), lambda l: F.trim(l)
    )

    def line_ok(l):
        words = F.filter(F.split(l, r"\s+"), lambda w: w != "")
        ok = l.rlike(r'[.!?"]$') & (F.size(words) >= min_words_per_line)
        for w in line_drop_words:
            # word-boundary, case-insensitive: the C4 "javascript" rule
            ok = ok & ~F.lower(l).rlike(r"\b" + re.escape(w.lower()) + r"\b")
        return ok

    cleaned = F.array_join(F.filter(lines, line_ok), "\n")
    # Materialize the cleaned text FIRST and derive everything below
    # from the column ATTRIBUTE, not the expression: re-using the
    # expression would inline the whole split/filter/transform chain
    # once per consumer in the final Project (three copies — up to 3×
    # the per-row CPU of the operator on a full-corpus scan), and
    # CollapseProject keeps the two projections separate only when the
    # upper one references the attribute. Verified by plan dump
    # (tests/test_text_corpus.py: exactly one array_join in the
    # physical plan).
    out = df.withColumn(cleaned_col, cleaned)
    cleaned_attr = F.col(cleaned_col)
    # sentences ≈ terminal-punctuation runs; count via length delta
    n_sentences = F.length(cleaned_attr) - F.length(
        F.regexp_replace(cleaned_attr, r"[.!?]", "")
    )
    keep = text.isNotNull() & (n_sentences >= min_sentences)
    for m in doc_drop_markers:
        keep = keep & ~F.contains(F.lower(text), F.lit(m.lower()))
    out = out.withColumn(keep_col, F.coalesce(keep, F.lit(False)))
    if remove:
        return out.where(F.col(keep_col)).drop(keep_col)
    return out


def chunk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 32,
    chunk_col: str = "chunk_text",
    idx_col: str = "chunk_idx",
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows (RAG /
    context-window chunking): windows of ``chunk_tokens`` whitespace
    tokens advancing by ``chunk_tokens - overlap``. Every token lands in
    at least one chunk; documents at or under ``chunk_tokens`` yield one
    chunk; empty/null documents yield none.

    One ``posexplode`` over a computed ``sequence`` — pure JVM, row
    growth is len/stride (bounded), no shuffle. All original columns
    are kept alongside ``(chunk_idx, chunk_text)``.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_tokens "
            f"({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    tmp_w = "__chunk_words"
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = (
        F.ceil(
            F.greatest(F.size(F.col(tmp_w)) - chunk_tokens, F.lit(0))
            / F.lit(float(stride))
        )
        + 1
    )
    base = df.withColumn(tmp_w, words).where(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    )
    out = base.select(
        *[c for c in df.columns],
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(idx_col, "__i"),
        F.col(tmp_w),
    ).select(
        *[c for c in df.columns],
        F.col(idx_col),
        F.concat_ws(
            " ", F.slice(F.col(tmp_w), F.col(idx_col) * stride + 1, chunk_tokens)
        ).alias(chunk_col),
    )
    return out


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: Optional[str] = None,
    max_tokens: int = 2048,
    buckets: int = 200,
) -> DataFrame:
    """Greedy sequence packing for training: assign each document to a
    fixed-budget pack of ≤ ``max_tokens`` tokens (first-fit-decreasing
    within deterministic hash buckets), returning ``(id, n_tokens,
    pack_id, pack_pos, oversize)``. Join the result back on ``id_col``
    to materialize packed batches.

    Token counts come from ``token_col`` when given, else whitespace
    tokens of ``text_col``. Documents longer than ``max_tokens`` get a
    singleton pack with ``oversize=true`` (truncation is the trainer's
    decision, not silently done here).

    Scale shape: one shuffle on the hash bucket; each bucket is packed
    independently in an Arrow-batched ``applyInPandas`` (sized by
    ``buckets`` — pick corpus_rows/buckets ≲ a few million so a group
    fits an executor). Packing is deterministic: bucket =
    ``xxhash64(id) mod buckets``, order = (tokens desc, id asc).
    Cross-bucket packing would need a global sort for marginal fill
    gain; per-bucket first-fit-decreasing fills ≥ ~99% at realistic
    doc-length distributions.
    """
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    if token_col:
        tok = F.col(token_col)
    else:
        trimmed = F.trim(F.col(text_col))
        tok = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
            F.size(F.split(trimmed, r"\s+"))
        )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.coalesce(tok.cast("long"), F.lit(0)).alias("__tokens"),
    ).withColumn(
        "__bucket",
        F.pmod(F.xxhash64(F.col("__id").cast("string")), F.lit(buckets)),
    )

    out_schema = (
        f"{id_col} {id_type}, n_tokens long, pack_id string, "
        "pack_pos int, oversize boolean"
    )
    budget = int(max_tokens)

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["__tokens", "__id"], ascending=[False, True], kind="mergesort"
        )
        bucket = int(pdf["__bucket"].iloc[0])
        remaining: list = []  # capacity per open pack
        counts: list = []  # items per pack (for pack_pos)
        ids, toks, pack_ids, positions, oversizes = [], [], [], [], []
        for doc, t in zip(pdf["__id"], pdf["__tokens"]):
            t = int(t)
            if t > budget:
                pack = len(remaining)
                remaining.append(0)
                counts.append(1)
                pos, over = 0, True
            else:
                pack = next(
                    (i for i, cap in enumerate(remaining) if cap >= t), None
                )
                if pack is None:
                    pack = len(remaining)
                    remaining.append(budget)
                    counts.append(0)
                remaining[pack] -= t
                pos = counts[pack]
                counts[pack] += 1
                over = False
            ids.append(doc)
            toks.append(t)
            pack_ids.append(f"b{bucket}-p{pack}")
            positions.append(pos)
            oversizes.append(over)
        return pd.DataFrame(
            {
                id_col: ids,
                "n_tokens": toks,
                "pack_id": pack_ids,
                "pack_pos": positions,
                "oversize": oversizes,
            }
        )

    return base.groupBy("__bucket").applyInPandas(_pack, out_schema)


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    new_col: str = "text_nfc",
    form: str = "NFC",
    strip_control: bool = True,
) -> DataFrame:
    """Unicode-normalize a text column (default NFC — canonical
    composition, the web-standard storage form; NFKC folds
    compatibility characters too) and optionally strip C0/C1 control
    characters except tab/newline. The canonical first step of corpus
    cleaning: visually identical strings with different codepoint
    sequences (é composed vs e+◌́) otherwise defeat exact dedup and
    fingerprinting.

    JVM has no unicode-normalization expression, so this is an
    Arrow-batched pandas_udf (the same justified-UDF shape as
    ``compression_ratio``) — one scan, no shuffle.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"normalize_unicode: unknown form '{form}'")
    ctrl = dict.fromkeys(
        c for c in range(0x20) if chr(c) not in "\t\n"
    ) | dict.fromkeys(range(0x7F, 0xA0))

    # no type annotations: this module's `from __future__ import
    # annotations` stringifies hints beyond pandas_udf's resolver
    def _norm(s):
        def one(t):
            if t is None:
                return None
            out = unicodedata.normalize(form, t)
            return out.translate(ctrl) if strip_control else out

        return s.map(one)

    return df.withColumn(new_col, pandas_udf(_norm, "string")(F.col(text_col)))


def strip_html(
    df: DataFrame,
    text_col: str = "text",
    new_col: str = "text_plain",
) -> DataFrame:
    """Strip HTML to plain text: drop <script>/<style> blocks wholesale
    (their content is code, not prose), remove remaining tags, unescape
    the six ubiquitous entities, and collapse whitespace. Pure JVM
    ``regexp_replace`` chain — scan speed, no UDF. This is the
    80%-of-crawl-cleaning regex tier, not a DOM parser: malformed
    nesting degrades to leftover text, never to an error.
    """
    t = F.col(text_col)
    # two separate patterns (not <(script|style)...</\1>): backreference-
    # free regexes run identically under RE2, keeping the DuckDB oracle
    # byte-equivalent
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in [
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
        ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'"),
    ]:
        t = F.regexp_replace(t, ent, ch)
    t = F.regexp_replace(t, r"\s+", " ")
    return df.withColumn(new_col, F.trim(t))


# Writing-system codepoint ranges (BMP core blocks — public Unicode).
# The pre-round-13 merged "cjk" bucket is split into han/kana/hangul so
# ja/ko/zh text routes separately (a Japanese-vs-Korean blend is a real
# mix, not "pure cjk"); thai/bengali/tamil/telugu — each a top-25 web
# language previously counted as unscripted — are now detected instead
# of falling through to 'und'. SCRIPT_ALIASES below maps the retired
# name for YAML/filters written against the old output vocabulary.
SCRIPT_RANGES = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "hebrew": "֐-׿",
    "devanagari": "ऀ-ॿ",
    "bengali": "ঀ-৿",
    "tamil": "஀-௿",
    "telugu": "ఀ-౿",
    "thai": "฀-๿",
    "han": "一-鿿",
    "kana": "぀-ヿ",
    "hangul": "가-힯",
}

# Deprecated output names → the split scripts that replaced them.
# ``script_id``/``lang_mix`` never emit 'cjk' anymore; a downstream
# filter like ``script_pred == 'cjk'`` should test membership in
# ``SCRIPT_ALIASES['cjk']`` instead.
SCRIPT_ALIASES = {"cjk": ("han", "kana", "hangul")}


def script_id(
    df: DataFrame,
    text_col: str = "text",
    new_col: str = "script_pred",
    min_frac: float = 0.3,
) -> DataFrame:
    """Writing-system detection by codepoint-range counting: the script
    (latin/cyrillic/greek/arabic/hebrew/devanagari/bengali/tamil/telugu/
    thai/han/kana/hangul) owning the most characters wins, or ``'und'``
    when no script reaches ``min_frac`` of the non-whitespace
    characters. Pure JVM expressions — one ``regexp_replace``
    length-diff per script, no shuffle.

    Since round 13 the former merged ``'cjk'`` bucket is split into
    ``'han'``/``'kana'``/``'hangul'`` (see ``SCRIPT_ALIASES``): zh/ja/ko
    routing is what a multilingual training mix actually needs, and a
    kana-heavy Japanese page no longer reads identically to a Korean
    one. Filters written against the old ``'cjk'`` value should test
    ``isin(*SCRIPT_ALIASES['cjk'])``.

    The honest complement to ``lang_id``: stopword scoring only works
    within its configured languages, while script detection routes
    CJK/Cyrillic/Arabic/... text to the right downstream handling
    without pretending to know the exact language.
    """
    text = F.col(text_col)
    names = sorted(SCRIPT_RANGES)
    # Stage the per-script counts as intermediate columns so each
    # regexp_replace runs ONCE per row: inlining them into the
    # greatest/CASE tree repeats every count O(scripts) times, which
    # with 13 scripts blows past Janino's 64 KB method limit and drops
    # the whole stage out of codegen. The two projections stay
    # separate (CollapseProject won't duplicate non-cheap,
    # multiply-referenced aliases) yet fuse into one codegen stage.
    cnt_cols = {n: f"__script_cnt_{n}" for n in names}
    staged = df.select(
        "*",
        F.length(F.regexp_replace(text, r"\s", "")).alias("__script_non_ws"),
        *[
            (
                F.length(text)
                - F.length(F.regexp_replace(text, f"[{SCRIPT_RANGES[n]}]", ""))
            ).alias(cnt_cols[n])
            for n in names
        ],
    )
    counts = {n: F.col(cnt_cols[n]) for n in names}
    non_ws = F.col("__script_non_ws")
    best = F.greatest(*[counts[n] for n in names])
    result = F.lit("und")
    for name in reversed(names):  # first in sorted order wins ties
        result = F.when(
            (counts[name] == best)
            & (best >= F.lit(min_frac) * non_ws)
            & (best > 0),
            F.lit(name),
        ).otherwise(result)
    return staged.withColumn(new_col, result).drop(
        "__script_non_ws", *cnt_cols.values()
    )


def pseudonymize(
    df: "DataFrame",
    columns: "List[str]",
    salt: str,
    num_bits: int = 256,
    keep_original: bool = False,
) -> "DataFrame":
    """Irreversibly pseudonymize identifier columns: each named column
    is replaced by (or, with ``keep_original``, joined by) the hex
    SHA-2 of ``salt || value`` — the standard keyed-hash approach that
    keeps JOINABILITY (equal inputs map to equal tokens across tables
    hashed with the same salt) while removing the raw identifier from
    the corpus. NULLs stay NULL. Pure JVM ``sha2`` expressions — scan
    speed, no shuffle.

    This is pseudonymization, not anonymization: with the salt (keep
    it in a secret store, never in the lift definition repo) and a
    candidate identifier, membership is checkable by recomputation.
    """
    if num_bits not in (224, 256, 384, 512):
        raise ValueError("pseudonymize: num_bits must be 224|256|384|512")
    if not salt:
        raise ValueError("pseudonymize: empty salt defeats the purpose")
    out = df
    for col in columns:
        hashed = F.when(
            F.col(col).isNull(), F.lit(None).cast("string")
        ).otherwise(
            F.sha2(F.concat(F.lit(salt), F.col(col).cast("string")), num_bits)
        )
        if keep_original:
            out = out.withColumn(f"{col}_pseudo", hashed)
        else:
            out = out.withColumn(col, hashed)
    return out


# Tracking query parameters stripped by canonicalize_url (public,
# widely-documented analytics/click identifiers).
TRACKING_PARAMS = (
    "utm_[a-z]+", "fbclid", "gclid", "gclsrc", "dclid", "msclkid",
    "mc_cid", "mc_eid", "igshid", "yclid", "_hsenc", "_hsmi",
)


def extract_links(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_host: bool = True,
) -> DataFrame:
    """Outgoing-link extraction from document text — the edge
    generator for the crawl-side graph operators: feed the (doc, host)
    rows into ``graph.pagerank``/``degree_stats`` for authority
    scores and hub detection, into ``text.host_mix`` for the
    per-domain datasheet, or into ``dedup.by_url`` after
    ``canonicalize_url``. One row per extracted URL:
    ``(id_col, link_idx, url, host?)`` with ``link_idx`` the 0-based
    in-document position.

    Exact semantics (replicable cross-engine — host comes from a
    REGEXP, not ``parse_url``, so an oracle replays it verbatim):
    URLs are maximal ``https?://`` runs of non-whitespace,
    non-quote/angle/paren-close characters; trailing prose
    punctuation (``.,;:!?``) is stripped — "see https://x.org/a."
    ends at ``a`` — while inner punctuation survives. ``host`` is
    the lowercased authority minus any userinfo and port, with a
    leading ``www.`` dropped. NULL/linkless documents emit no rows
    (inner explode).

    Scale shape: scan-side ``regexp_extract_all`` + ``posexplode`` —
    zero shuffle, zero UDFs; output rows ∝ links, not documents.
    """
    matches = F.regexp_extract_all(
        F.col(text_col), F.lit(r"""https?://[^\s"'<>\)\]]+"""), 0
    )
    ex = df.select(
        F.col(id_col).alias(id_col),
        F.posexplode(matches).alias("link_idx", "__raw"),
    )
    url = F.regexp_replace(F.col("__raw"), r"[.,;:!?]+$", "")
    out = ex.select(id_col, "link_idx", url.alias("url"))
    if not with_host:
        return out
    host = F.lower(
        F.regexp_extract(
            F.col("url"), r"^https?://(?:[^/@\s]*@)?([^/:?#]+)", 1
        )
    )
    host = F.regexp_replace(host, r"^www\.", "")
    return out.withColumn(
        "host", F.when(host != "", host)
    )


def canonicalize_url(
    df: "DataFrame",
    url_col: str = "url",
    new_col: str = "url_canonical",
) -> "DataFrame":
    """URL canonicalization — the pre-dedup normalization step for web
    corpora: the same page crawled as
    ``HTTP://Site.com:80/a/?utm_source=x#frag`` and
    ``http://site.com/a`` must produce one canonical form, or URL-level
    dedup silently keeps both copies. Applied transformations, in
    order: trim; drop the fragment; lowercase scheme+authority (path
    and query keep their case — they are case-sensitive); strip
    default ports (``:80`` http, ``:443`` https); remove tracking
    parameters (``TRACKING_PARAMS``); repair separators (``?&`` →
    ``?``, collapse ``&&``, drop trailing ``?``/``&``); strip one
    trailing slash from a non-root path. Pure RE2-safe JVM regexp
    chain — scan speed, no shuffle, and replicable in any engine.
    """
    u = F.trim(F.col(url_col))
    # drop fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # lowercase scheme and host ONLY — userinfo, path, and query are
    # case-sensitive per RFC 3986
    has_scheme = u.rlike(r"^[^:/?]+://")
    scheme = F.lower(F.regexp_extract(u, r"^([^:/?]+)://", 1))
    userinfo = F.regexp_extract(u, r"^[^:/?]+://([^/?@]*@)", 1)
    hostport = F.regexp_extract(u, r"^[^:/?]+://(?:[^/?@]*@)?([^/?]*)", 1)
    rest = F.regexp_replace(u, r"^[^:/?]+://[^/?]*", "")
    u = F.when(
        has_scheme,
        F.concat(scheme, F.lit("://"), userinfo, F.lower(hostport), rest),
    ).otherwise(u)
    # default ports (userinfo-tolerant)
    u = F.regexp_replace(
        u, r"^(http://(?:[^/?@]*@)?[^/:?]+):80([/?]|$)", r"$1$2"
    )
    u = F.regexp_replace(
        u, r"^(https://(?:[^/?@]*@)?[^/:?]+):443([/?]|$)", r"$1$2"
    )
    # tracking params in ONE alternation pass (value may be empty;
    # param may sit after ? or &)
    tracking = "|".join(TRACKING_PARAMS)
    u = F.regexp_replace(u, rf"([?&])(?:{tracking})=[^&#]*", r"$1")
    # repair separators — ANCHORED to the real query start (the first
    # '?'), never inside a value: a literal '?' in a param value must
    # not swallow the following '&'
    u = F.regexp_replace(u, r"^([^?]*\?)&+", r"$1")  # '?&&p' at query start
    u = F.regexp_replace(u, r"&&+", "&")              # removed middle params
    u = F.regexp_replace(u, r"&+$", "")               # removed last param(s)
    u = F.regexp_replace(u, r"^([^?]*)\?$", r"$1")   # empty query left over
    # one trailing slash off a non-root path
    u = F.regexp_replace(u, r"^([a-z]+://[^/?]+(?:/[^?]*[^/?]))/(\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"^([a-z]+://[^/?]+)/(\?|$)", r"$1$2")
    return df.withColumn(new_col, u)


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    smoothing: float = 0.5,
    new_col: str = "logprob",
) -> DataFrame:
    """Corpus-trained unigram language-model score per document: the
    mean natural-log probability of the document's words under the
    corpus's own unigram distribution. A model-free stand-in for the
    KenLM-style perplexity filters used in web-corpus curation
    (CCNet-style): boilerplate/gibberish scores far below, and
    lorem-ipsum-ish repetitive text far above, the corpus median —
    both tails are cut candidates.

    Words are the shared normalized form (lowercase alnum). The
    vocabulary is every word with corpus frequency >= ``min_count``
    (a deterministic threshold, unlike a top-K rank cut); rarer words
    fall back to an additive-``smoothing`` floor, so the score is
    total-order comparable across documents:

        p(w) = (c_w + smoothing) / (T + smoothing * (V + 1))

    with T total in-vocab tokens and V vocabulary size; every
    out-of-vocab token shares one unseen-word bucket.

    Plan shape at 100 TB: one corpus scan explodes words (row
    generator, no shuffle), ONE keyed partial-agg shuffle builds word
    counts (map-side combine does the heavy lifting: reduce-side rows
    = vocabulary size), the 1-row (T, V) totals are a broadcast, the
    vocab table joins back to the exploded words — broadcast when the
    vocabulary is dimension-sized, AQE picks SMJ beyond that — and one
    final partial-agg shuffle on ``id_col`` averages per document.
    Entirely JVM expressions; fully SQL-expressible (exact DuckDB
    oracle, no pinned golden).

    Returns ``(id_col, n_tokens, logprob)``. Documents with no words
    after normalization are dropped (no tokens → no distribution).
    """
    if min_count < 1:
        raise ValueError(f"unigram_logprob: min_count must be >= 1, got {min_count}")
    if smoothing <= 0.0:
        raise ValueError(f"unigram_logprob: smoothing must be > 0, got {smoothing}")
    words = (
        df.select(F.col(id_col), F.explode(F.split(_norm_words_expr(text_col), " ")).alias("__w"))
        .where(F.col("__w") != "")
    )
    words = words.transform(pin, eager=False)
    vocab = (
        words.groupBy("__w")
        .agg(F.count("*").alias("__c"))
        .where(F.col("__c") >= min_count)
    )
    # COALESCE: an empty vocabulary (no word reaches min_count) must
    # degrade to the smoothing-only distribution (every token OOV,
    # logprob 0), not to NULL scores that silently fail downstream
    # gates
    totals = vocab.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__t"),
        F.count("*").alias("__v"),
    )
    scored = (
        words.crossJoin(F.broadcast(totals))
        .join(vocab, "__w", "left")
        .select(
            F.col(id_col),
            (
                F.log(F.coalesce(F.col("__c"), F.lit(0)) + F.lit(float(smoothing)))
                - F.log(F.col("__t") + F.lit(float(smoothing)) * (F.col("__v") + F.lit(1)))
            ).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.avg("__lp").alias(new_col),
    )


def ngram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_count: int = 2,
    smoothing: float = 0.5,
    alpha: float = 0.4,
    new_col: str = "logprob",
) -> DataFrame:
    """Corpus-trained bigram language-model score per document with
    stupid backoff (Brants et al. 2007, "Large Language Models in
    Machine Translation") — the sharper form of the CCNet-style
    perplexity signal that ``unigram_logprob`` approximates: a bigram
    model separates fluent text from bag-of-frequent-words gibberish
    that a unigram model scores identically.

    Per token at position i (normalized lowercase-alnum words):

    * ``i = 0`` — smoothed unigram:
      ``ln((c_w + smoothing) / (T + smoothing·(V + 1)))`` — exactly
      ``unigram_logprob``'s distribution;
    * bigram seen (corpus count ≥ ``min_count``):
      ``ln(c(w_{i-1} w_i)) − ln(c_ctx(w_{i-1}))`` where ``c_ctx`` is
      the number of bigram occurrences starting with ``w_{i-1}``;
    * unseen bigram — stupid backoff: ``ln(alpha)`` + the smoothed
      unigram score (a score, not a probability — the published
      recipe, α = 0.4).

    ``n=1`` delegates to ``unigram_logprob``; ``n > 2`` is not
    implemented (each extra order is one more keyed count shuffle —
    the bigram already captures most of the curation signal).

    Plan shape at 100 TB: ONE corpus scan builds (word, prev-word)
    pairs as a JVM array transform + explode (no self-join on
    position, no shuffle to form bigrams), then three keyed partial-agg
    count shuffles (unigram vocab, bigram table, context totals) whose
    reduce sides are vocabulary-sized, a 1-row totals broadcast, the
    count tables join back (broadcast when dimension-sized, AQE SMJ
    beyond), and one final doc-keyed agg. Fully SQL-expressible —
    exact DuckDB oracle, no pinned golden.

    Returns ``(id_col, n_tokens, logprob)``; documents with no words
    after normalization are dropped.
    """
    if n == 1:
        return unigram_logprob(
            df, id_col=id_col, text_col=text_col, min_count=min_count,
            smoothing=smoothing, new_col=new_col,
        )
    if n != 2:
        raise NotImplementedError(
            f"ngram_logprob: only n=1 (unigram) and n=2 (bigram with "
            f"stupid backoff) are implemented, got n={n}"
        )
    if min_count < 1:
        raise ValueError(f"ngram_logprob: min_count must be >= 1, got {min_count}")
    if smoothing <= 0.0:
        raise ValueError(f"ngram_logprob: smoothing must be > 0, got {smoothing}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"ngram_logprob: alpha must be in (0, 1], got {alpha}")
    base = df.select(
        F.col(id_col),
        F.filter(
            F.split(_norm_words_expr(text_col), " "), lambda w: w != ""
        ).alias("__ws"),
    )
    # (word, previous-word) in one array transform over the attribute:
    # F.get is 0-based and null-safe, so index -1 (first token) yields
    # a null prev — no positional self-join, no element_at(0) trap
    toks = (
        base.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.col("__ws"),
                    lambda w, i: F.struct(
                        w.alias("w"),
                        F.get(F.col("__ws"), i - F.lit(1)).alias("prev"),
                    ),
                )
            ).alias("__t"),
        )
        .select(
            F.col(id_col),
            F.col("__t.w").alias("__w"),
            F.col("__t.prev").alias("__prev"),
        )
        .transform(pin, eager=False)
    )
    vocab = (
        toks.groupBy("__w")
        .agg(F.count("*").alias("__c"))
        .where(F.col("__c") >= min_count)
    )
    totals = vocab.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__t"),
        F.count("*").alias("__v"),
    )
    pairs = toks.where(F.col("__prev").isNotNull())
    bi = (
        pairs.groupBy("__prev", "__w")
        .agg(F.count("*").alias("__cb"))
        .where(F.col("__cb") >= min_count)
    )
    ctx = pairs.groupBy("__prev").agg(F.count("*").alias("__cc"))
    uni_lp = F.log(F.coalesce(F.col("__c"), F.lit(0)) + F.lit(float(smoothing))) - F.log(
        F.col("__t") + F.lit(float(smoothing)) * (F.col("__v") + F.lit(1))
    )
    lp = (
        F.when(F.col("__prev").isNull(), uni_lp)
        .when(F.col("__cb").isNotNull(), F.log("__cb") - F.log("__cc"))
        .otherwise(F.log(F.lit(float(alpha))) + uni_lp)
    )
    scored = (
        toks.crossJoin(F.broadcast(totals))
        .join(vocab, "__w", "left")
        .join(bi, ["__prev", "__w"], "left")
        .join(ctx, "__prev", "left")
        .select(F.col(id_col), lp.alias("__lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.avg("__lp").alias(new_col),
    )


def logprob_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 3,
    min_count: int = 2,
    smoothing: float = 0.5,
    new_col: str = "bucket",
    score_col: str = "logprob",
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    corpus unigram LM (``unigram_logprob``) and split the corpus into
    ``buckets`` equal-population quality tiers — bucket 0 is the
    best-scoring (head) tier, the published CCNet recipe keeps head
    (+ middle) and drops tail. Returns ``(id_col, n_tokens,
    score_col, new_col)``.

    Scale shape: thresholds come from ONE exact ``percentile``
    aggregate (a 1-row broadcast, not a global ntile window — ntile
    funnels the whole corpus through a single partition), so
    bucketing adds one scan over the scored frame. Boundary docs
    (score exactly at a threshold) go to the better bucket,
    deterministically. Equal-population is as exact as score ties
    allow — heavy ties at a boundary skew the counts, which is the
    correct semantics for a threshold rule.
    """
    if buckets < 2:
        raise ValueError(f"logprob_buckets: buckets must be >= 2, got {buckets}")
    scored = unigram_logprob(
        df, id_col=id_col, text_col=text_col, min_count=min_count,
        smoothing=smoothing, new_col=score_col,
    )
    qs = [i / buckets for i in range(1, buckets)]
    thresholds = scored.agg(
        *[
            F.expr(f"percentile({score_col}, {1 - q})").alias(f"__th{i}")
            for i, q in enumerate(qs)
        ]
    )
    # bucket = number of thresholds STRICTLY above the score: the head
    # tier is scores >= the highest threshold
    expr = None
    for i in range(len(qs)):
        term = (F.col(score_col) < F.col(f"__th{i}")).cast("int")
        expr = term if expr is None else expr + term
    return (
        scored.join(F.broadcast(thresholds))
        .withColumn(new_col, expr)
        .drop(*[f"__th{i}" for i in range(len(qs))])
    )


def filter_hosts(
    df: DataFrame,
    hosts,
    url_col: str = "url",
    mode: str = "block",
    keep_null: bool = True,
) -> DataFrame:
    """Host allow/block filtering — the domain-blocklist (or
    curated-allowlist) step of web-corpus curation: the canonical host
    of ``url_col`` (lowercased, ``www.`` stripped — same key as
    ``url_host``) is tested against ``hosts``, given either as a
    Python sequence (folds in as a broadcast literal array —
    blocklists of up to ~100k hosts) or as a single-column DataFrame
    (broadcast semi/anti JOIN — the million-host registry case).
    ``mode='block'`` drops matching rows, ``'allow'`` keeps only them.
    Rows whose URL has no parseable host follow ``keep_null``
    (default: a missing host is not blocklist evidence).
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"filter_hosts: mode must be block|allow, got {mode}")
    tmp = "__fh_host"
    out = url_host(df, url_col, tmp)
    if isinstance(hosts, DataFrame):
        hcol = hosts.columns[0]
        hset = hosts.select(
            F.regexp_replace(F.lower(F.col(hcol)), r"^www\.", "").alias(tmp)
        ).distinct()
        joined = out.join(
            F.broadcast(hset), tmp, "left_semi" if mode == "allow" else "left_anti"
        )
        if mode == "allow" and keep_null:
            nulls = out.where(F.col(tmp).isNull())
            joined = joined.unionByName(nulls)
        elif mode == "block" and not keep_null:
            joined = joined.where(F.col(tmp).isNotNull())
        return joined.drop(tmp)
    hosts = [str(h).lower().removeprefix("www.") for h in hosts]
    if not hosts:
        raise ValueError("filter_hosts: hosts must be non-empty")
    hit = F.col(tmp).isin(hosts)
    if mode == "block":
        cond = ~F.coalesce(hit, F.lit(not keep_null))
    else:
        cond = F.coalesce(hit, F.lit(bool(keep_null)))
    return out.where(cond).drop(tmp)


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "char_entropy",
    round_to: int = 4,
) -> DataFrame:
    """Per-document Shannon entropy (bits) over the character
    distribution — the cheap gibberish/encoding-damage signal: natural
    prose sits near 4-4.5 bits, single-character spam near 0,
    base64/hex blobs and random bytes push past 5.5.

    Computed scan-fused with zero shuffle and zero UDFs: the distinct
    characters of a document (≤ alphabet size, ~dozens for text) each
    count their occurrences with a vectorized ``filter`` over the char
    array, then fold −Σ p·log2 p. Per-row cost is O(distinct_chars ×
    length) JVM work — bounded by the alphabet, not the corpus.
    Null/empty documents emit entropy 0.0.
    """
    chars = F.split(F.coalesce(F.col(text_col), F.lit("")), "")
    # Spark's split('', '') yields [""] on empty input — drop the
    # empty sentinel so n=0 for empty docs
    chars = F.filter(chars, lambda c: c != "")
    n = F.size(chars)
    probs = F.transform(
        F.array_distinct(chars),
        lambda c: F.size(F.filter(chars, lambda x: x == c)).cast("double") / n,
    )
    ent = -F.aggregate(
        probs,
        F.lit(0.0),
        lambda acc, p: acc + p * F.log2(p),
    )
    return df.withColumn(
        out_col,
        F.when(n == 0, F.lit(0.0)).otherwise(F.round(ent, round_to)),
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Corpus collocations: adjacent word pairs ranked by pointwise
    mutual information — the "new york" / "machine learning" detector
    that turns a raw corpus into a phrase vocabulary (tokenizer merge
    candidates, query expansion, domain-shift inspection: a corpus
    whose top collocations are all SEO boilerplate tells you something
    quality scores miss). PMI = log(c(a,b)·T / (c(a)·c(b))) over
    corpus totals, with the standard ``min_count`` support floor
    (PMI's known failure mode is rare-pair noise — two hapaxes that
    co-occur once get the maximum score). Output: top-k rows
    ``(token_a, token_b, pair_count, pmi)`` by PMI descending
    (deterministic tiebreak on the pair).

    Shape: one scan explodes adjacent pairs (linear in tokens), pair
    and unigram counts are keyed partial aggs (shuffle ∝ vocabulary,
    not corpus), PMI attaches by two token-keyed joins, and the top-k
    is a TakeOrdered — no per-document state, no driver loops.
    Tokenization: lowercase, whitespace split, empties dropped
    (matching ``search.build_index``).
    """
    if min_count < 1:
        raise ValueError("collocations: min_count must be >= 1")
    if top_k < 1:
        raise ValueError("collocations: top_k must be >= 1")
    toks = df.select(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("__t")
    ).where(F.size("__t") >= 2)
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__t"), 1, F.size("__t") - 1).alias("a"),
                F.slice(F.col("__t"), 2, F.size("__t") - 1).alias("b"),
            )
        ).alias("__p")
    ).select(F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b"))
    pair_counts = (
        pairs.groupBy("__a", "__b")
        .agg(F.count("*").cast("bigint").alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )
    # unigram counts as BIGRAM-POSITION marginals (left/right token
    # occurrences over the same pair population), so the PMI
    # normalization is a true probability ratio over T = total pairs
    left = pairs.groupBy(F.col("__a").alias("__tok")).agg(
        F.count("*").alias("__ca")
    )
    right = pairs.groupBy(F.col("__b").alias("__tok")).agg(
        F.count("*").alias("__cb")
    )
    total = pairs.agg(F.count("*").cast("double").alias("__T"))
    scored = (
        pair_counts.join(
            left.withColumnRenamed("__tok", "__a"), "__a"
        )
        .join(right.withColumnRenamed("__tok", "__b"), "__b")
        .join(F.broadcast(total))
        .select(
            F.col("__a").alias("token_a"),
            F.col("__b").alias("token_b"),
            "pair_count",
            F.round(
                F.log(
                    F.col("pair_count")
                    * F.col("__T")
                    / (F.col("__ca") * F.col("__cb"))
                ),
                round_to,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("token_a").asc(), F.col("token_b").asc()
    ).limit(top_k)


def template_key(
    df: DataFrame,
    text_col: str = "text",
    new_col: str = "template_key",
) -> DataFrame:
    """Slot-masked template fingerprint: md5 of the text with its
    variable slots neutralized — URLs → ``<url>``, e-mails →
    ``<email>``, digit runs → ``0`` — then lowercased and
    whitespace-collapsed. Templated boilerplate ("Order #8812 shipped
    to …", per-user profile pages, listing permalinks) collapses to
    one key while MinHash/SimHash would burn candidate pairs on it;
    running :func:`~getl_spark.functions.dedup.by_template` BEFORE
    fuzzy dedup removes the cheap mass first, exactly as
    ``dedup.exact`` does for verbatim copies.

    Pure JVM regexp chain — scan-speed, no shuffle, and every regex is
    RE2-safe so the DuckDB oracle applies the identical masking.
    """
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, r"https?://[^\s]+", "<url>")
    t = F.regexp_replace(t, r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]+", "<email>")
    t = F.regexp_replace(t, r"[0-9]+", "0")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return df.withColumn(new_col, F.md5(t))


def sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into sentences — one row per sentence:
    ``(id, sent_idx, sentence)`` with contiguous 0-based indexes and
    trimmed text. The rule is the pragmatic corpus-processing one: a
    sentence is a maximal run up to (and including) a ``.!?`` cluster
    (so ``yes...`` stays one sentence), plus any trailing unpunctuated
    fragment; empty and punctuation-only documents emit no rows (both
    alternatives require at least one non-punctuation character).
    Abbreviation-aware splitting needs a language model —
    out of scope by design; for quality gates and span-level dedup
    this rule is the standard choice (it is C4's).

    The pattern is alternation-only (``[^.!?]+[.!?]+|[^.!?]+$``) —
    deliberately NO lookbehind, which RE2 (DuckDB, Go) lacks, so the
    exact rule replays in the oracle and any sibling pipeline.

    Scale shape: scan-side regexp + ``posexplode`` — zero shuffle,
    zero UDFs; rows out ∝ sentences.
    """
    parts = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[^.!?]+[.!?]+|[^.!?]+$"), 0
    )
    trimmed = F.filter(
        F.transform(parts, lambda s: F.trim(s)), lambda s: s != ""
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(trimmed).alias("sent_idx", "sentence"),
    )


def code_blocks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Extract triple-backtick fenced code blocks from markdown-ish
    documents — the first step of a code-corpus pipeline (separate
    code from prose, route each to its own quality/dedup stack).
    One output row per fence: ``(id, block_idx, lang, code)`` with
    ``lang`` the CommonMark info string (whatever follows the opening
    fence on its line, '' when absent) and ``block_idx`` the 0-based
    fence position within the document.

    The fence body is matched lazily with dot-matches-newline
    (``(?s)```(.*?)``` ``), so single backticks INSIDE code survive;
    only three-backtick fences delimit (tilde fences and 4+-backtick
    fences are out of scope — documented). A fence with no newline
    (`````inline`````) is an info
    string with empty code, per CommonMark. Unclosed trailing fences
    are dropped (no pair).

    Scale shape: scan-side regexp + ``posexplode`` — zero shuffle,
    zero UDFs; output rows ∝ fences, not documents.
    """
    matches = F.regexp_extract_all(
        F.col(text_col), F.lit(r"(?s)```(.*?)```"), 1
    )
    ex = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(matches).alias("block_idx", "raw"),
    )
    has_nl = F.col("raw").contains("\n")
    lang = F.when(has_nl, F.regexp_extract("raw", r"^([^\n]*)", 1)).otherwise(
        F.col("raw")
    )
    code = F.when(
        has_nl, F.regexp_replace("raw", r"^[^\n]*\n", "")
    ).otherwise(F.lit(""))
    return ex.select(
        "id",
        "block_idx",
        lang.alias("lang"),
        code.alias("code"),
    )


# GPT-2-style pre-tokenizer, expressed with stdlib ``re`` (the
# original uses the third-party ``regex`` module's \p classes; Python's
# [^\W\d_] is the equivalent unicode-letter class). Contractions,
# space-prefixed letter/digit/punctuation runs, then residual
# whitespace — the public byte-level-BPE convention. The punctuation
# branch must spell out ``_`` explicitly: GPT-2's class is
# [^\s\p{L}\p{N}] which INCLUDES underscore, but Python's \w contains
# '_', so a bare [^\s\w] would silently drop it from every pre-token
# (``snake_case`` would lose its underscores and undercount).
_BPE_PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+",
    re.UNICODE,
)


def _bytes_to_unicode() -> dict:
    """The public GPT-2 byte↔unicode bijection: printable latin bytes
    map to themselves, the rest shift into the U+0100 private range so
    every byte has a visible, dict-key-safe character. Lets real
    byte-level merges tables (GPT-2/RoBERTa vocab.bpe) drive
    :func:`bpe_token_count` unchanged."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _bpe_word_tokens(word: list, ranks: dict) -> int:
    """Token count of ONE pre-token's symbol list under ``ranks``
    (symbol pair -> merge priority, lower first). Textbook BPE: each
    round merges every occurrence of the single highest-priority
    adjacent pair present; identity is the PAIR, not its concatenated
    string (("ab","c") and ("a","bc") are different merges)."""
    while len(word) > 1:
        best_rank, first, second = None, None, None
        for i in range(len(word) - 1):
            r = ranks.get((word[i], word[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, first, second = r, word[i], word[i + 1]
        if best_rank is None:
            break
        out, i = [], 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                out.append(first + second)
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = out
    return len(word)


def bpe_encode_count(text: str, ranks: dict, byte_map: Optional[dict]) -> int:
    """Pure-Python BPE token count of one document — the exact
    algorithm the distributed UDF applies per row, exposed so tests
    (and the pinned driver oracle) can replay it without Spark.
    ``ranks`` maps symbol pairs -> merge priority (lower merges
    first); ``byte_map`` is the GPT-2 byte↔unicode table for
    byte-level tables, None for char-level."""
    total = 0
    for m in _BPE_PRETOKEN_RE.finditer(text):
        pre = m.group(0)
        if byte_map is not None:
            word = [byte_map[b] for b in pre.encode("utf-8")]
        else:
            word = list(pre)
        total += _bpe_word_tokens(word, ranks)
    return total


def bpe_token_count(
    df: DataFrame,
    merges: Sequence,
    text_col: str = "text",
    new_col: str = "bpe_token_count",
    byte_level: bool = True,
) -> DataFrame:
    """Tokenizer-faithful token counts: ``df`` + ``new_col`` holding
    the number of BPE tokens of ``text_col`` under the given merges
    table — the units real training budgets are written in.
    Whitespace counts (what ``token_budget_mix`` / ``pack_sequences``
    / ``chunk`` default to) run 2-4× off on code and CJK; pass this
    column as their ``token_col`` to budget in tokenizer tokens:
    ``token_budget_mix(df, ..., token_col="bpe_token_count")``.

    ``merges`` is the standard merges list — pairs ``(left, right)``
    in priority order (GPT-2 ``vocab.bpe`` lines, minus the header).
    ``byte_level=True`` (default) applies the public GPT-2
    byte↔unicode mapping first, so real byte-level tables work
    verbatim; False runs char-level BPE (hand-pinned test vocabs).
    NULL text → NULL count; empty string → 0.

    Scale shape: ONE Arrow-batched pandas UDF over the corpus scan —
    no shuffle, no collect. The ranks table (model-sized, ~50k pairs)
    rides a SparkContext broadcast (one copy per executor, not per
    task) on classic Spark, plain closure capture under Connect. Per
    pre-token results are memoized per batch (Zipf reuse makes the
    effective cost ~unique pre-tokens, not tokens); the merge loop is
    the textbook O(len²) — fine for pre-token-sized inputs (words,
    not documents).

    No reference counterpart (counting there is whitespace-based);
    this is pure LLM-pipeline capability on the engine's budgeting
    path.
    """
    ranks = {}
    for i, pair in enumerate(merges):
        a, b = pair
        ranks[(str(a), str(b))] = i
    if not ranks:
        raise ValueError("bpe_token_count: merges must be non-empty")
    byte_map = _bytes_to_unicode() if byte_level else None

    from getl_spark.common.scale import is_classic

    if is_classic(df):
        bc = df.sparkSession.sparkContext.broadcast((ranks, byte_map))
        get_tables = lambda: bc.value  # noqa: E731
    else:  # pragma: no cover - Connect: closure capture, no sc
        tables = (ranks, byte_map)
        get_tables = lambda: tables  # noqa: E731

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # explicit signature (no type hints): the module's `from
    # __future__ import annotations` stringifies hints, which the
    # pandas_udf resolver can't evaluate with a function-local pd
    def _count_fn(texts):
        rk, bm = get_tables()
        cache: dict = {}

        def one(t):
            if t is None:
                return None
            total = 0
            for m in _BPE_PRETOKEN_RE.finditer(t):
                pre = m.group(0)
                c = cache.get(pre)
                if c is None:
                    word = (
                        [bm[b] for b in pre.encode("utf-8")]
                        if bm is not None
                        else list(pre)
                    )
                    c = _bpe_word_tokens(word, rk)
                    cache[pre] = c
                total += c
            return total

        return texts.map(one)

    _count = pandas_udf(_count_fn, "bigint")
    return df.withColumn(new_col, _count(F.col(text_col)))


def pack_stats(
    packed: DataFrame,
    max_tokens: int,
    round_to: int = 6,
) -> DataFrame:
    """Packing-quality readout over :func:`pack_sequences` output —
    the numbers a training team grades a packing run by, as ONE row:

    * ``n_docs`` / ``n_packs`` / ``oversize_docs``;
    * ``truncation_rate`` — fraction of docs exceeding ``max_tokens``
      (the trainer will truncate these; packing marked them, didn't);
    * ``truncated_tokens`` — total tokens lost IF oversize docs are
      cut at ``max_tokens`` (the token cost of the truncation policy);
    * ``utilization`` — Σ min(fill, max) / (n_packs · max): the
      fraction of batch slots carrying real tokens (1 − padding
      waste). Oversize singleton packs count as full (they are, after
      truncation);
    * ``multi_doc_packs`` / ``crossdoc_docs`` — packs holding ≥ 2
      documents, and documents sharing a pack: without attention
      masking every such doc attends into a neighbor, so this IS the
      cross-doc-attention contamination count to weigh against the
      utilization gain;
    * ``util_h0`` … ``util_h9`` — pack-count histogram over
      utilization deciles ([0, .1) … [.9, 1.0]; the top bucket
      includes exactly-full), the shape view behind the single
      ``utilization`` number — a fat h9 with a long h0-h3 tail says
      "raise buckets or sort better", a uniform smear says the
      length distribution fights the budget.

    Scale shape: one keyed partial-agg shuffle on ``pack_id`` (bytes ∝
    packs, not docs) then a 1-row reduce — the same two-level
    aggregate every ``stats.*`` readout uses; no window, no UDF,
    no driver state.
    """
    if max_tokens < 1:
        raise ValueError(f"pack_stats: max_tokens must be >= 1, got {max_tokens}")
    m = F.lit(int(max_tokens))
    per_pack = packed.groupBy("pack_id").agg(
        F.count("*").cast("bigint").alias("__docs"),
        F.sum("n_tokens").cast("bigint").alias("__fill"),
        F.sum(F.col("oversize").cast("int")).cast("bigint").alias("__over"),
    )
    used = F.least(F.col("__fill"), m.cast("bigint"))
    util = used.cast("double") / m
    # decile index; exactly-full lands in the top bucket
    dec = F.least(F.floor(util * 10).cast("int"), F.lit(9))
    hist = [
        F.sum(F.when(dec == i, 1).otherwise(0))
        .cast("bigint")
        .alias(f"util_h{i}")
        for i in range(10)
    ]
    agg = per_pack.agg(
        F.sum("__docs").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_packs"),
        F.sum("__over").alias("oversize_docs"),
        F.sum(
            F.when(
                F.col("__over") > 0, F.col("__fill") - m.cast("bigint")
            ).otherwise(F.lit(0))
        ).cast("bigint").alias("truncated_tokens"),
        F.sum(used).alias("__used_total"),
        F.sum(F.when(F.col("__docs") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("multi_doc_packs"),
        F.sum(F.when(F.col("__docs") >= 2, F.col("__docs")).otherwise(0))
        .cast("bigint")
        .alias("crossdoc_docs"),
        *hist,
    )
    return agg.select(
        "n_docs",
        "n_packs",
        "oversize_docs",
        F.round(
            F.col("oversize_docs").cast("double") / F.col("n_docs"), round_to
        ).alias("truncation_rate"),
        "truncated_tokens",
        F.round(
            F.col("__used_total").cast("double") / (F.col("n_packs") * m),
            round_to,
        ).alias("utilization"),
        "multi_doc_packs",
        "crossdoc_docs",
        *[f"util_h{i}" for i in range(10)],
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    byte_level: bool = True,
    max_word_types: int = 1_000_000,
    min_pair_count: int = 2,
) -> list:
    """Learn a BPE merges table from the corpus — the training half of
    the budgeting chain (``bpe_train`` → :func:`bpe_token_count` →
    ``token_budget_mix``/``pack_sequences``). Returns the merges as a
    plain list of ``(left, right)`` pairs in priority order —
    JSON-serialize it; nothing else to ship, and
    ``bpe_token_count(df, merges)`` consumes it directly.

    How the work splits (the sentencepiece/HF convention): BPE
    training needs only the WORD-TYPE frequency table, not the corpus
    — so the distributed part is one pre-tokenize + count aggregation
    (pandas-UDF pre-tokenizer identical to the counting side, shuffle
    ∝ distinct pre-tokens, i.e. vocabulary-shaped, not corpus-shaped),
    and the merge loop runs driver-side on that bounded table with the
    standard incremental pair-index algorithm (each merge touches only
    the words containing its pair). ``max_word_types`` is the loud
    limit probe (the ``bt_ratings``/k-means bounded-driver-table
    pattern): a corpus whose distinct pre-token count exceeds it fails
    with guidance, never OOMs the driver. Merges stop early when no
    pair reaches ``min_pair_count`` (merging hapax pairs memorizes the
    corpus).

    Determinism: pair ties break on the pair's symbols
    (lexicographic), so the same corpus always yields the same table
    regardless of partitioning.
    """
    if num_merges < 1:
        raise ValueError(f"bpe_train: num_merges must be >= 1, got {num_merges}")
    byte_map = _bytes_to_unicode() if byte_level else None

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _pretokens_fn(texts):
        def one(t):
            if t is None:
                return []
            return [m.group(0) for m in _BPE_PRETOKEN_RE.finditer(t)]

        return texts.map(one)

    _pretokens = pandas_udf(_pretokens_fn, "array<string>")
    word_counts = (
        df.select(F.explode(_pretokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count("*").alias("__c"))
    )
    rows = word_counts.limit(max_word_types + 1).collect()
    if len(rows) > max_word_types:
        raise ValueError(
            f"bpe_train: more than {max_word_types} distinct pre-token "
            "types (max_word_types). The word-frequency table is "
            "driver-solved by design (vocabulary-sized); raise "
            "max_word_types explicitly, or pre-normalize the corpus "
            "(lowercase, NFC) to shrink the type count."
        )
    # sorted for reproducibility: the incremental updates below are
    # order-sensitive only through tie-breaks, and we break ties on
    # symbols — but a deterministic word order makes debugging replays
    # bit-identical too
    vocab = []
    counts = []
    for r in sorted(rows, key=lambda r: r["__w"]):
        w = r["__w"]
        word = (
            [byte_map[b] for b in w.encode("utf-8")]
            if byte_map is not None
            else list(w)
        )
        if len(word) >= 2:
            vocab.append(word)
            counts.append(int(r["__c"]))

    from collections import Counter, defaultdict

    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wi, word in enumerate(vocab):
        c = counts[wi]
        for i in range(len(word) - 1):
            p = (word[i], word[i + 1])
            pair_counts[p] += c
            pair_words[p].add(wi)

    merges: list = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # max count, symbol-lexicographic tie-break
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words[best]):
            word, c = vocab[wi], counts[wi]
            # remove this word's old pair contributions
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(wi)
            # apply the merge
            out, i = [], 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            vocab[wi] = out
            # re-add the new pair contributions
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] += c
                pair_words[p].add(wi)
    return merges


def host_mix(
    df: DataFrame,
    url_col: str = "url",
    weight_col: Optional[str] = None,
    top_k: int = 100,
    strip_www: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Per-host corpus mixture report — the first table in every
    web-corpus datasheet (FineWeb/C4 style): which domains dominate
    the crawl, by document count and optionally by a weight column
    (tokens, chars). Returns the ``top_k`` hosts by docs (host asc
    tiebreak): ``(host, docs, doc_share[, weight, weight_share])``
    with shares against the WHOLE corpus (so the printed rows reveal
    how much tail the cut hides). Rows with no parseable host
    aggregate under host NULL — a big NULL row is itself a data-health
    finding. Feeds ``filter_hosts`` (blocklist the junk the report
    surfaces) and ``transform::quota_filter`` (cap the dominators).

    One host-keyed partial-agg shuffle (bytes ∝ distinct hosts, not
    rows), a 1-row totals broadcast for the shares, and a TakeOrdered
    top-k — never a global sort.
    """
    if top_k < 1:
        raise ValueError(f"host_mix: top_k must be >= 1, got {top_k}")
    tmp = "__hm_host"
    hosted = url_host(df, url_col, tmp, strip_www=strip_www)
    aggs = [F.count("*").cast("bigint").alias("docs")]
    if weight_col is not None:
        aggs.append(
            F.sum(F.col(weight_col).cast("double")).alias("__w")
        )
    per_host = hosted.groupBy(F.col(tmp).alias("host")).agg(*aggs)
    t_aggs = [F.sum("docs").alias("__td")]
    if weight_col is not None:
        t_aggs.append(F.sum("__w").alias("__tw"))
    totals = per_host.agg(*t_aggs)
    out = per_host.crossJoin(F.broadcast(totals))
    cols = [
        "host",
        "docs",
        F.round(
            F.col("docs").cast("double") / F.col("__td"), round_to
        ).alias("doc_share"),
    ]
    if weight_col is not None:
        cols += [
            F.col("__w").alias("weight"),
            F.round(F.try_divide(F.col("__w"), F.col("__tw")), round_to).alias(
                "weight_share"
            ),
        ]
    return (
        out.select(*cols)
        .orderBy(F.col("docs").desc(), F.col("host").asc_nulls_last())
        .limit(top_k)
    )


def contamination_report(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: Optional[str] = None,
    n: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Per-document contamination FRACTION against an eval corpus —
    the graded companion to ``decontaminate``'s boolean: what share
    of each training document's distinct normalized word ``n``-grams
    also appear in the benchmark set. The boolean treats a document
    quoting one benchmark sentence the same as a verbatim benchmark
    dump; real decontamination policy wants the dial (drop ≥ 0.8
    wholesale copies, strip-or-keep the 0.01 incidental quoters) and
    the audit trail (how MUCH of the corpus is tainted, not just how
    many rows).

    One row per input document: ``(id_col, n_grams, n_tainted,
    taint_fraction)`` — ``n_grams`` counts the document's DISTINCT
    n-grams (the standard denominator: repeated boilerplate doesn't
    dilute or inflate its own taint), documents too short to form a
    single n-gram report ``n_grams = 0`` with NULL fraction. Same
    normalization and n-gram construction as ``decontaminate``, so
    ``taint_fraction > 0`` agrees exactly with its flag.

    Scale shape: the eval side collapses to a distinct broadcast gram
    set (use this variant when that broadcasts comfortably —
    benchmarks, not terabytes); the corpus side explodes map-side,
    dedups on one (id, gram)-keyed shuffle, and the tainted count is
    a broadcast-semi-join + id-keyed aggregate. No corpus×eval join
    ever materializes.
    """
    from pyspark.sql.functions import broadcast

    ecol = eval_text_col or text_col
    eval_grams = (
        _exploded_ngrams(eval_df, ecol, [], n).select("__ngram").distinct()
    )
    doc_grams = (
        _exploded_ngrams(df, text_col, [id_col], n)
        .select(id_col, "__ngram")
        .distinct()
    )
    totals = doc_grams.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_grams")
    )
    tainted = (
        doc_grams.join(broadcast(eval_grams), "__ngram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_tainted"))
    )
    report = (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(tainted, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_tainted"), F.lit(0)).alias("n_tainted"),
        )
    )
    return report.select(
        id_col,
        "n_grams",
        "n_tainted",
        F.round(
            F.when(
                F.col("n_grams") > 0,
                F.col("n_tainted").cast("double") / F.col("n_grams"),
            ),
            round_to,
        ).alias("taint_fraction"),
    )


def lang_mix(
    df: "DataFrame",
    text_col: str = "text",
    mixed_threshold: float = 0.15,
) -> "DataFrame":
    """Script-mixing measurement per document — the quantitative
    companion to :func:`script_id` (which names the DOMINANT script):
    corpus text that blends writing systems is usually one of
    boilerplate injection, mojibake, spam keyword stuffing, or genuine
    code-switching — all of which a monolingual training mix wants
    flagged, not silently averaged in. Appends three columns:

    * ``script_main`` — the dominant script among the scripted
      characters (``'und'`` when none match any known range);
    * ``script_mix_frac`` — the fraction of SCRIPTED characters
      outside the dominant script (0.0 = pure, NULL when the text has
      no scripted characters at all — digits/punctuation-only rows
      are "no evidence", not "pure");
    * ``script_mixed`` — ``script_mix_frac > mixed_threshold``
      (default 0.15; NULL propagates).

    Same codepoint-range machinery as :func:`script_id` (one
    ``regexp_replace`` length-diff per script): pure scan-side JVM
    expressions, no shuffle, no UDF — measuring 100 TB costs one scan.
    """
    if not 0 <= mixed_threshold < 1:
        raise ValueError(
            "text.lang_mix: mixed_threshold must be in [0, 1), got "
            f"{mixed_threshold}"
        )
    text = F.col(text_col)
    names = sorted(SCRIPT_RANGES)
    # Same count-staging as script_id: one regexp_replace per script
    # per row, never inlined O(scripts) times into the CASE tree
    # (keeps the projection inside whole-stage codegen at 13 scripts).
    cnt_cols = {n: f"__script_cnt_{n}" for n in names}
    staged = df.select(
        "*",
        *[
            (
                F.length(text)
                - F.length(F.regexp_replace(text, f"[{SCRIPT_RANGES[n]}]", ""))
            ).alias(cnt_cols[n])
            for n in names
        ],
    )
    counts = {n: F.col(cnt_cols[n]) for n in names}
    total = None
    for n in names:
        total = counts[n] if total is None else total + counts[n]
    best = F.greatest(*[counts[n] for n in names])
    main = F.lit("und")
    for name in reversed(names):  # first in sorted order wins ties
        main = F.when((counts[name] == best) & (best > 0), F.lit(name)).otherwise(
            main
        )
    mix = F.when(
        total > 0,
        (total - best).cast("double") / total.cast("double"),
    )
    # script_mixed compares the UNROUNDED fraction (the documented
    # 'script_mix_frac > mixed_threshold' semantics); rounding is
    # display-only on the emitted column — a fraction landing in
    # (threshold, threshold + 5e-7] must still flag as mixed.
    return (
        staged.withColumn("script_main", F.when(text.isNotNull(), main))
        .withColumn("script_mix_frac", F.round(mix, 6))
        .withColumn(
            "script_mixed",
            mix > F.lit(float(mixed_threshold)),
        )
        .drop(*cnt_cols.values())
    )
