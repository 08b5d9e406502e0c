"""Text-analysis transform functions for large-scale corpus pipelines.

All hot-path computation uses built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs — so these run at scan speed on a
100 TB corpus: one narrow projection per document, no shuffles except
where an aggregation is explicitly requested.

YAML-callable as ``text.<name>`` inside ``transform::generic``.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F

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
) -> DataFrame:
    """Boilerplate removal: drop every line that occurs in more than
    ``max_df`` documents (nav bars, cookie banners, license footers —
    the RefinedWeb/CCNet-style cleanup). Lines shorter than ``min_len``
    characters are kept unconditionally (blank separators aren't
    boilerplate evidence).

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
    frequent = (
        lines.where(F.length("__line") >= min_len)
        .groupBy("__line")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .where(F.col("__df") > max_df)
        .select("__line")
    )
    kept = lines.join(
        frequent.withColumn("__drop", F.lit(True)),
        "__line",
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
