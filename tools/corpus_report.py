"""One-command corpus health report, composed from the operator
library: python tools/corpus_report.py [sf_dir] [out.md]

Sections: per-column profile, source mix with contribution shares,
language/script distribution, quality-signal quantiles, exact- and
near-duplication rates, repeated-passage pressure, length histogram.
Every number comes from the same YAML-callable operators pipelines
use — the report doubles as living documentation of the library.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "corpus_report.md"

    from pyspark.sql import functions as F

    from getl_spark import get_spark
    from getl_spark.common.scale import pin
    from getl_spark.functions import dedup, skew, stats, text

    spark = get_spark("corpus-report")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").transform(pin)
    n_docs = docs.count()

    lines = [f"# Corpus report — {sf_dir}", "", f"Documents: **{n_docs}**", ""]

    lines += ["## Column profile", "", "| column | rows | nulls | distinct |", "|---|---|---|---|"]
    for r in stats.profile(docs).orderBy("column").collect():
        lines.append(f"| {r.column} | {r.n_rows} | {r.n_null} | {r.n_distinct} |")

    lines += ["", "## Source mix (docs contributed)", "", "| source | docs | doc share | suggested salt |", "|---|---|---|---|"]
    for r in skew.top_keys(docs, ["source"], k=10).collect():
        lines.append(f"| {r.source} | {r.n} | {r.share} | {r.suggested_salt} |")

    lines += ["", "## Language / script", "", "| lang | script | docs |", "|---|---|---|"]
    tagged = text.script_id(text.lang_id(docs))
    for r in (
        tagged.groupBy("lang_pred", "script_pred").count()
        .orderBy(F.desc("count")).limit(10).collect()
    ):
        lines.append(f"| {r.lang_pred} | {r.script_pred} | {r['count']} |")

    q = text.quality(docs)
    qs = q.agg(
        *[F.round(F.expr(f"percentile({c}, array(0.1, 0.5, 0.9))")[i], 3).alias(f"{c}_{p}")
          for c in ("q_n_words", "q_avg_word_len", "q_stopword_ratio")
          for i, p in enumerate(("p10", "p50", "p90"))]
    ).first()
    lines += ["", "## Quality signals (p10 / p50 / p90)", ""]
    for c in ("q_n_words", "q_avg_word_len", "q_stopword_ratio"):
        lines.append(f"- `{c}`: {qs[f'{c}_p10']} / {qs[f'{c}_p50']} / {qs[f'{c}_p90']}")

    fp = text.fingerprint(docs)
    n_exact_dup = n_docs - fp.select("fingerprint").distinct().count()
    near_pairs = dedup.minhash_lsh(docs, threshold=0.5).count()
    spans = dedup.substring_spans(docs, min_tokens=8)
    docs_with_spans = spans.select("id").distinct().count()
    lines += [
        "",
        "## Duplication",
        "",
        f"- exact duplicates (fingerprint collisions): **{n_exact_dup}** docs",
        f"- near-duplicate pairs (MinHash-LSH, j≥0.5): **{near_pairs}**",
        f"- docs containing a corpus-repeated ≥8-token passage: **{docs_with_spans}**",
    ]

    lp = text.unigram_logprob(docs)
    lps = lp.agg(
        *[
            F.round(F.expr("percentile(logprob, array(0.01, 0.1, 0.5, 0.9))")[i], 3).alias(p)
            for i, p in enumerate(("p01", "p10", "p50", "p90"))
        ]
    ).first()
    lines += [
        "",
        "## Unigram-LM quality (mean log-prob under the corpus's own model)",
        "",
        f"- p01 / p10 / p50 / p90: {lps.p01} / {lps.p10} / {lps.p50} / {lps.p90}",
        "- docs far below p01 are gibberish/boilerplate cut candidates; far",
        "  above p50+2·(p90−p50), repetitive-text candidates",
    ]

    lines += ["", "## Length distribution (chars)", "", "| bucket | lo | hi | docs |", "|---|---|---|---|"]
    for r in stats.histogram(docs, "n_chars", bins=8).collect():
        lines.append(f"| {r.bucket} | {r.lo} | {r.hi} | {r.n} |")

    report = "\n".join(lines) + "\n"
    with open(out_path, "w") as fh:
        fh.write(report)
    print(f"wrote {out_path} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
