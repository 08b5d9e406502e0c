"""BM25 keyword retrieval over a document corpus.

Retrieval-based curation is a standard step in training-data pipelines
(mine documents matching a topic/query mix, score corpus coverage of a
query set, build seed sets for classifier bootstrapping). This module
implements Okapi BM25 (Robertson & Walker, public literature) as pure
DataFrame operations:

* corpus side: one explode + partial-aggregated ``groupBy`` builds the
  (doc, term, tf, dl) inverted index — every term of a document lives
  in one input row, so map-side partial aggregation finishes each
  (doc, term) count locally and the shuffle only moves already-reduced
  quads;
* the query term set is tiny and broadcast — the index is pruned to
  query terms BEFORE any per-query work, so scoring cost is
  O(matching postings), not O(corpus);
* document frequencies for the pruned terms and the corpus-wide
  (N, avgdl) scalars are computed distributed and re-attached with a
  broadcast of one- or few-row DataFrames — no driver-side state.

The index table is self-contained (corpus stats derive from it), so a
standing query workload writes ``build_index`` output to parquet once
and runs ``bm25_topk`` against it for every query batch — the corpus
scan is paid once, not per batch.

At 100 TB the dominant cost is the single corpus scan + one shuffle of
partially-aggregated (doc, term, tf, dl) quads; everything downstream
is proportional to the posting lists of the query terms.

YAML-callable as ``search.bm25_topk`` inside ``transform::generic``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from getl_spark.common.scale import local_df

_INDEX_COLS = ["id", "token", "tf", "dl"]


def _words(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, dl) — lowercase whitespace tokens plus the document
    length, carried alongside so downstream scoring never joins back to
    the corpus for it."""
    return df.select(
        F.col(id_col).alias("id"), _words(text_col).alias("w")
    ).select(
        "id",
        F.explode("w").alias("token"),
        F.size("w").alias("dl"),
    )


def build_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The persistable inverted index: ``(id, token, tf, dl)``.

    One corpus scan; the groupBy completes map-side (all terms of a doc
    share an input row), so the exchange moves already-reduced quads.
    Corpus stats (N, avgdl) derive from the index itself, so writing
    this one table to parquet is enough to serve ``bm25_topk`` without
    the corpus — the standing-workload shape: index once, score every
    query batch against it.
    """
    return (
        _tokens(df, id_col, text_col)
        .groupBy("id", "token")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )


def _is_index(df: DataFrame) -> bool:
    return [c for c in df.columns if c in _INDEX_COLS] == _INDEX_COLS


def bm25_topk(
    df: DataFrame,
    queries: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query under Okapi BM25.

    ``df`` is either the raw corpus (indexed on the fly) or a prebuilt
    ``build_index`` table — recognized by its ``(id, token, tf, dl)``
    columns. ``queries`` is a list of query strings (their index is the
    ``query_id``). Scoring uses the standard formulation::

        idf(t)   = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
        score(q, d) = sum over distinct t in q of
            idf(t) * tf(t,d) * (k1 + 1)
                   / (tf(t,d) + k1 * (1 - b + b * dl(d) / avgdl))

    Scores are rounded to 6 decimals BEFORE ranking so ties (and the
    deterministic ``doc_id`` ascending tie-break) are stable across
    summation orders. Documents with no query term in common are not
    returned. Output: ``(query_id, doc_id, score, rank)``.
    """
    if not queries:
        raise ValueError("bm25_topk needs at least one query string")
    spark = df.sparkSession
    # an on-the-fly index is referenced three times (corpus stats,
    # per-term doc frequencies, scoring), but the build's groupBy
    # exchange is canonical-identical in all three subtrees and Spark's
    # ReuseExchange collapses them — measured r13: pinning it instead
    # is a wash at sf0.1 (1.6-1.8 s both ways), so the plan stays
    # pin-free and the reuse is left to the engine
    index = df if _is_index(df) else build_index(df, id_col, text_col)

    # corpus scalars as a broadcast 1-row aggregate, not a driver
    # collect; derived from the index so a persisted index is
    # self-contained (per-doc dl repeats on every posting — distinct
    # first, partial agg keeps the exchange at one row per doc)
    stats = (
        index.select("id", "dl")
        .distinct()
        .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    )

    qterms = (
        local_df(spark,
            [(i, q) for i, q in enumerate(queries)], "query_id INT, query STRING"
        )
        .select(
            "query_id",
            F.explode(F.split(F.lower(F.col("query")), r"\s+")).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )

    # prune the index to query terms before anything else
    matched = index.join(
        F.broadcast(qterms.select("token").distinct()), "token"
    )
    dfreq = matched.groupBy("token").agg(
        F.count("*").alias("doc_freq")
    )

    scored = (
        matched.join(F.broadcast(qterms), "token")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
                / (F.col("doc_freq") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (F.lit(k1) + 1)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "id")
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("id").alias(id_col),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def coverage(
    df: DataFrame,
    queries: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    min_score: float = 0.0,
) -> DataFrame:
    """Per-query corpus coverage: how many documents score above
    ``min_score`` for each query, plus the mean of those scores — the
    aggregate view used to balance a retrieval-curated training mix.
    Output: ``(query_id, n_docs, mean_score)``.
    """
    hits = bm25_topk(
        df, queries, k=2**31 - 1, id_col=id_col, text_col=text_col
    ).where(F.col("score") > min_score)
    return hits.groupBy("query_id").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("score"), 6).alias("mean_score"),
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 60,
    topk: int | None = None,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal rank fusion of several per-query rankings (Cormack,
    Clarke & Buettcher, SIGIR 2009) — the standard combiner for hybrid
    retrieval (BM25 keyword ranks + embedding ANN ranks), used to build
    retrieval-curated training sets from more than one signal.

    Each input carries ``(query_col, id_col, rank_col)`` with rank 1 =
    best (the shape ``bm25_topk`` and ``similarity.topk`` both emit).
    The fused score of a document is::

        rrf(q, d) = sum over systems s that returned d for q of
                    1 / (k + rank_s(q, d))

    with the conventional ``k = 60`` damping constant. Scores are
    rounded to 6 decimals BEFORE ranking so ties (broken by ascending
    ``id_col``) are stable across summation orders. Output:
    ``(query_col, id_col, rrf_score, n_systems, rank)`` where
    ``n_systems`` counts how many input rankings returned the document.

    Scale shape: the union is free (no exchange); the fuse is ONE
    keyed shuffle on ``(query, doc)`` whose partial aggregation
    completes map-side, and the ranking window partitions are bounded
    by ``n_systems * per-system k`` rows per query — top-k inputs keep
    them tiny no matter the corpus size.
    """
    if len(rankings) < 2:
        raise ValueError(
            "rrf_fuse needs at least two rankings to fuse; got "
            f"{len(rankings)}"
        )
    slim = [r.select(query_col, id_col, rank_col) for r in rankings]
    unioned = slim[0]
    for r in slim[1:]:
        unioned = unioned.unionByName(r)
    fused = unioned.groupBy(query_col, id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(k) + F.col(rank_col))), 6
        ).alias("rrf_score"),
        F.count("*").alias("n_systems"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    out = fused.withColumn("rank", F.row_number().over(w).cast("int"))
    if topk is not None:
        out = out.where(F.col("rank") <= topk)
    return out


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF —
    the standard document-labeling / topic-surfacing pass over a
    corpus (cluster naming, corpus browsing, weak topic features)::

        tf(t, d)  = count(t in d) / len(d)
        idf(t)    = ln((N + 1) / (df(t) + 1)) + 1     (smoothed)
        score     = round(tf * idf, 6)

    Ties break on token ascending. Output:
    ``(id_col, token, score, rank)``.

    Scale shape: one corpus scan builds (doc, term, tf, dl) with the
    groupBy completed map-side (all terms of a doc share an input
    row); document frequencies are a vocab-keyed partial aggregation
    joined back ON TOKEN (both sides partitioned by token — co-located
    keyed join, no broadcast needed however large the vocabulary);
    the per-doc top-k window partitions on the high-cardinality doc id.
    """
    if k < 1:
        raise ValueError(f"tfidf_keywords: k must be >= 1, got {k}")
    index = build_index(df, id_col, text_col)
    n_docs = index.select("id").distinct().agg(
        F.count("*").alias("n_docs")
    )
    dfreq = index.groupBy("token").agg(
        F.count("*").alias("doc_freq")
    )
    scored = (
        index.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "token",
            F.round(
                (F.col("tf").cast("double") / F.col("dl"))
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("doc_freq") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "token", "score", "rank")
    )


def rank_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    round_to: int = 6,
) -> DataFrame:
    """Standard IR/retrieval-eval metrics of a ranked result table
    against graded relevance judgments — the missing judge for every
    ranking this package produces (``bm25_topk``, ``similarity.topk``,
    ``rrf_fuse`` all emit the ``(query, doc, rank)`` shape this
    consumes). Output is one row per query appearing in either input::

        (query, n_rel, n_retrieved,
         precision_at_k, recall_at_k, reciprocal_rank, ndcg_at_k)

    trec_eval conventions: ``precision_at_k`` divides by ``k`` (an
    engine that returns fewer than k docs is penalized, not excused);
    ``recall_at_k`` is NULL when the query has no relevant judgments
    (0/0 is not 0); ``reciprocal_rank`` is 1/rank of the first
    relevant retrieved doc within the top-k, 0.0 when none is;
    ``ndcg_at_k`` uses exponential gains ``(2^rel − 1)/log2(rank+1)``
    with the ideal ranking drawn from the judgments themselves (NULL
    when no positive judgments exist). Unjudged retrieved documents
    count as rel 0 (the trec_eval default); duplicate judgments for a
    (query, doc) collapse to their max; negative relevance grades are
    rejected loudly.

    Scale shape: results are pre-filtered to rank ≤ k, judgments join
    on (query, doc) — one keyed shuffle each side; the only window is
    the ideal-ranking row_number partitioned BY QUERY, whose partition
    size is the per-query judgment count — bounded by labeling budget,
    not corpus size. Tied grades make the ideal prefix sum invariant
    to tie order, so the output is deterministic.
    """
    r = results.select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__d"),
        F.col(rank_col).cast("int").alias("__rank"),
    ).where((F.col("__rank") >= 1) & (F.col("__rank") <= k))
    guard = F.assert_true(
        F.col(rel_col) >= 0,
        F.lit("search.rank_eval: relevance grades must be >= 0"),
    )
    # drop NULL grades BEFORE attaching the guard: assert_true throws
    # when its condition is NULL (not just false), so a single NULL
    # judgment row would abort the job instead of being skipped
    # (guard-after-null-filter, same as gini / bh_adjust /
    # interval.merge)
    judged = (
        qrels.where(F.col(rel_col).isNotNull())
        .select(
            F.col(query_col).alias("__q"),
            F.col(id_col).alias("__d"),
            (
                F.col(rel_col).cast("double")
                + F.coalesce(guard.cast("double"), F.lit(0.0))
            ).alias("__rel"),
        )
        .groupBy("__q", "__d")
        .agg(F.max("__rel").alias("__rel"))
    )
    joined = r.join(judged, ["__q", "__d"], "left").withColumn(
        "__rel", F.coalesce("__rel", F.lit(0.0))
    )
    got = joined.groupBy("__q").agg(
        F.count("*").cast("bigint").alias("n_retrieved"),
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("__hits"),
        F.min(F.when(F.col("__rel") > 0, F.col("__rank"))).alias("__first"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("__rel")) - 1)
            / F.log2(F.col("__rank") + 1)
        ).alias("__dcg"),
    )
    w = Window.partitionBy("__q").orderBy(
        F.col("__rel").desc(), F.col("__d").asc()
    )
    ideal = (
        judged.withColumn("__i", F.row_number().over(w))
        .groupBy("__q")
        .agg(
            F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_rel"),
            F.sum(
                F.when(
                    (F.col("__rel") > 0) & (F.col("__i") <= k),
                    (F.pow(F.lit(2.0), F.col("__rel")) - 1)
                    / F.log2(F.col("__i") + 1),
                )
            ).alias("__idcg"),
        )
    )
    both = got.join(ideal, "__q", "full")
    hits = F.coalesce("__hits", F.lit(0))
    return both.select(
        F.col("__q").alias(query_col),
        F.coalesce("n_rel", F.lit(0)).cast("bigint").alias("n_rel"),
        F.coalesce("n_retrieved", F.lit(0)).cast("bigint").alias("n_retrieved"),
        F.round(hits.cast("double") / k, round_to).alias("precision_at_k"),
        F.round(
            F.when(F.col("n_rel") > 0, hits.cast("double") / F.col("n_rel")),
            round_to,
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("__first"), F.lit(0.0)), round_to
        ).alias("reciprocal_rank"),
        F.round(
            F.when(
                F.col("__idcg") > 0,
                F.coalesce("__dcg", F.lit(0.0)) / F.col("__idcg"),
            ),
            round_to,
        ).alias("ndcg_at_k"),
    )
