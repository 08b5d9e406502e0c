"""BM25 retrieval (functions/search.py) unit tests — numeric parity
with DuckDB is covered by tests/test_demoted_oracle.py::search_bm25."""

from __future__ import annotations

import math

import pytest

from getl_spark.functions import search


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry date"),
        (4, "unrelated words only"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_matches_hand_computation(corpus):
    out = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in search.bm25_topk(corpus, ["apple"], k=10).collect()
    }
    # N=4, df(apple)=1, dl(doc1)=3, avgdl=(3+2+4+3)/4=3
    idf = math.log(1 + (4 - 1 + 0.5) / (1 + 0.5))
    tf = 2.0
    expected = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * 3 / 3))
    assert out == {(0, 1): pytest.approx(round(expected, 6))}


def test_bm25_topk_rank_and_tiebreak(corpus):
    rows = search.bm25_topk(corpus, ["cherry banana"], k=10).collect()
    by_q = sorted(rows, key=lambda r: r["rank"])
    # doc 3 (cherry-heavy) outranks docs 1/2; doc 4 never appears
    assert [r["doc_id"] for r in by_q][0] in (2, 3)
    assert all(r["doc_id"] != 4 for r in rows)
    ranks = [r["rank"] for r in by_q]
    assert ranks == sorted(ranks) and len(set(ranks)) == len(ranks)


def test_bm25_case_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "Apple APPLE"), (2, "orange")], ["doc_id", "text"]
    )
    rows = search.bm25_topk(df, ["aPpLe"], k=5).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_bm25_empty_queries_raises(corpus):
    with pytest.raises(ValueError):
        search.bm25_topk(corpus, [])


def test_coverage_counts(corpus):
    cov = {
        r["query_id"]: r["n_docs"]
        for r in search.coverage(corpus, ["cherry", "apple", "zzz"]).collect()
    }
    assert cov[0] == 2  # docs 2 and 3 contain cherry
    assert cov[1] == 1
    assert 2 not in cov  # no hits -> no row


def test_bm25_prebuilt_index_roundtrip(spark, corpus, tmp_path):
    """A persisted build_index table serves identical results to
    indexing on the fly — the standing-workload shape."""
    direct = sorted(map(tuple, search.bm25_topk(corpus, ["cherry banana"]).collect()))
    path = str(tmp_path / "bm25_index")
    search.build_index(corpus).write.parquet(path)
    index = spark.read.parquet(path)
    via_index = sorted(map(tuple, search.bm25_topk(index, ["cherry banana"]).collect()))
    assert direct == via_index


def test_bm25_yaml_callable(spark):
    import yaml

    from getl_spark import lift

    df = spark.createDataFrame(
        [(1, "spark join filter"), (2, "sort merge")], ["doc_id", "text"]
    )
    df.createOrReplaceTempView("bm25_src")
    blocks = {
        "Src": {
            "Type": "custom::sql",
            "Properties": {"Statement": "SELECT * FROM bm25_src"},
        },
        "Result": {
            "Type": "transform::generic",
            "Input": "Src",
            "Properties": {
                "Functions": [
                    {"search.bm25_topk": {"queries": ["spark"], "k": 3}}
                ]
            },
        },
    }
    out = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False)).get(
        "Result"
    )
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_rrf_fuse_hand_computation(spark):
    # two systems, one query; doc 10 is ranked by both (1st and 3rd),
    # doc 20 only by system A (2nd), doc 30 only by system B (1st)
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 20, 2)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(0, 30, 1), (0, 10, 3)], ["query_id", "doc_id", "rank"]
    )
    rows = {
        r["doc_id"]: r
        for r in search.rrf_fuse([a, b], k=60).collect()
    }
    assert rows[10]["rrf_score"] == pytest.approx(
        round(1 / 61 + 1 / 63, 6)
    )
    assert rows[20]["rrf_score"] == pytest.approx(round(1 / 62, 6))
    assert rows[30]["rrf_score"] == pytest.approx(round(1 / 61, 6))
    assert rows[10]["n_systems"] == 2
    assert rows[20]["n_systems"] == 1
    # consensus doc 10 (both systems) outranks either single-system doc
    assert rows[10]["rank"] == 1
    ranks = sorted(r["rank"] for r in rows.values())
    assert ranks == [1, 2, 3]


def test_rrf_fuse_topk_and_tiebreak(spark):
    # docs 1 and 2 get identical scores -> tie broken by ascending id
    a = spark.createDataFrame(
        [(0, 2, 1), (0, 1, 1)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(0, 1, 5), (0, 2, 5), (0, 3, 9)], ["query_id", "doc_id", "rank"]
    )
    rows = sorted(
        search.rrf_fuse([a, b], topk=2).collect(), key=lambda r: r["rank"]
    )
    assert [r["doc_id"] for r in rows] == [1, 2]


def test_rrf_fuse_per_query_isolation(spark):
    a = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(0, 1, 2), (1, 3, 1)], ["query_id", "doc_id", "rank"]
    )
    rows = search.rrf_fuse([a, b]).collect()
    q1 = {r["doc_id"]: r for r in rows if r["query_id"] == 1}
    assert set(q1) == {2, 3}
    # ranks restart per query
    assert sorted(r["rank"] for r in q1.values()) == [1, 2]


def test_rrf_fuse_requires_two_systems(spark):
    a = spark.createDataFrame([(0, 1, 1)], ["query_id", "doc_id", "rank"])
    with pytest.raises(ValueError):
        search.rrf_fuse([a])


def test_tfidf_keywords_matches_reference(spark):
    """Scores equal the smoothed tf-idf formula; rare terms outrank
    common ones; ranks restart per doc; tie-break on token."""
    import math
    from collections import Counter

    docs = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry date date date"),
    ]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    got = {}
    for r in search.tfidf_keywords(df, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["token"], r["score"]))
    N, dfreq, toks = 3, Counter(), {}
    for i, t in docs:
        ws = t.split()
        toks[i] = ws
        for w in set(ws):
            dfreq[w] += 1
    for i, ws in toks.items():
        c = Counter(ws)
        scores = sorted(
            (
                (round(c[w] / len(ws) * (math.log((N + 1) / (dfreq[w] + 1)) + 1), 6), w)
                for w in c
            ),
            key=lambda x: (-x[0], x[1]),
        )
        assert sorted(got[i]) == [(r + 1, w, s) for r, (s, w) in enumerate(scores[:2])]
    with pytest.raises(ValueError, match="k must be"):
        search.tfidf_keywords(df, k=0)


def test_rank_eval_hand_computed_metrics(spark):
    """P@k / R@k / MRR / nDCG@k against a fully hand-computed case,
    including an unjudged retrieved doc, a relevant-but-missed doc, a
    query with no positive judgments, and one never retrieved."""
    import math

    from getl_spark.functions import search

    results = spark.createDataFrame(
        [  # query 0: d4 (unjudged), d1 (rel 3), d3 (rel 2)
            (0, "d4", 1), (0, "d1", 2), (0, "d3", 3),
            # query 1: retrieves docs but has no positive judgments
            (1, "d1", 1), (1, "d2", 2),
            # rank 4 rows must be ignored at k=3
            (0, "d2", 4),
        ],
        "query_id INT, doc_id STRING, rank INT",
    )
    qrels = spark.createDataFrame(
        [
            (0, "d1", 3), (0, "d2", 1), (0, "d3", 2),
            (1, "d9", 0),          # judged non-relevant only
            (2, "d1", 2),          # query never retrieved
            # duplicate judgment collapses to max
            (0, "d1", 1),
        ],
        "query_id INT, doc_id STRING, rel INT",
    )
    rows = {
        r["query_id"]: r
        for r in search.rank_eval(results, qrels, k=3).collect()
    }
    q0 = rows[0]
    assert (q0["n_rel"], q0["n_retrieved"]) == (3, 3)
    assert q0["precision_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert q0["recall_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert q0["reciprocal_rank"] == pytest.approx(1 / 2, abs=1e-6)
    dcg = (2**3 - 1) / math.log2(3) + (2**2 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (
        2**1 - 1
    ) / math.log2(4)
    assert q0["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-6)
    q1 = rows[1]
    assert (q1["n_rel"], q1["n_retrieved"]) == (0, 2)
    assert q1["precision_at_k"] == 0.0
    assert q1["recall_at_k"] is None and q1["ndcg_at_k"] is None
    assert q1["reciprocal_rank"] == 0.0
    q2 = rows[2]
    assert (q2["n_rel"], q2["n_retrieved"]) == (1, 0)
    assert q2["precision_at_k"] == 0.0
    assert q2["recall_at_k"] == 0.0
    assert q2["reciprocal_rank"] == 0.0
    assert q2["ndcg_at_k"] == 0.0  # idcg > 0, dcg 0


def test_rank_eval_perfect_ranking_and_guard(spark):
    from getl_spark.functions import search

    results = spark.createDataFrame(
        [(0, "a", 1), (0, "b", 2)], "query_id INT, doc_id STRING, rank INT"
    )
    qrels = spark.createDataFrame(
        [(0, "a", 2), (0, "b", 1)], "query_id INT, doc_id STRING, rel INT"
    )
    r = search.rank_eval(results, qrels, k=2).collect()[0]
    assert r["ndcg_at_k"] == 1.0
    assert r["precision_at_k"] == 1.0 and r["recall_at_k"] == 1.0
    assert r["reciprocal_rank"] == 1.0
    bad = spark.createDataFrame(
        [(0, "a", -1)], "query_id INT, doc_id STRING, rel INT"
    )
    with pytest.raises(Exception):
        search.rank_eval(results, bad, k=2).collect()


def test_rank_eval_judges_bm25(spark):
    """End-to-end: rank bm25_topk against term-presence judgments —
    every doc containing the single-term query is relevant, so BM25
    (which only scores term matches) must post recall ≤ 1 with
    precision consistent with its hit count."""
    from pyspark.sql import functions as F

    from getl_spark.functions import search

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across the cluster"),
            (2, "spark spark spark tuning guide"),
            (3, "duckdb runs on one node"),
            (4, "the cluster schedules spark executors"),
            (5, "pandas is single machine"),
        ],
        "doc_id INT, text STRING",
    )
    results = search.bm25_topk(docs, ["spark"], k=3)
    qrels = docs.select(
        F.lit(0).alias("query_id"),
        "doc_id",
        F.when(F.col("text").contains("spark"), 1).otherwise(0).alias("rel"),
    )
    r = search.rank_eval(results, qrels, k=3).collect()[0]
    assert r["n_rel"] == 3 and r["n_retrieved"] == 3
    assert r["precision_at_k"] == 1.0 and r["recall_at_k"] == 1.0
    assert r["reciprocal_rank"] == 1.0 and r["ndcg_at_k"] == 1.0


def test_rank_eval_null_rel_dropped(spark):
    """A NULL relevance grade is an unjudged row, not a job abort:
    the guard must attach AFTER the null filter (assert_true throws
    on NULL conditions), and metrics equal those with the row
    removed."""
    from getl_spark.functions import search

    results = spark.createDataFrame(
        [(0, "a", 1), (0, "b", 2)], "query_id INT, doc_id STRING, rank INT"
    )
    qrels_null = spark.createDataFrame(
        [(0, "a", 2), (0, "b", None), (0, "c", 1)],
        "query_id INT, doc_id STRING, rel INT",
    )
    qrels_clean = spark.createDataFrame(
        [(0, "a", 2), (0, "c", 1)], "query_id INT, doc_id STRING, rel INT"
    )
    got = search.rank_eval(results, qrels_null, k=2).collect()
    want = search.rank_eval(results, qrels_clean, k=2).collect()
    assert got == want
