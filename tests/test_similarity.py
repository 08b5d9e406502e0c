

def test_topk_between_cross_table_no_self_exclusion(spark):
    """Cross-table retrieval: overlapping id spaces are unrelated, so
    an identical id on both sides must still match; results equal the
    per-query exact cosine ranking."""
    import numpy as np

    from getl_spark.functions import similarity as S

    rng = np.random.RandomState(17)
    corpus_vecs = rng.randn(30, 8).astype("float64")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus_vecs)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    # query 0 is EXACTLY corpus vector 0 (same id): with self-exclusion
    # off it must be its own top hit at cosine 1.0
    queries = spark.createDataFrame(
        [(0, [float(x) for x in corpus_vecs[0]]),
         (99, [float(x) for x in corpus_vecs[5] + rng.randn(8) * 0.01])],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    out = S.topk_between(queries, corpus, k=3)
    by_query = {}
    for r in out.collect():
        by_query.setdefault(r.query_id, []).append((r.rank, r.nbr_id, r.cosine))
    assert sorted(by_query[0])[0] == (1, 0, 1.0)  # own id matches
    assert sorted(by_query[99])[0][1] == 5        # perturbed copy of 5
    assert all(len(v) == 3 for v in by_query.values())

    # same-corpus topk keeps excluding self matches (unchanged default)
    same = S.topk(corpus, query_ids=[0], k=3)
    assert all(r.nbr_id != 0 for r in same.collect())

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown method"):
        S.topk_between(queries, corpus, method="faiss")


def test_topk_between_lsh_and_ivf_paths(spark):
    import numpy as np

    from getl_spark.functions import similarity as S

    rng = np.random.RandomState(23)
    centers = rng.randn(4, 8) * 3
    rows = []
    vid = 0
    for c in centers:
        for _ in range(15):
            rows.append((vid, [float(x) for x in c + rng.randn(8) * 0.05]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    queries = spark.createDataFrame(
        [(1000 + i, [float(x) for x in centers[i]]) for i in range(4)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    exact = {(r.query_id, r.nbr_id) for r in S.topk_between(queries, corpus, k=5).collect()}
    lsh = {
        (r.query_id, r.nbr_id)
        for r in S.topk_between(queries, corpus, k=5, method="lsh").collect()
    }
    ivf = {
        (r.query_id, r.nbr_id)
        for r in S.topk_between(
            queries, corpus, k=5, method="ivf", nlist=4, nprobe=4
        ).collect()
    }
    assert len(lsh & exact) / len(exact) >= 0.8
    assert ivf == exact  # nprobe == nlist probes everything -> exact
