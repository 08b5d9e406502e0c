"""Embedding utilities: numpy-differential normalize/quantize, chunking
edge cases."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from getl_spark.functions import embedding, text


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(42)
    rows = [(i, rng.randn(8).astype("float32").tolist()) for i in range(20)]
    rows.append((20, [0.0] * 8))  # zero vector
    rows.append((21, None))  # null vector
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


def test_l2_normalize_matches_numpy(spark, vecs):
    out = {r.vec_id: r.embedding for r in embedding.l2_normalize(vecs).collect()}
    src = {r.vec_id: r.embedding for r in vecs.collect()}
    for vid, v in src.items():
        if v is None:
            assert out[vid] is None
            continue
        arr = np.array(v, dtype="float64")
        n = np.linalg.norm(arr)
        expected = arr / n if n > 0 else arr
        np.testing.assert_allclose(out[vid], expected, rtol=1e-6)


def test_l2_normalize_unit_norms(spark, vecs):
    normed = embedding.l2_normalize(vecs.where("vec_id < 20"))
    stats = embedding.norm_stats(normed).first()
    assert stats.min_norm == pytest.approx(1.0, abs=1e-3)
    assert stats.max_norm == pytest.approx(1.0, abs=1e-3)


def test_quantize_roundtrip_error_bound(spark, vecs):
    q = embedding.quantize_int8(vecs.where("vec_id < 20"))
    deq = embedding.dequantize_int8(q, new_col="recon")
    for r in deq.collect():
        orig = np.array(r.embedding, dtype="float64")
        recon = np.array(r.recon, dtype="float64")
        scale = r.q_scale
        assert np.all(np.abs(orig - recon) <= scale / 2 + 1e-9)
        assert all(-127 <= c <= 127 for c in r.q_vec)


def test_quantize_zero_vector(spark, vecs):
    r = embedding.quantize_int8(vecs.where("vec_id = 20")).first()
    assert r.q_scale == 0.0
    assert list(r.q_vec) == [0] * 8


def test_norm_stats_shape(spark, vecs):
    r = embedding.norm_stats(vecs).first()
    assert r.n_vectors == 21  # null vector excluded
    assert r.min_dim == r.max_dim == 8
    assert r.min_norm == 0.0  # the zero vector


# ------------------------------------------------------------- chunking
def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id BIGINT, text STRING")
    out = text.chunk(df, chunk_tokens=10, overlap=2).collect()
    assert len(out) == 1
    assert out[0].chunk_idx == 0 and out[0].chunk_text == "a b c"


def test_chunk_overlap_windows_cover_all_tokens(spark):
    words = [f"w{i}" for i in range(25)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id BIGINT, text STRING")
    out = sorted(
        text.chunk(df, chunk_tokens=10, overlap=4).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 6: ceil((25-10)/6)+1 = 4 chunks
    assert len(out) == 4
    assert out[0].chunk_text.split() == words[0:10]
    assert out[1].chunk_text.split() == words[6:16]
    assert out[3].chunk_text.split() == words[18:25]
    covered = set()
    for r in out:
        covered.update(r.chunk_text.split())
    assert covered == set(words)


def test_chunk_empty_and_null_dropped(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, ""), (3, None), (4, "   ")],
        "doc_id BIGINT, text STRING",
    )
    out = text.chunk(df, chunk_tokens=4, overlap=1).collect()
    assert [r.doc_id for r in out] == [1]


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError, match="overlap"):
        text.chunk(df, chunk_tokens=8, overlap=8)


# --------------------------------------------------------- hash_embed
def test_hash_embed_shape_norm_determinism(spark):
    from getl_spark.functions import embedding as E

    df = spark.createDataFrame(
        [(0, "spark shuffles data between stages"),
         (1, "spark shuffles data between stages"),
         (2, "an entirely different sentence about cats")],
        "doc_id BIGINT, text STRING",
    )
    out = E.hash_embed(df, dim=64).collect()
    vecs = {r.doc_id: r.embedding for r in out}
    assert all(len(v) == 64 for v in vecs.values())
    import math
    for v in vecs.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5
    # identical text -> identical vector (deterministic, content-only)
    assert vecs[0] == vecs[1]
    assert vecs[0] != vecs[2]


def test_hash_embed_similarity_orders_correctly(spark):
    from getl_spark.functions import embedding as E

    base = "the training corpus needs deduplication before tokenization"
    df = spark.createDataFrame(
        [(0, base),
         (1, base + " today"),                      # near-dup of 0
         (2, "unrelated weather forecast for the alpine region tomorrow")],
        "doc_id BIGINT, text STRING",
    )
    vecs = {r.doc_id: r.embedding for r in E.hash_embed(df, dim=128).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(vecs[0], vecs[1]) > 0.8
    assert cos(vecs[0], vecs[1]) > cos(vecs[0], vecs[2])


def test_hash_embed_feeds_embedding_cosine_pairs(spark):
    """Planted near-identical pairs must surface through the full
    hash_embed → embedding_cosine_pairs pipeline, and unrelated docs
    must not."""
    from getl_spark.functions import dedup
    from getl_spark.functions import embedding as E

    texts = [
        "spark executes declarative plans through catalyst and tungsten stages",
        "training corpora require deduplication quality filtering and packing",
        "file registries track which deliveries were already ingested downstream",
    ]
    rows = []
    for i, t in enumerate(texts):
        rows.append((i, t + " alpha beta gamma delta epsilon zeta"))
        rows.append((100 + i, t + " alpha beta gamma delta epsilon eta"))  # near-dup
    rows.append((900, "completely disjoint vocabulary about mountain weather patterns"))
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    emb = E.hash_embed(docs, dim=256).withColumnRenamed("doc_id", "vec_id")
    got = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(
            emb, threshold=0.9, brute_force=True
        ).collect()
    }
    assert {(i, 100 + i) for i in range(3)} <= got
    assert all(900 not in p for p in got)


def test_hash_embed_empty_and_null_docs_become_zero_vectors(spark):
    from getl_spark.functions import embedding as E

    df = spark.createDataFrame(
        [(0, "real tokens here"), (1, ""), (2, None), (3, "   ")],
        "doc_id BIGINT, text STRING",
    )
    vecs = {r.doc_id: r.embedding for r in E.hash_embed(df, dim=16).collect()}
    # no doc silently vanishes; token-less docs carry the zero vector
    assert set(vecs) == {0, 1, 2, 3}
    for d in (1, 2, 3):
        assert all(x == 0.0 for x in vecs[d])
    assert any(x != 0.0 for x in vecs[0])


def _toy_vectors(spark, n=300, d=12, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    # anisotropic cloud: variance concentrated in a few directions
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.array([5.0, 3.0, 2.0] + [0.3] * (d - 3))
    X = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    return X, spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


def test_fit_pca_matches_numpy_reference(spark):
    import numpy as np

    from getl_spark.functions import embedding as E

    X, df = _toy_vectors(spark)
    model = E.fit_pca(df.repartition(7), "embedding", k=4)
    mean = X.mean(axis=0)
    cov = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    W = evecs[:, order].T
    top = np.abs(W).argmax(axis=1)
    s = np.sign(W[np.arange(4), top])
    s[s == 0] = 1
    W = W * s[:, None]
    assert np.allclose(np.array(model.mean), mean, atol=1e-9)
    assert np.allclose(np.array(model.components), W, atol=1e-7)
    # variance ratios descending, dominated by the 3 planted directions
    evr = model.explained_variance_ratio
    assert all(a >= b for a, b in zip(evr, evr[1:]))
    assert sum(evr[:3]) > 0.9


def test_fit_pca_partition_invariant(spark):
    import numpy as np

    from getl_spark.functions import embedding as E

    _, df = _toy_vectors(spark, n=200, seed=1)
    m1 = E.fit_pca(df.coalesce(1), "embedding", k=3)
    m2 = E.fit_pca(df.repartition(13), "embedding", k=3)
    assert np.allclose(np.array(m1.components), np.array(m2.components), atol=1e-9)
    assert np.allclose(np.array(m1.mean), np.array(m2.mean), atol=1e-12)


def test_pca_project_matches_numpy_and_handles_null(spark):
    import numpy as np

    from getl_spark.functions import embedding as E

    X, df = _toy_vectors(spark, n=150, seed=2)
    model = E.fit_pca(df, "embedding", k=3)
    with_null = df.unionByName(
        spark.createDataFrame([(9999, None)], df.schema)
    )
    proj = E.pca_project(with_null, model, "embedding")
    rows = {r.vec_id: r.pca_vec for r in proj.collect()}
    assert rows[9999] is None
    ref = (X - np.array(model.mean)) @ np.array(model.components).T
    got = np.stack([rows[i] for i in range(len(X))])
    assert np.allclose(got, ref, atol=1e-8)


def test_pca_project_is_pure_projection_no_shuffle(spark):
    from getl_spark.functions import embedding as E

    _, df = _toy_vectors(spark, n=50, seed=3)
    model = E.fit_pca(df, "embedding", k=2)
    plan = E.pca_project(df, model, "embedding")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan-side expression only


def test_fit_pca_validation(spark):
    from getl_spark.functions import embedding as E

    _, df = _toy_vectors(spark, n=20, d=5, seed=4)
    with pytest.raises(ValueError):
        E.fit_pca(df, "embedding", k=6)  # k > d
    import pyspark.sql.functions as SF

    empty = df.where(SF.lit(False))
    with pytest.raises(ValueError):
        E.fit_pca(empty, "embedding", k=2)


def _pq_corpus(spark, noise=0.8, per=20, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(5, 16)) * 3
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per):
            rows.append((vid, [float(x) for x in c + rng.normal(size=16) * noise]))
            vid += 1
    return embedding.l2_normalize(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )


def test_pq_roundtrip_error_shrinks_with_k(spark):
    df = _pq_corpus(spark)

    def rel_err(k):
        model = embedding.train_pq(df, m=8, k=k, seed=1)
        rec = embedding.pq_decode(
            embedding.pq_encode(df, model), model, new_col="recon"
        )
        return rec.selectExpr(
            "avg(sqrt(aggregate(zip_with(embedding, recon, (a,b)->(a-b)*(a-b)),"
            " 0D, (s,x)->s+x))) AS e"
        ).first()[0]

    e4, e32 = rel_err(4), rel_err(32)
    assert e32 < e4  # more centroids, less residual
    assert e32 < 0.1  # unit vectors: residual well under 10% of norm


def test_pq_codes_shape_null_and_determinism(spark):
    df = _pq_corpus(spark, per=8)
    model = embedding.train_pq(df, m=8, k=16, seed=2)
    with_null = df.unionByName(
        spark.createDataFrame([(999, None)], df.schema)
    )
    codes = {r.vec_id: r.pq_code for r in embedding.pq_encode(with_null, model).collect()}
    assert codes[999] is None
    assert all(len(c) == 8 and all(0 <= b < 16 for b in c) for i, c in codes.items() if i != 999)
    again = {r.vec_id: r.pq_code for r in embedding.pq_encode(with_null, model).collect()}
    assert codes == again
    decoded = {
        r.vec_id: r.recon
        for r in embedding.pq_decode(
            embedding.pq_encode(with_null, model), model, new_col="recon"
        ).collect()
    }
    assert decoded[999] is None and len(decoded[0]) == 16


def test_topk_pq_rerank_matches_bruteforce(spark):
    from getl_spark.functions import similarity

    df = _pq_corpus(spark)
    model = embedding.train_pq(df, m=8, k=16, seed=1)
    codes = embedding.pq_encode(df, model)
    q = df.where("vec_id in (0, 20, 40)")
    brute = {(r.query_id, r.nbr_id): r.cosine for r in similarity.topk_bruteforce(df, q, k=5).collect()}
    reranked = {
        (r.query_id, r.nbr_id): r.score
        for r in similarity.topk_pq(codes, q, model, k=5, rerank=df).collect()
    }
    hits = set(brute) & set(reranked)
    assert len(hits) / len(brute) >= 0.9
    # re-ranked scores ARE exact cosines
    assert all(abs(brute[p] - reranked[p]) < 1e-9 for p in hits)


def test_topk_pq_adc_shortlist_recall(spark):
    """Raw ADC at 4x shortlist contains (nearly) all true top-k — the
    property the rerank path relies on."""
    from getl_spark.functions import similarity

    df = _pq_corpus(spark)
    model = embedding.train_pq(df, m=8, k=16, seed=1)
    codes = embedding.pq_encode(df, model)
    q = df.where("vec_id in (0, 20, 40)")
    brute = {(r.query_id, r.nbr_id) for r in similarity.topk_bruteforce(df, q, k=5).collect()}
    shortlist = {
        (r.query_id, r.nbr_id)
        for r in similarity.topk_pq(codes, q, model, k=20).collect()
    }
    assert len(brute & shortlist) / len(brute) >= 0.9


def test_pq_validation(spark):
    from getl_spark.functions import similarity

    df = _pq_corpus(spark, per=8)
    with pytest.raises(ValueError):
        embedding.train_pq(df, m=5, k=8)  # 16 % 5 != 0
    with pytest.raises(ValueError):
        embedding.train_pq(df, m=8, k=300)  # codes are bytes
    with pytest.raises(ValueError):
        embedding.train_pq(df.where("vec_id < 4"), m=8, k=16)  # < k samples
    model = embedding.train_pq(df, m=8, k=8, seed=1)
    codes = embedding.pq_encode(df, model)
    bad_q = spark.createDataFrame([(1, [0.0] * 8)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        similarity.topk_pq(codes, bad_q, model)  # dim mismatch
    with pytest.raises(ValueError):
        similarity.topk_pq(codes, df.where("vec_id < 0"), model)  # empty queries


def test_train_pq_rejects_signed_byte_overflow(spark):
    """Codes are SIGNED bytes — k in (128, 256] would wrap negative and
    silently corrupt ADC scoring, so it must be rejected up front."""
    df = _pq_corpus(spark, per=40)
    with pytest.raises(ValueError, match="SIGNED"):
        embedding.train_pq(df, m=8, k=129)
    # k=128 is the legal maximum
    model = embedding.train_pq(df, m=8, k=128, seed=1)
    codes = embedding.pq_encode(df, model)
    assert all(
        0 <= b < 128 for r in codes.limit(5).collect() for b in r.pq_code
    )


def test_procrustes_recovers_planted_transform(spark):
    """Plant new = (old @ Q0)·a + b with a known orthogonal Q0: the
    fit must invert it (rotation ≈ Q0ᵀ, scale ≈ 1/a) and the applied
    alignment must land back on the old vectors with rmse ≈ 0."""
    import numpy as np

    from getl_spark.functions import embedding as E

    X, old = _toy_vectors(spark, n=220, d=10, seed=7)
    rng = np.random.default_rng(11)
    q0 = np.linalg.qr(rng.normal(size=(10, 10)))[0]
    a, b = 0.6, rng.normal(size=10)
    Y = (X @ q0) * a + b
    new = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(Y)],
        "vec_id long, embedding array<double>",
    )
    m = E.procrustes_fit(old, new)
    assert m.n_anchors == 220
    assert m.rmse < 1e-9
    assert abs(m.scale - 1 / a) < 1e-9
    assert np.allclose(np.array(m.rotation), q0.T, atol=1e-8)
    # columns orthonormal
    R = np.array(m.rotation)
    assert np.allclose(R.T @ R, np.eye(10), atol=1e-9)

    aligned = E.procrustes_apply(new, m, "embedding")
    got = {r.vec_id: r.aligned for r in aligned.collect()}
    assert np.allclose(
        np.stack([got[i] for i in range(len(X))]), X, atol=1e-8
    )

    # apply is scan-side: no exchange in the plan
    plan = (
        E.procrustes_apply(new, m, "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan

    # NULL passthrough + dim-mismatch loud
    with_null = new.unionByName(
        spark.createDataFrame([(9999, None)], new.schema)
    )
    rows = {r.vec_id: r.aligned for r in E.procrustes_apply(with_null, m).collect()}
    assert rows[9999] is None
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="model dim"):
        E.procrustes_apply(bad, m).collect()


def test_procrustes_partial_anchors_noise_and_rectangular(spark):
    """Real migration shape: only SOME ids overlap (the join defines
    the anchors), the new space carries noise (rmse > 0 but the
    recovered rotation still beats identity), and a rectangular map
    (d_src > d_dst) keeps orthonormal COLUMNS. Partition invariance
    like fit_pca."""
    import numpy as np

    from getl_spark.functions import embedding as E

    X, old = _toy_vectors(spark, n=300, d=8, seed=21)
    rng = np.random.default_rng(22)
    q0 = np.linalg.qr(rng.normal(size=(8, 8)))[0]
    Y = X @ q0 + rng.normal(size=X.shape) * 0.01
    new = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(Y)],
        "vec_id long, embedding array<double>",
    )
    # anchors = even ids only; odd ids exist only in new
    m = E.procrustes_fit(old.where("vec_id % 2 = 0"), new, with_scale=False)
    assert m.n_anchors == 150 and m.scale == 1.0
    assert 0 < m.rmse < 0.1
    assert np.allclose(np.array(m.rotation), q0.T, atol=0.05)

    # partition invariance
    m2 = E.procrustes_fit(
        old.where("vec_id % 2 = 0").repartition(13), new.repartition(7),
        with_scale=False,
    )
    assert np.allclose(np.array(m.rotation), np.array(m2.rotation), atol=1e-7)

    # rectangular: old space is the first 4 PCA-ish dims
    old4 = spark.createDataFrame(
        [(i, [float(v) for v in row[:4]]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    mr = E.procrustes_fit(old4, new)
    R = np.array(mr.rotation)
    assert R.shape == (8, 4)
    assert np.allclose(R.T @ R, np.eye(4), atol=1e-8)
    out = E.procrustes_apply(new.limit(5), mr).collect()
    assert all(len(r.aligned) == 4 for r in out)

    # guards: empty anchor join; single point
    with pytest.raises(ValueError, match="anchor"):
        E.procrustes_fit(old.where("vec_id < 0"), new)
    with pytest.raises(ValueError, match="2 anchors"):
        E.procrustes_fit(old.where("vec_id = 0"), new)


def test_pca_project_rejects_dim_mismatch(spark):
    from getl_spark.functions import embedding as E

    _, df = _toy_vectors(spark, n=30, d=12, seed=6)
    model = E.fit_pca(df, "embedding", k=2)
    bad = spark.createDataFrame(
        [(1, [0.0] * 5)], "vec_id long, embedding array<double>"
    )
    import py4j.protocol

    with pytest.raises(Exception, match="pca_project: model dim"):
        E.pca_project(bad, model, "embedding").collect()


# ------------------------------------------------------------- kmeans
def test_kmeans_fit_recovers_planted_clusters(spark):
    """Six axis-aligned clusters: the fitted centroids must point at
    the axes (one cluster per centroid at k=6) and assignment must
    equal the planted cluster id mapping, matching a numpy argmax."""
    import numpy as np

    rows = [
        (
            i,
            [
                (10.0 if j == i % 6 else 0.0) + ((i * 7 + j * 3) % 5 - 2) / 10.0
                for j in range(8)
            ],
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # seed chosen so the seeded init recovers the planted optimum
    model = embedding.kmeans_fit(df, k=6, seed=0)
    assert model["k"] == 6 and model["dim"] == 8 and model["metric"] == "cosine"
    # JSON round-trip: the model is a plain dict
    import json

    model = json.loads(json.dumps(model))
    out = {r.vec_id: r.cell for r in embedding.kmeans_assign(df, model).collect()}
    cent = np.array(model["centroids"])
    # each centroid points at exactly one axis; assignment groups by i%6
    by_axis = {}
    for i, v in rows:
        exp_cell = int(np.argmax(cent @ (np.array(v) / np.linalg.norm(v))))
        assert out[i] == exp_cell
        by_axis.setdefault(i % 6, set()).add(out[i])
    assert all(len(cells) == 1 for cells in by_axis.values())
    assert len({next(iter(c)) for c in by_axis.values()}) == 6


def test_kmeans_assign_nassign_nulls_and_validation(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.6, 0.8]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    model = {"centroids": [[1.0, 0.0], [0.0, 1.0]], "k": 2, "dim": 2}
    out = {r.vec_id: r.cell for r in
           embedding.kmeans_assign(df, model, nassign=2).collect()}
    assert out[1] == [0, 1] and out[2] == [1, 0]
    assert out[3] is None
    with pytest.raises(ValueError):
        embedding.kmeans_assign(df, {"centroids": []})
    with pytest.raises(ValueError):
        embedding.kmeans_assign(df, model, nassign=0)
    with pytest.raises(ValueError):
        embedding.kmeans_fit(df, k=0)


def test_kmeans_assign_no_shuffle_no_udf(spark):
    """Assignment is pure scan-side JVM work."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    model = {"centroids": [[1.0, 0.0], [0.0, 1.0]]}
    plan = (
        embedding.kmeans_assign(df, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_kmeans_stats_health_summary(spark):
    """Axis clusters against axis centroids: every cell is fully
    occupied with near-1 mean cosine; a deliberately missing axis
    leaves its cell absent; null vectors are skipped."""
    import pytest

    rows = [
        (
            i,
            [
                (10.0 if j == i % 4 else 0.0) + ((i * 7 + j * 3) % 5 - 2) / 10.0
                for j in range(8)
            ],
        )
        for i in range(40)
    ] + [(99, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = {
        "centroids": [[1.0 if j == c else 0.0 for j in range(8)] for c in range(5)]
    }
    out = {r.cell: r for r in embedding.kmeans_stats(df, model).collect()}
    assert set(out) == {0, 1, 2, 3}       # axis 4 centroid got nothing
    assert sum(r.n_vectors for r in out.values()) == 40
    for r in out.values():
        assert r.mean_cosine > 0.99 and r.min_cosine > 0.99
    with pytest.raises(ValueError):
        embedding.kmeans_stats(df, {"centroids": []})


def test_random_projection_matches_reference_and_jl(spark):
    """md5-path projection equals the hand-derived sign fold; xxhash64
    path has the same shape/scale; null vectors stay null; distance
    structure survives (loose JL check)."""
    import hashlib

    import numpy as np

    from getl_spark.functions import embedding

    rng = np.random.RandomState(11)
    vecs = rng.randn(30, 24)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows + [(99, None)], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    out = {
        r["vec_id"]: r["proj"]
        for r in embedding.random_projection(
            df, out_dim=8, hash_fn="md5"
        ).collect()
    }
    assert out[99] is None

    def sign(i, j):
        h = hashlib.md5(f"42:{i}:{j}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) % 2 == 0 else -1.0

    vec0 = [float(np.float32(x)) for x in vecs[0]]
    for j in range(8):
        acc = 0.0
        for i, x in enumerate(vec0):
            acc += x * sign(i, j)
        assert out[0][j] == pytest.approx(round(acc / 8**0.5, 6))

    # loose JL sanity: projected pairwise distances correlate with the
    # originals
    P = np.array([out[i] for i in range(30)])
    d_hi = np.linalg.norm(vecs[:, None] - vecs[None, :], axis=2)
    d_lo = np.linalg.norm(P[:, None] - P[None, :], axis=2)
    iu = np.triu_indices(30, 1)
    assert np.corrcoef(d_hi[iu], d_lo[iu])[0, 1] > 0.4

    fast = embedding.random_projection(df, out_dim=8).collect()
    assert all(r["proj"] is None or len(r["proj"]) == 8 for r in fast)
    with pytest.raises(ValueError, match="out_dim"):
        embedding.random_projection(df, out_dim=0)
    with pytest.raises(ValueError, match="hash_fn"):
        embedding.random_projection(df, hash_fn="sha")


# --------------------------------------------------------------- drift
def test_drift_matches_numpy_and_finds_shifted_dim(spark):
    import numpy as np

    from getl_spark.functions import embedding as E

    rng = np.random.RandomState(9)
    base = rng.randn(200, 8).astype(np.float64)
    shifted = rng.randn(150, 8).astype(np.float64)
    shifted[:, 3] += 2.0  # dimension 3 drifts
    l = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(base)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    r = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(shifted)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = {row.dim: row for row in E.drift(l, r).collect()}
    assert len(out) == 8
    for d in range(8):
        ml, mr = base[:, d].mean(), shifted[:, d].mean()
        vl = base[:, d].var(ddof=1)
        vr = shifted[:, d].var(ddof=1)
        row = out[d]
        assert row.n_left == 200 and row.n_right == 150
        assert abs(row.mean_left - ml) < 1e-6 and abs(row.mean_right - mr) < 1e-6
        assert abs(row.smd - (mr - ml) / np.sqrt((vl + vr) / 2)) < 1e-5
    movers = sorted(out.values(), key=lambda r: -abs(r.smd))
    assert movers[0].dim == 3 and abs(movers[0].smd) > 1.5
    assert all(abs(m.smd) < 0.5 for m in movers[1:])


def test_drift_null_vectors_and_zero_variance(spark):
    from getl_spark.functions import embedding as E

    l = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, 7.0]), (3, None)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    r = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 4.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = {row.dim: row for row in E.drift(l, r).collect()}
    assert out[0].n_left == 2  # null vector excluded
    assert out[0].smd is None  # both sides constant on dim 0
    assert out[1].smd is not None and out[1].smd < 0


def test_outlier_score_mahalanobis(spark):
    """Mahalanobis² in the PCA basis vs a numpy reference; planted
    off-manifold outlier dominates; residual score catches the
    direction a reduced basis projects away; NULL passthrough; old
    models fail loud; zero JVM->Python in the plan."""
    import numpy as np

    from getl_spark.functions import embedding as E

    rng = np.random.default_rng(11)
    # anisotropic cloud in 6d: big variance on axes 0-2, tiny on 3-5
    base = rng.normal(0, [5.0, 4.0, 3.0, 0.05, 0.04, 0.03], (400, 6))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    # outlier: modest step, but along a TINY-variance axis
    rows.append((999, [0.0, 0.0, 0.0, 2.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    model = E.fit_pca(df, k=3)
    out = {
        r.vec_id: r
        for r in E.outlier_score(
            df, model, resid_col="resid_score"
        ).collect()
    }

    # numpy reference on a few rows
    mean = np.array(model.mean)
    W = np.array(model.components)          # (3, 6)
    lam = np.array(model.variances)
    x = np.vstack([base, [[0.0, 0.0, 0.0, 2.0, 0.0, 0.0]]])
    y = (x - mean) @ W.T
    maha = (y * y / lam).sum(axis=1)
    resid_lam = (model.total_variance - lam.sum()) / 3
    resid = ((x - mean) ** 2).sum(axis=1) - (y * y).sum(axis=1)
    resid = np.clip(resid, 0, None) / resid_lam
    for i in (0, 1, 2, 50, 399):
        assert out[i].outlier_score == pytest.approx(maha[i], rel=1e-4, abs=1e-4)
        assert out[i].resid_score == pytest.approx(resid[i], rel=1e-4, abs=1e-4)

    # the off-manifold outlier: tiny Mahalanobis in the top-3 basis
    # (axes 0-2) but residual score far beyond every inlier
    inlier_resid = max(out[i].resid_score for i in range(400))
    assert out[999].resid_score > inlier_resid * 5
    assert out[999].resid_score == pytest.approx(resid[-1], rel=1e-4)

    # NULL vector scores NULL
    nd = spark.createDataFrame(
        [(1, None)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    r = E.outlier_score(nd, model, resid_col="rs").collect()[0]
    assert r.outlier_score is None and r.rs is None

    # model without variances (pre-upgrade pickle) fails loud
    legacy = E.PCAModel(model.mean, model.components,
                        model.explained_variance_ratio)
    with pytest.raises(ValueError, match="variances"):
        E.outlier_score(df, legacy)

    # plan stays JVM-only: no BatchEvalPython / ArrowEvalPython
    plan = E.outlier_score(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_diversity_mean_pairwise_cos(spark):
    """Closed form vs a brute-force numpy all-pairs mean; tight
    cluster vs spread-out set; normalize=False dot semantics; zero/
    NULL exclusion; n<2 NULL; ragged-dims loud-fail; grouped."""
    import numpy as np

    from getl_spark.functions import embedding as E

    rng = np.random.default_rng(7)

    def brute(vecs, normalize=True):
        m = np.asarray(vecs, dtype=np.float64)
        if normalize:
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
        g = m @ m.T
        n = len(m)
        return (g.sum() - np.trace(g)) / (n * (n - 1))

    tight = (rng.normal(0, 0.05, (40, 8)) + np.array([1.0] * 8)).tolist()
    spread = rng.normal(0, 1.0, (40, 8)).tolist()

    for vecs, lo, hi in ((tight, 0.95, 1.0), (spread, -0.2, 0.2)):
        df = spark.createDataFrame(
            [(v,) for v in vecs], "embedding ARRAY<DOUBLE>"
        )
        r = E.diversity(df).collect()[0]
        assert r.n_vectors == 40
        assert r.mean_pairwise_cos == pytest.approx(brute(vecs), abs=1e-6)
        assert lo < r.mean_pairwise_cos < hi
        assert r.diversity == pytest.approx(1 - r.mean_pairwise_cos, abs=1e-6)

    # normalize=False: mean pairwise dot
    df = spark.createDataFrame([(v,) for v in spread], "embedding ARRAY<DOUBLE>")
    r = E.diversity(df, normalize=False).collect()[0]
    assert r.mean_pairwise_cos == pytest.approx(brute(spread, False), abs=1e-6)

    # zero vector excluded under normalize; NULL always excluded
    withjunk = [([1.0, 0.0],), ([0.0, 1.0],), ([0.0, 0.0],), (None,)]
    df = spark.createDataFrame(withjunk, "embedding ARRAY<DOUBLE>")
    r = E.diversity(df).collect()[0]
    assert r.n_vectors == 2 and r.mean_pairwise_cos == 0.0

    # n < 2 -> NULL stats
    df = spark.createDataFrame([([1.0, 2.0],)], "embedding ARRAY<DOUBLE>")
    r = E.diversity(df).collect()[0]
    assert r.mean_pairwise_cos is None and r.n_vectors == 1

    # ragged dims fail loud
    df = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 2.0, 3.0],)], "embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(Exception, match="ragged"):
        E.diversity(df).collect()

    # grouped: per-cluster cohesion
    rows = [("t", v) for v in tight] + [("s", v) for v in spread]
    df = spark.createDataFrame(rows, "g STRING, embedding ARRAY<DOUBLE>")
    out = {r.g: r.mean_pairwise_cos for r in E.diversity(df, group_by="g").collect()}
    assert out["t"] == pytest.approx(brute(tight), abs=1e-6)
    assert out["s"] == pytest.approx(brute(spread), abs=1e-6)


def test_truncate_matryoshka(spark):
    """Prefix slice semantics, renormalize, NULL passthrough, short
    vector loud-fail; truncated-dims retrieval keeps high recall on a
    structured corpus (the MRL evaluation loop end-to-end)."""
    import numpy as np

    from getl_spark.functions import embedding as E
    from getl_spark.functions import similarity

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0, 100.0]), (2, None)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = {r.vec_id: r.embedding for r in E.truncate(df, 2).collect()}
    assert out[1] == [3.0, 4.0] and out[2] is None

    rn = {r.vec_id: r.embedding
          for r in E.truncate(df, 2, renormalize=True).collect()}
    assert rn[1] == pytest.approx([0.6, 0.8]) and rn[2] is None

    short = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(Exception, match="shorter"):
        E.truncate(short, 3).collect()
    with pytest.raises(ValueError, match="dims"):
        E.truncate(short, 0)

    # end-to-end: front-loaded vectors keep recall after halving dims
    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, (80, 16))
    base[:, 8:] *= 0.05  # matryoshka-ish: tail dims carry little
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    qs = emb.where(F.col("vec_id") < 10)
    exact = similarity.topk_bruteforce(emb, qs, k=5)
    cheap = similarity.topk_bruteforce(
        E.truncate(emb, 8), E.truncate(qs, 8), k=5
    )
    r = similarity.recall_eval(cheap, exact, k=5).collect()[0]
    assert r.n_queries == 10 and r.missing_queries == 0
    assert r.mean_recall > 0.8


def test_pca_project_whiten_unit_variance(spark):
    import numpy as np

    from getl_spark.functions import embedding as E

    rng = np.random.RandomState(9)
    # anisotropic cloud: variance 25 along axis0-ish, 1 along axis1-ish
    base = rng.randn(200, 3) * np.array([5.0, 1.0, 0.3]) + 2.0
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(base)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    ).repartition(1)
    model = E.fit_pca(df, "embedding", k=2)
    plain = E.pca_project(df, model, "embedding")
    white = E.pca_project(df, model, "embedding", whiten=True)
    p = np.array([r.pca_vec for r in plain.orderBy("vec_id").collect()])
    w = np.array([r.pca_vec for r in white.orderBy("vec_id").collect()])
    # plain projection: component variances match the eigenvalues and
    # are wildly unequal; whitened: every coordinate ~unit variance
    assert p[:, 0].var(ddof=1) / p[:, 1].var(ddof=1) > 10
    assert abs(w[:, 0].var(ddof=1) - 1.0) < 0.05
    assert abs(w[:, 1].var(ddof=1) - 1.0) < 0.05
    # whiten is exactly the plain projection rescaled by 1/sqrt(lambda)
    lam = np.array(model.variances[:2])
    np.testing.assert_allclose(w, p / np.sqrt(lam), rtol=1e-9, atol=1e-9)


def test_pca_project_whiten_guards(spark):
    import numpy as np

    from getl_spark.functions import embedding as E

    rng = np.random.RandomState(4)
    flat = rng.randn(50, 2) @ np.array([[1.0, 1.0], [0.0, 0.0]])  # rank 1
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(flat)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    ).repartition(1)
    model = E.fit_pca(df, "embedding", k=2)
    with pytest.raises(ValueError, match="variance"):
        E.pca_project(df, model, "embedding", whiten=True)
    # a model stripped of variances (older pickled fit) fails loud
    model2 = E.fit_pca(df, "embedding", k=1)
    model2.variances = None
    with pytest.raises(ValueError, match="carrying"):
        E.pca_project(df, model2, "embedding", whiten=True)
