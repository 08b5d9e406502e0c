"""quality.train_classifier / score / filter_by_score — the learned
quality-filter phase. No SQL oracle exists for L-BFGS training, so
correctness is held by: separable-corpus accuracy, training
determinism, JSON round-trip, a hand-computed sigmoid on pinned
weights, and plan-shape (no Python UDF in the scoring pass)."""

from __future__ import annotations

import json
import math
import random

import pytest

from getl_spark.functions import quality


def _labeled_corpus(spark, n_per_class=60, seed=3):
    rng = random.Random(seed)
    good_vocab = [f"good{i}" for i in range(40)]
    bad_vocab = [f"junk{i}" for i in range(40)]
    rows = []
    for i in range(n_per_class):
        rows.append((i, " ".join(rng.choice(good_vocab) for _ in range(30)), 1.0))
        rows.append(
            (1000 + i, " ".join(rng.choice(bad_vocab) for _ in range(30)), 0.0)
        )
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, label DOUBLE")


def test_classifier_separates_held_out_docs(spark):
    corpus = _labeled_corpus(spark)
    model = quality.train_classifier(corpus, dim=512)
    held_out = spark.createDataFrame(
        [
            (1, "good1 good7 good12 good3 good22 good9"),
            (2, "junk4 junk18 junk2 junk30 junk11 junk5"),
        ],
        "doc_id BIGINT, text STRING",
    )
    scores = {r.doc_id: r.quality_score for r in quality.score(held_out, model).collect()}
    assert scores[1] > 0.9
    assert scores[2] < 0.1


def test_training_is_deterministic(spark):
    corpus = _labeled_corpus(spark, n_per_class=30)
    m1 = quality.train_classifier(corpus, dim=256, max_iter=25)
    m2 = quality.train_classifier(corpus, dim=256, max_iter=25)
    assert m1["intercept"] == pytest.approx(m2["intercept"], abs=1e-9)
    assert m1["weights"] == pytest.approx(m2["weights"], abs=1e-9)


def test_model_json_round_trip_scores_identically(spark):
    corpus = _labeled_corpus(spark, n_per_class=20)
    model = quality.train_classifier(corpus, dim=128, max_iter=20)
    revived = json.loads(json.dumps(model))
    docs = corpus.select("doc_id", "text").limit(10)
    a = sorted(map(tuple, quality.score(docs, model).collect()))
    b = sorted(map(tuple, quality.score(docs, revived).collect()))
    assert a == b


def test_score_matches_hand_computed_sigmoid(spark):
    """Pinned 2-dim model, known token hashing: score must equal
    σ(w·x + b) computed by hand from hash_embed's own features."""
    from getl_spark.functions.embedding import hash_embed

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, None)], "doc_id BIGINT, text STRING"
    )
    feats = {
        r["doc_id"]: r["__feat"]
        for r in hash_embed(
            docs, dim=4, new_col="__feat", normalize=False
        ).collect()
    }
    model = {
        "weights": [0.5, -1.0, 2.0, 0.25],
        "intercept": -0.1,
        "dim": 4,
        "seed": 0,
        "normalize": False,
    }
    got = {r.doc_id: r.quality_score for r in quality.score(docs, model).collect()}
    for doc_id in (1, 2):
        z = sum(w * x for w, x in zip(model["weights"], feats[doc_id])) - 0.1
        assert got[doc_id] == pytest.approx(1.0 / (1.0 + math.exp(-z)), abs=1e-6)
    # empty doc = zero vector → sigma(intercept)
    assert got[2] == pytest.approx(1.0 / (1.0 + math.exp(0.1)), abs=1e-6)


def test_score_plan_is_jvm_only(spark):
    """The corpus scoring pass must not contain a Python UDF node —
    the whole point of the zip_with/aggregate formulation."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id BIGINT, text STRING")
    model = {
        "weights": [0.0] * 8, "intercept": 0.0,
        "dim": 8, "seed": 0, "normalize": True,
    }
    plan = quality.score(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_filter_by_score_thresholds_and_keeps_score(spark):
    corpus = _labeled_corpus(spark, n_per_class=30)
    model = quality.train_classifier(corpus, dim=256, max_iter=25)
    docs = corpus.select("doc_id", "text")
    kept = quality.filter_by_score(docs, model, threshold=0.5, keep_score=True)
    assert "quality_score" in kept.columns
    rows = kept.collect()
    assert 0 < len(rows) < 60  # junk dropped, good retained (30 per class)
    assert all(r.quality_score >= 0.5 for r in rows)
    good_kept = sum(1 for r in rows if r.doc_id < 1000)
    assert good_kept >= 28  # nearly all 30 good docs survive


def test_score_validates_model_dict(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError, match="missing"):
        quality.score(docs, {"weights": [0.0], "dim": 1})
    with pytest.raises(ValueError, match="weights"):
        quality.score(
            docs,
            {"weights": [0.0] * 3, "intercept": 0.0, "dim": 8,
             "seed": 0, "normalize": True},
        )


def test_quality_score_via_yaml_param_injected_model(spark):
    """quality.score as a transform::generic function with the model
    dict injected through ${params} — the documented YAML surface."""
    from getl_spark import lift

    corpus = _labeled_corpus(spark, n_per_class=20)
    model = quality.train_classifier(corpus, dim=128, max_iter=20)
    corpus.select("doc_id", "text").createOrReplaceTempView("qdocs")
    log = lift(
        spark,
        """
LiftJob:
  Docs:
    Type: custom::sql
    Properties: {Statement: "SELECT * FROM qdocs"}
  Scored:
    Type: transform::generic
    Input: Docs
    Properties:
      Functions:
        - quality.filter_by_score:
            model: ${model}
            threshold: 0.5
            keep_score: true
""",
        {"model": model},
    )
    rows = log.get("Scored").collect()
    assert 0 < len(rows) < 40
    assert all(r.quality_score >= 0.5 for r in rows)


def test_filter_by_score_rejects_score_column_collision(spark):
    docs = spark.createDataFrame(
        [(1, "x", 0.9)], "doc_id BIGINT, text STRING, quality_score DOUBLE"
    )
    model = {
        "weights": [0.0] * 8, "intercept": 0.0,
        "dim": 8, "seed": 0, "normalize": True,
    }
    with pytest.raises(ValueError, match="quality_score"):
        quality.filter_by_score(docs, model)


def test_uncertainty_sample_orders_by_boundary_distance(spark):
    """The labeling queue holds the rows nearest 0.5 first, honors the
    margin and the cap, and validates its parameters."""
    import pytest

    from pyspark.sql import functions as F

    from getl_spark.functions import quality

    # train a separable model, then sample near the boundary
    pos = [(i, "good clean prose with real words here") for i in range(10)]
    neg = [(100 + i, "zzz qqq xxx") for i in range(10)]
    labeled = spark.createDataFrame(
        [(i, t, 1.0) for i, t in pos] + [(i, t, 0.0) for i, t in neg],
        "doc_id long, text string, label double",
    )
    model = quality.train_classifier(labeled, dim=64, max_iter=30)

    mixed = spark.createDataFrame(
        [(1, "good clean prose with real words here")]     # confident pos
        + [(2, "zzz qqq xxx")]                             # confident neg
        + [(3, "good clean zzz qqq")]                      # mixed -> uncertain
        + [(4, "prose words xxx qqq")],                    # mixed -> uncertain
        "doc_id long, text string",
    )
    out = quality.uncertainty_sample(mixed, model, margin=0.49, max_rows=2)
    rows = out.collect()
    assert len(rows) == 2
    scored = {
        r.doc_id: r.quality_score
        for r in quality.score(mixed, model).collect()
    }
    want = sorted(scored, key=lambda d: (abs(scored[d] - 0.5), d))[:2]
    assert sorted(r.doc_id for r in rows) == sorted(want)

    with pytest.raises(ValueError, match="margin"):
        quality.uncertainty_sample(mixed, model, margin=0.0)
    with pytest.raises(ValueError, match="max_rows"):
        quality.uncertainty_sample(mixed, model, max_rows=0)
    with pytest.raises(ValueError, match="column"):
        quality.uncertainty_sample(
            mixed.withColumn("quality_score", F.lit(1.0)), model
        )


# ---------------------------------------------------------- platt scaling
def _np_platt(scores, labels, iters=20, smooth=True):
    """Independent numpy Newton reference of the same objective."""
    import numpy as np

    s = np.asarray(scores, dtype=float)
    y = np.asarray(labels, dtype=float)
    n_pos, n_neg = y.sum(), len(y) - y.sum()
    if smooth:
        t = np.where(y > 0.5, (n_pos + 1) / (n_pos + 2), 1.0 / (n_neg + 2))
    else:
        t = y
    a, b = 0.0, np.log((n_pos + 1.0) / (n_neg + 1.0))
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(a * s + b)))
        w = p * (1 - p)
        ga, gb = ((p - t) * s).sum(), (p - t).sum()
        haa, hab, hbb = (w * s * s).sum(), (w * s).sum(), w.sum()
        det = haa * hbb - hab * hab
        if det <= 1e-12:
            break
        a -= (hbb * ga - hab * gb) / det
        b -= (haa * gb - hab * ga) / det
    return a, b


def test_platt_matches_numpy_reference(spark):
    import numpy as np

    rng = np.random.RandomState(4)
    # miscalibrated scores: true p = sigmoid(2x - 1), reported score = x
    x = rng.randn(600)
    y = (rng.rand(600) < 1 / (1 + np.exp(-(2 * x - 1)))).astype(int)
    from getl_spark.functions import quality as Q

    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(x, y)], "s DOUBLE, y INT"
    )
    m = Q.platt_calibrate(df, "s", "y")
    a_ref, b_ref = _np_platt(x, y)
    assert abs(m["a"] - a_ref) < 1e-6 and abs(m["b"] - b_ref) < 1e-6
    assert abs(m["a"] - 2.0) < 0.5 and abs(m["b"] - (-1.0)) < 0.5
    # converged: one more Newton step barely moves
    m2 = Q.platt_calibrate(df, "s", "y", iters=25)
    assert abs(m["a"] - m2["a"]) < 1e-9


def test_platt_improves_ece(spark):
    import numpy as np

    rng = np.random.RandomState(8)
    x = rng.rand(2000)  # "scores" already in [0,1] but miscalibrated
    y = (rng.rand(2000) < np.clip(x * 0.3 + 0.1, 0, 1)).astype(int)
    from getl_spark.functions import quality as Q, stats as S

    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(x, y)], "s DOUBLE, y INT"
    )
    before = S.ece(df, "s", "y").first().ece
    m = Q.platt_calibrate(df, "s", "y")
    cal = Q.apply_calibration(df, m, "s")
    after = S.ece(cal, "calibrated", "y").first().ece
    assert after < before / 2  # calibration fixes what ece detected


def test_platt_guards(spark):
    import pytest as _pytest

    from getl_spark.functions import quality as Q

    bad = spark.createDataFrame([(0.5, 2)], "s DOUBLE, y INT")
    with _pytest.raises(Exception, match="binary"):
        Q.platt_calibrate(bad, "s", "y")
    empty = spark.createDataFrame([], "s DOUBLE, y INT")
    with _pytest.raises(ValueError, match="no usable"):
        Q.platt_calibrate(empty, "s", "y")
    # constant scores: flat Hessian exit, not a crash
    const = spark.createDataFrame(
        [(1.0, 0), (1.0, 1), (1.0, 1)], "s DOUBLE, y INT"
    )
    m = Q.platt_calibrate(const, "s", "y")
    assert "a" in m and "b" in m


def test_uncertainty_sample_queue_rank_recovers_priority(spark):
    """queue_rank survives the join back to df: rank 1 is the row
    nearest the 0.5 boundary, ranks are dense 1..n, and sorting on it
    reproduces the (boundary distance, id) order."""
    from getl_spark.functions import quality

    pos = [(i, "good clean prose with real words here") for i in range(10)]
    neg = [(100 + i, "zzz qqq xxx") for i in range(10)]
    labeled = spark.createDataFrame(
        [(i, t, 1.0) for i, t in pos] + [(i, t, 0.0) for i, t in neg],
        "doc_id long, text string, label double",
    )
    model = quality.train_classifier(labeled, dim=64, max_iter=30)
    mixed = spark.createDataFrame(
        [
            (1, "good clean prose with real words here"),
            (2, "zzz qqq xxx"),
            (3, "good clean zzz qqq"),
            (4, "prose words xxx qqq"),
        ],
        "doc_id long, text string",
    )
    out = quality.uncertainty_sample(mixed, model, margin=0.49, max_rows=3)
    rows = sorted(out.collect(), key=lambda r: r.queue_rank)
    assert [r.queue_rank for r in rows] == list(range(1, len(rows) + 1))
    scored = {
        r.doc_id: r.quality_score
        for r in quality.score(mixed, model).collect()
    }
    want = sorted(
        (d for d in scored if abs(scored[d] - 0.5) <= 0.49),
        key=lambda d: (abs(scored[d] - 0.5), d),
    )[:3]
    assert [r.doc_id for r in rows] == want


def test_label_noise(spark):
    """Planted flips are flagged, clean confident rows are not;
    thresholds replay in python; NULL rows never suspects; per-group
    thresholds; binary guard."""
    import random

    from getl_spark.functions import quality

    rnd = random.Random(17)
    rows = []
    # clean: label matches a well-separated score
    for i in range(300):
        y = i % 2
        sc = rnd.uniform(0.7, 1.0) if y else rnd.uniform(0.0, 0.3)
        rows.append((i, y, round(sc, 4)))
    # planted flips: confident score, opposite label
    flips = [(1000, 0, 0.95), (1001, 1, 0.02), (1002, 0, 0.99)]
    rows += flips
    df = spark.createDataFrame(rows, "id LONG, label INT, score DOUBLE")

    out = {r.id: r for r in
           quality.label_noise(df, "label", "score").collect()}
    # python threshold replay
    t1 = sum(s for _, y, s in rows if y == 1) / sum(1 for _, y, s in rows if y == 1)
    t0 = sum(s for _, y, s in rows if y == 0) / sum(1 for _, y, s in rows if y == 0)
    for i, y, s in rows:
        expect = (y == 0 and s >= t1) or (y == 1 and s <= t0)
        assert out[i].noise_suspect == expect, (i, y, s)
        assert out[i].suggested_label == ((1 - y) if expect else None)
    assert all(out[i].noise_suspect for i, _, _ in flips)
    clean_flagged = sum(
        1 for i, y, s in rows[:300] if out[i].noise_suspect
    )
    assert clean_flagged == 0  # well-separated clean pool

    # NULL score/label rows are never suspects
    withnull = spark.createDataFrame(
        [(1, 0, 0.99), (2, None, 0.99), (3, 0, None), (4, 1, 0.9)],
        "id LONG, label INT, score DOUBLE",
    )
    o = {r.id: r for r in
         quality.label_noise(withnull, "label", "score").collect()}
    assert o[2].noise_suspect is False and o[3].noise_suspect is False

    # per-group thresholds: a harsh-scorer segment self-calibrates
    g = [("a", 0, 0.2), ("a", 0, 0.25), ("a", 1, 0.8), ("a", 1, 0.85),
         ("a", 0, 0.83),                      # flip within a's scale
         ("b", 0, 0.01), ("b", 0, 0.02), ("b", 1, 0.10), ("b", 1, 0.12),
         ("b", 0, 0.11)]                      # flip within b's scale
    gdf = spark.createDataFrame(g, "g STRING, label INT, score DOUBLE")
    gout = quality.label_noise(gdf, "label", "score", group_by="g").collect()
    flagged = {(r.g, r.score) for r in gout if r.noise_suspect}
    assert ("a", 0.83) in flagged and ("b", 0.11) in flagged

    with pytest.raises(Exception, match="binary"):
        quality.label_noise(
            spark.createDataFrame([(2, 0.5)], "label INT, score DOUBLE"),
            "label", "score",
        ).collect()


# --------------------------------------------------------- weak label vote


def test_weak_label_vote_majority_and_abstention(spark):
    from getl_spark.functions import quality

    df = spark.createDataFrame(
        [
            (1, "spam", "spam", "ham"),    # 2-1 spam
            (2, "ham", None, "ham"),       # 2-0 ham, one abstain
            (3, None, None, None),         # all abstain -> NULL
            (4, "spam", "ham", None),      # 1-1 tie -> smallest label (ham)
        ],
        "id LONG, lf1 STRING, lf2 STRING, lf3 STRING",
    )
    out = {
        r.id: r
        for r in quality.weak_label_vote(df, ["lf1", "lf2", "lf3"]).collect()
    }
    assert out[1].vote_label == "spam" and abs(out[1].vote_share - 2 / 3) < 1e-6
    assert out[2].vote_label == "ham" and out[2].vote_share == 1.0
    assert out[2].n_abstain == 1 and out[2].votes_cast == 2.0
    assert out[3].vote_label is None and out[3].n_abstain == 3
    assert out[3].votes_cast == 0.0 and out[3].vote_share is None
    assert out[4].vote_label == "ham"  # deterministic tie to smaller label


def test_weak_label_vote_weights_flip_winner(spark):
    from getl_spark.functions import quality

    df = spark.createDataFrame(
        [(1, "spam", "ham", "ham")], "id LONG, a STRING, b STRING, c STRING"
    )
    # unweighted: ham 2-1; with a trusted first LF (w=5): spam 5-2
    r0 = quality.weak_label_vote(df, ["a", "b", "c"]).collect()[0]
    assert r0.vote_label == "ham"
    r1 = quality.weak_label_vote(
        df, ["a", "b", "c"], weights=[5.0, 1.0, 1.0]
    ).collect()[0]
    assert r1.vote_label == "spam"
    assert abs(r1.vote_share - 5 / 7) < 1e-6


def test_weak_label_vote_no_shuffle_plan(spark):
    from getl_spark.functions import quality

    df = spark.createDataFrame(
        [(1, "a", "b")], "id LONG, x STRING, y STRING"
    )
    plan = quality.weak_label_vote(df, ["x", "y"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_weak_label_vote_guards(spark):
    from getl_spark.functions import quality

    df = spark.createDataFrame([(1, "a")], "id LONG, x STRING")
    with pytest.raises(ValueError, match="at least one"):
        quality.weak_label_vote(df, [])
    with pytest.raises(ValueError, match="weights"):
        quality.weak_label_vote(df, ["x"], weights=[1.0, 2.0])
    with pytest.raises(ValueError, match="> 0"):
        quality.weak_label_vote(df, ["x"], weights=[0.0])
