"""Code blocks for examples/model_migration.yaml: the embedding-model
migration lifecycle, dispatched on ``CustomProps.step``.

The scenario: the embedding model was upgraded, so the "new" space is
the old one rotated/scaled/shifted (simulated here with a
deterministic orthogonal matrix — successive real model versions are
near-isometric, which is exactly the assumption ``procrustes_fit``
exploits and ``recall_eval`` then measures). Only the EVEN ids have
been re-embedded so far (the anchor overlap); the fit learned on them
aligns every new vector back into the old space so the existing index
keeps answering while the backfill runs.
"""

import numpy as np
from pyspark.sql import functions as F

from getl_spark.functions import embedding as E, sample, similarity

D = 64


def _rotation():
    """Deterministic orthogonal d×d (QR of a fixed integer-formula
    matrix) + scale/shift — the simulated model upgrade."""
    m = np.array(
        [[((i * 5 + j * 7) % 13) - 6 + 1.0 / (j + 2) for j in range(D)]
         for i in range(D)]
    )
    return np.linalg.qr(m)[0]


def _spaces(df):
    old = df.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    q0 = _rotation()
    rows = [
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(float(q0[i][j])) for i in range(D)]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        * F.lit(0.8)
        + F.lit(float(((j * 11) % 7) - 3) / 10.0)
        for j in range(D)
    ]
    new = old.select("vec_id", F.array(*rows).alias("embedding"))
    return old, new


def resolve(params):
    step = params["step"]
    df = params["dataframes"]["LoadEmbeddings"]
    old, new = _spaces(df)
    # anchors: only even ids have been re-embedded in production terms
    fit = E.procrustes_fit(old.where("vec_id % 2 = 0"), new)
    aligned = E.procrustes_apply(new, fit, "embedding", "aligned")
    if step == "align":
        return aligned.select(
            "vec_id",
            F.round(F.col("aligned")[0], 6).alias("a0"),
            F.round(F.col("aligned")[1], 6).alias("a1"),
        )
    if step == "fit_report":
        spark = df.sparkSession
        return spark.createDataFrame(
            [(fit.n_anchors, float(fit.scale), float(fit.rmse))],
            "n_anchors long, scale double, rmse double",
        )
    if step == "recall":
        # does aligned-space retrieval reproduce old-space truth?
        queries = old.where("vec_id < 8")
        truth = similarity.topk_bruteforce(old, queries, k=5)
        approx = similarity.topk_bruteforce(
            aligned.select("vec_id", F.col("aligned").alias("embedding")),
            E.procrustes_apply(
                new.where("vec_id < 8"), fit, "embedding", "aligned"
            ).select("vec_id", F.col("aligned").alias("embedding")),
            k=5,
        )
        return similarity.recall_eval(approx, truth, k=5)
    if step == "label_candidates":
        # spend the labeling budget on the corners of the aligned space
        return sample.kcenter(
            aligned.select("vec_id", F.col("aligned").alias("embedding")),
            k=8,
        )
    raise ValueError(f"unknown step {step!r}")
