"""Code block for examples/index_maintenance.yaml: the rolling-corpus
index lifecycle — build two per-period snapshots, consolidate without
retraining, and read the health reports that say when a real rebuild
is due. One ``resolve`` (the python_codeblock contract) dispatching on
``CustomProps.step``."""

from getl_spark.functions import dedup, similarity


def _build_periods(params):
    """Two per-period IVF snapshots (the daily-build shape), merged
    WITHOUT retraining — the larger side's quantizer is kept and only
    the smaller side's vectors re-assign in one scan. Returns the
    merged index's per-cell occupancy."""
    emb = params["dataframes"]["LoadEmbeddings"]
    base = params["index_root"]
    similarity.build_ivf_index(
        emb.where("vec_id % 3 != 0"), f"{base}/jan", nlist=8
    )
    similarity.build_ivf_index(
        emb.where("vec_id % 3 = 0"), f"{base}/feb", nlist=4
    )
    # health_gate=True makes the retrain trigger EXECUTABLE: the merge
    # refuses inputs whose quantizer already needs retraining instead
    # of compounding the degradation
    return similarity.merge_ivf_index(
        emb.sparkSession, f"{base}/jan", f"{base}/feb", f"{base}/merged",
        health_gate=True,
    )


def _ivf_health(params):
    """The cheap post-merge check: occupancy histogram, imbalance,
    empty cells, and the documented retrain trigger — from index
    metadata alone, no embeddings read."""
    emb = params["dataframes"]["LoadEmbeddings"]
    return similarity.ivf_health(
        emb.sparkSession, f"{params['index_root']}/merged"
    )


def _minhash_lifecycle(params):
    """The text symmetric: build a minhash dedup index over the even
    documents, screen the odd increment against it, and report band
    health (hot buckets = boilerplate warning)."""
    docs = params["dataframes"]["LoadDocs"]
    path = f"{params['index_root']}/mh"
    dedup.build_minhash_index(docs.where("doc_id % 2 = 0"), path)
    dedup.against_stored_index(docs.where("doc_id % 2 = 1"), path).count()
    return dedup.minhash_index_health(docs.sparkSession, path)


def _gated_consolidation(params):
    """The cron's decision step, end to end: try the gated merge; when
    the gate trips (IndexHealthError), fall back to a REBUILD from the
    consolidated vectors — the documented recovery — and report which
    path ran plus the gate's readout. A real cron would alert on
    decision='rebuild'."""
    from pyspark.sql import functions as F

    from getl_spark.common.errors import IndexHealthError
    from getl_spark.functions import similarity

    emb = params["dataframes"]["LoadEmbeddings"]
    spark = emb.sparkSession
    base = params["index_root"]
    # a deliberately degraded period: one fat cell out of four (the
    # shape repeated unretrained consolidation produces)
    bad = f"{base}/stale_period"
    spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(4)],
        "cell INT, centroid ARRAY<DOUBLE>",
    ).write.mode("overwrite").parquet(f"{bad}/centroids")
    emb.selectExpr(
        "vec_id AS nbr_id", "slice(embedding, 1, 8) AS cvec",
        "CAST(1.0 AS DOUBLE) AS cnorm", "CAST(0 AS INT) AS cell",
    ).write.mode("overwrite").partitionBy("cell").parquet(f"{bad}/vectors")
    try:
        similarity.merge_ivf_index(
            spark, f"{base}/merged", bad, f"{base}/merged2",
            health_gate=True,
        )
        decision, readout = "merged", {}
    except IndexHealthError as exc:
        decision, readout = "rebuild", exc.readout
        # the recovery: retrain from the consolidated raw vectors
        similarity.build_ivf_index(
            emb.select(
                F.col("vec_id"), F.slice("embedding", 1, 8).alias("embedding")
            ),
            f"{base}/rebuilt",
            nlist=4,
        )
    return spark.createDataFrame(
        [(decision, float(readout.get("imbalance", 0.0)),
          int(readout.get("empty_cells", 0)))],
        "decision STRING, imbalance DOUBLE, empty_cells INT",
    )


def _lsh_plan(params):
    """Before the NEXT rebuild: the s-curve table for a 0.8 Jaccard
    threshold at 64 hashes — which (bands, rows) to rebuild with."""
    docs = params["dataframes"]["LoadDocs"]
    return dedup.lsh_plan(docs.sparkSession, threshold=0.8, num_hashes=64)


_STEPS = {
    "build_periods": _build_periods,
    "ivf_health": _ivf_health,
    "minhash_lifecycle": _minhash_lifecycle,
    "gated_consolidation": _gated_consolidation,
    "lsh_plan": _lsh_plan,
}


def resolve(params):
    return _STEPS[params["step"]](params)
