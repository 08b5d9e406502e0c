"""Similarity search over embedding columns (``array<float>``).

Two paths, same output contract ``(query_id, neighbor_id, cosine, rank)``:

* ``topk_bruteforce`` — exact top-k: broadcast the (small) query set
  against the full corpus, JVM-side dot products, per-query window
  top-k. Linear in corpus size, embarrassingly parallel — the right
  baseline even at 100 TB when the query set is small.
* ``topk_lsh`` — approximate: random-hyperplane buckets (fixed seed)
  with multi-probe (flip each bit) candidate generation, exact rerank
  inside candidates. Sub-linear candidate sets for large query sets.

Dot products use ``F.zip_with`` + ``F.aggregate`` (pure Catalyst
expressions). For very high dimensions a pandas_udf with numpy matmul
batches would win; at dim ≤ a few hundred the JVM expression path
avoids Python round-trips entirely.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F

from getl_spark.common.scale import pin, local_df, run_concurrent


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(v: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))


def cosine_expr(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot_expr(a, b) / (norm_a * norm_b)


def l2_expr(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def embedding_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from a sampled row, with a readable
    error on an empty/all-null corpus (a bare ``.first()[0]`` would
    raise an opaque TypeError)."""
    row = df.where(F.col(vec_col).isNotNull()).select(vec_col).first()
    if row is None:
        raise ValueError(
            f"Cannot infer embedding dimension: no non-null '{vec_col}' "
            "rows. Pass dim= explicitly or supply a non-empty corpus."
        )
    return len(row[0])


def _bounded_query_rows(qdf: DataFrame, op: str, max_queries: int) -> list:
    """Collect a query frame to the driver with a HARD row bound.

    The ADC backends build per-query lookup tensors driver-side — the
    design contract is an eval/blocklist-sized query set, but nothing
    used to enforce it: a corpus-sized query table would OOM the driver
    silently. ``limit(max+1)`` caps what can ever reach the driver
    (one extra row is the overflow sentinel), so the failure mode is a
    raised contract error, never an OOM.
    """
    if max_queries < 1:
        raise ValueError(f"{op}: max_queries must be >= 1, got {max_queries}")
    rows = qdf.limit(max_queries + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"{op}: query set exceeds max_queries={max_queries}. The "
            f"query-side lookup tables are driver-built by design "
            f"(eval/blocklist-sized query sets); for corpus-scale query "
            f"sets use the distributed backends in topk_between "
            f"(bruteforce/lsh/ivf), or raise max_queries explicitly if "
            f"the driver has headroom."
        )
    return rows


def with_norm(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Adds a precomputed L2 norm and casts to double once — norms are
    reused across every pair the row participates in. Also widens
    single-file inputs to cluster parallelism (dot products are
    compute-bound, not IO-bound)."""
    from getl_spark.common.scale import parallelize

    doubled = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        parallelize(df)
        .withColumn(vec_col, doubled)
        .withColumn("norm", norm_expr(F.col(vec_col)))
    )


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k under ``metric``: ``'cosine'`` (default, score
    column ``cosine``, higher is closer), ``'dot'`` (maximum inner
    product — the MIPS shape for non-normalized learned embeddings;
    score column ``score``, higher is closer), or ``'l2'`` (Euclidean;
    score column ``score``, LOWER is closer — ranking ascends).

    ``queries`` is broadcast; ties break on neighbor id ascending for
    full determinism. Self-matches excluded by id when
    ``exclude_self`` (right for queries drawn from the corpus; set
    False for cross-table retrieval where query and corpus id spaces
    are unrelated).
    """
    if metric not in ("cosine", "dot", "l2"):
        raise ValueError(
            f"topk_bruteforce: unknown metric '{metric}' (cosine|dot|l2)"
        )
    c = with_norm(
        corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("vec"))
    ).withColumnRenamed("vec", "cvec").withColumnRenamed("norm", "cnorm")
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec"))
    ).withColumnRenamed("vec", "qvec").withColumnRenamed("norm", "qnorm")
    if metric == "cosine":
        score_col, score = "cosine", cosine_expr(
            F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
        )
    elif metric == "dot":
        score_col, score = "score", dot_expr(F.col("qvec"), F.col("cvec"))
    else:
        score_col, score = "score", l2_expr(F.col("qvec"), F.col("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.lit(not exclude_self) | (F.col("nbr_id") != F.col("query_id")))
        .select(
            "query_id",
            "nbr_id",
            F.round(score, 6).alias(score_col),
        )
    )
    order = F.col(score_col).asc() if metric == "l2" else F.col(score_col).desc()
    w = Window.partitionBy("query_id").orderBy(order, F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", score_col, "rank")
    )


def topk_hamming(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_col: Optional[str] = None,
    exclude_self: bool = True,
    bits_per_word: int = 32,
) -> DataFrame:
    """Exact top-k by HAMMING distance over sign-binarized embeddings
    — the 1-bit-per-dimension candidate generator
    (``embedding.binarize``): a 768-dim float64 vector compares as 24
    integer words, so the scan is ~64× lighter in memory and shuffle
    bytes than float cosine, and XOR+popcount is the cheapest distance
    a CPU can evaluate. Hamming on sign bits tracks angular
    neighborhoods (Charikar's hyperplane bound: P[bits agree] =
    1 − θ/π per dimension); use it to SHORTLIST, then rerank the
    shortlist with exact cosine — the same two-phase discipline as
    ``topk_pq``.

    Pass raw float vectors (``vec_col`` — both sides binarized
    scan-side, zero extra passes) or pre-binarized words
    (``bits_col`` — the persisted-bits path; ``bits_per_word`` is
    ignored then). Returns ``(query_id, nbr_id, hamming, rank)``;
    ties break on distance then neighbor id ascending — fully
    deterministic. Scale shape: exactly ``topk_bruteforce``'s —
    queries broadcast, distance as one JVM ``zip_with`` +
    ``bit_count`` fold inside codegen, one per-query window top-k.
    """
    if k < 1:
        raise ValueError(f"topk_hamming: k must be >= 1, got {k}")
    from getl_spark.functions.embedding import binarize

    def prep(df, id_alias):
        if bits_col is not None:
            return df.select(
                F.col(id_col).alias(id_alias), F.col(bits_col).alias("__b")
            )
        return binarize(
            df.select(F.col(id_col).alias(id_alias), vec_col),
            vec_col=vec_col, new_col="__b",
            bits_per_word=bits_per_word, drop=True,
        )

    from getl_spark.common.scale import parallelize

    c = parallelize(prep(corpus, "nbr_id"))
    q = prep(queries, "query_id").withColumnRenamed("__b", "__qb")
    dist = F.aggregate(
        F.zip_with(
            F.col("__b"), F.col("__qb"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc + d,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(
            F.lit(not exclude_self) | (F.col("nbr_id") != F.col("query_id"))
        )
        .select("query_id", "nbr_id", dist.alias("hamming"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "hamming", "rank")
    )


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    dim: Optional[int] = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Corpus vectors land in one sign bucket; each query probes its own
    bucket plus (with ``multiprobe``) every single-bit flip — 1+planes
    probes — then reranks exactly. Recall is tested against
    ``topk_bruteforce`` in tests/test_similarity.py. Pass ``dim``
    explicitly to skip the one-row sampling job.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    dim = dim or embedding_dim(corpus, vec_col)
    hyper = rng.randn(planes, dim)

    def bucket_col(vec: Column) -> Column:
        acc = F.lit(0)
        for p in range(planes):
            dot = dot_expr(vec, F.array(*[F.lit(float(x)) for x in hyper[p]]))
            acc = acc + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        return acc

    c = with_norm(
        corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("vec"))
    ).withColumnRenamed("vec", "cvec").withColumnRenamed("norm", "cnorm")
    c = c.withColumn("bucket", bucket_col(F.col("cvec")))
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec"))
    ).withColumnRenamed("vec", "qvec").withColumnRenamed("norm", "qnorm")
    q = q.withColumn("qbucket", bucket_col(F.col("qvec")))
    probes = [F.col("qbucket")]
    if multiprobe:
        probes += [
            F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(planes)
        ]
    q = q.withColumn("bucket", F.explode(F.array(*probes)))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.lit(not exclude_self) | (F.col("nbr_id") != F.col("query_id")))
        .select(
            "query_id",
            "nbr_id",
            F.round(
                cosine_expr(F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")), 6
            ).alias("cosine"),
        )
        .dropDuplicates(["query_id", "nbr_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def centroid_cells_expr(cent_n, vec: Column, nassign: int = 1) -> Column:
    """Array of the ``nassign`` nearest centroid cells (by dot product)
    for ``vec`` — argmax via array_sort so the expression stays linear
    in ``nlist`` (a when/otherwise fold doubles the tree per centroid
    and blows the JVM heap at codegen). Shared by IVF assignment
    (``nassign=1``) and multi-assignment candidate generation
    (``dedup.semantic_pairs``)."""
    structs = [
        F.struct(
            dot_expr(vec, F.array(*[F.lit(float(x)) for x in cent])).alias("dot"),
            F.lit(idx).alias("cell"),
        )
        for idx, cent in enumerate(cent_n)
    ]
    top = F.slice(F.reverse(F.array_sort(F.array(*structs))), 1, nassign)
    return F.transform(top, lambda s: s["cell"])


def _collect_train_sample(
    corpus: DataFrame, id_col: str, vec_col: str, train_limit: int
):
    """The bounded, deterministic training sample every quantizer here
    trains on: first ``train_limit`` non-null vectors by id, one
    ordered-limit collect. Shared so composite builders (IVF-PQ) pay
    for it once."""
    import numpy as np

    train = np.array(
        corpus.where(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .limit(train_limit)
        .select(vec_col)
        .toPandas()[vec_col]
        .tolist(),
        dtype="float64",
    )
    if train.ndim != 2 or not len(train):
        raise ValueError("k-means training: no non-null vectors to train on")
    return train


def _train_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int,
    seed: int,
    train_limit: int,
    kmeans_iters: int,
    sample=None,
):
    """Driver-side normalized k-means on a bounded, deterministic
    sample (first ``train_limit`` ids, or a precollected ``sample``).
    Returns the row-normalized centroid matrix (numpy, nlist × dim)."""
    import numpy as np

    train = (
        np.asarray(sample, dtype="float64")
        if sample is not None
        else _collect_train_sample(corpus, id_col, vec_col, train_limit)
    )
    rng = np.random.RandomState(seed)
    centroids = train[rng.choice(len(train), size=min(nlist, len(train)), replace=False)]
    # normalized k-means (cosine): assign by max dot with normalized centroids
    train_n = train / np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-12)
    for _ in range(kmeans_iters):
        cent_n = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
        assign = np.argmax(train_n @ cent_n.T, axis=1)
        for c in range(len(centroids)):
            members = train[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    train_limit: int = 10000,
    kmeans_iters: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) indexing.

    A k-means coarse quantizer is trained driver-side on a bounded,
    deterministic sample (first ``train_limit`` ids); every corpus
    vector is assigned to its nearest centroid with JVM expressions;
    each query probes its ``nprobe`` nearest cells and reranks exactly
    within them. Scan cost drops ~nlist/nprobe-fold versus brute force.
    Deterministic: fixed seed, ordered training sample, seeded
    numpy k-means. For repeated querying over a stable corpus, build
    the assignment once with ``build_ivf_index`` and query with
    ``topk_ivf_indexed`` instead — training and assignment are the
    expensive half.
    """
    cent_n = _train_centroids(
        corpus, id_col, vec_col, nlist, seed, train_limit, kmeans_iters
    )

    def cell_col(vec: Column) -> Column:
        return centroid_cells_expr(cent_n, vec)[0]

    c = with_norm(
        corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("vec"))
    ).withColumnRenamed("vec", "cvec").withColumnRenamed("norm", "cnorm")
    c = c.withColumn("cell", cell_col(F.col("cvec"))).transform(pin)
    return _probe_and_rerank(
        c, queries, cent_n, nprobe, k, id_col, vec_col, exclude_self
    )


def _probe_and_rerank(
    assigned: DataFrame,
    queries: DataFrame,
    cent_n,
    nprobe: int,
    k: int,
    id_col: str,
    vec_col: str,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF query half: probe each query's ``nprobe`` nearest cells of
    ``assigned`` (columns ``nbr_id, cvec, cnorm, cell``), rerank
    exactly within them. Queries are broadcast (bounded query sets)."""
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec"))
    ).withColumnRenamed("vec", "qvec").withColumnRenamed("norm", "qnorm")
    # nprobe nearest cells per query; the query norm is a positive
    # scalar so raw dots rank cells identically to normalized ones
    probe_structs = [
        F.struct(
            dot_expr(F.col("qvec"), F.array(*[F.lit(float(x)) for x in cent])).alias(
                "dot"
            ),
            F.lit(idx).alias("cell"),
        )
        for idx, cent in enumerate(cent_n)
    ]
    q = (
        q.withColumn(
            "probes",
            F.slice(
                F.reverse(F.array_sort(F.array(*probe_structs))), 1, nprobe
            ),
        )
        .withColumn("probe", F.explode("probes"))
        .select("query_id", "qvec", "qnorm", F.col("probe.cell").alias("cell"))
    )
    scored = (
        assigned.join(F.broadcast(q), "cell")
        .where(F.lit(not exclude_self) | (F.col("nbr_id") != F.col("query_id")))
        .select(
            "query_id",
            "nbr_id",
            F.round(
                cosine_expr(F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")), 6
            ).alias("cosine"),
        )
        .dropDuplicates(["query_id", "nbr_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    train_limit: int = 10000,
    kmeans_iters: int = 10,
) -> DataFrame:
    """Persist an IVF index: train the coarse quantizer, assign every
    corpus vector to its cell, and write ``{path}/centroids`` (cell →
    normalized centroid) + ``{path}/vectors`` (nbr_id, cvec, cnorm,
    cell — partitioned by cell, so a probe reads only its cells'
    files). Build once per corpus snapshot; ``topk_ivf_indexed`` then
    skips training AND assignment — the expensive half of every query
    at scale. Returns a per-cell occupancy summary (the index health
    check: one empty or giant cell means retrain with different
    ``nlist``)."""
    cent_n = _train_centroids(
        corpus, id_col, vec_col, nlist, seed, train_limit, kmeans_iters
    )
    spark = corpus.sparkSession

    def _write_centroids():
        local_df(spark,
            [(i, [float(x) for x in cent]) for i, cent in enumerate(cent_n)],
            "cell INT, centroid ARRAY<DOUBLE>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")

    def _write_vectors():
        assigned = (
            with_norm(
                corpus.select(
                    F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("vec")
                )
            )
            .withColumnRenamed("vec", "cvec")
            .withColumnRenamed("norm", "cnorm")
            .withColumn("cell", centroid_cells_expr(cent_n, F.col("cvec"))[0])
        )
        assigned.write.mode("overwrite").partitionBy("cell").parquet(
            f"{path}/vectors"
        )

    # both writes depend only on the trained centroids — overlap them
    # (guide §2.6)
    run_concurrent(_write_centroids, _write_vectors)
    return (
        spark.read.parquet(f"{path}/vectors")
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cell")
    )


def topk_ivf_indexed(
    spark,
    queries: DataFrame,
    index_path: str,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Query a persisted IVF index (``build_ivf_index``): no training,
    no assignment — read the centroids (nlist rows, driver-bounded),
    probe, rerank. The vectors table is partitioned by cell, so with
    partition pruning a probe touches only ``nprobe`` cells' files per
    query set."""
    import numpy as np

    cent_rows = (
        spark.read.parquet(f"{index_path}/centroids").orderBy("cell").collect()
    )
    cent_n = np.array([r.centroid for r in cent_rows], dtype="float64")
    assigned = spark.read.parquet(f"{index_path}/vectors")
    return _probe_and_rerank(
        assigned, queries, cent_n, nprobe, k, id_col, vec_col, exclude_self
    )


def merge_ivf_index(
    spark,
    path_a: str,
    path_b: str,
    out_path: str,
    health_gate: bool = False,
) -> DataFrame:
    """Merge two persisted ``build_ivf_index`` snapshots WITHOUT
    retraining — the rolling-corpus consolidation step: periodic
    ingest produces one index per period (``build_ivf_index`` /
    ``write::stream_vector_ingest``), and merging them previously
    meant re-reading every raw vector through a fresh build.

    IVF cells are union-mergeable: the coarse quantizer is just a
    partitioning aid (recall depends on it, correctness under full
    probes does not), so the LARGER index's centroids are kept
    verbatim and only the SMALLER side's vectors re-assign to those
    centroids — one scan of the smaller vectors table, zero k-means
    iterations, the larger side's files copy through unchanged.
    Identity contract (pytest-held): querying merge(A, B) with
    ``nprobe == nlist`` equals querying an index built from A ∪ B
    under full probes — full probes scan every cell, so results
    depend only on the merged vector SET, which is identical by
    construction. Under partial probes the merged index's recall is
    that of the kept quantizer (measure with ``recall_eval`` after a
    merge, exactly as after a build).

    Duplicate ids (a vector present in both periods) keep the LARGER
    side's row — deterministic, and the larger side is the one whose
    quantizer the merged index answers with. Dimension mismatch and
    merging onto an input path fail loud.

    ``health_gate=True`` runs :func:`assert_ivf_healthy` on BOTH
    inputs first (default thresholds) and refuses the merge when
    either already needs retraining — consolidating onto a degraded
    quantizer is exactly how repeated merges compound recall loss, so
    the cron's right move is rebuild-then-merge, and the gate makes
    the documented trigger executable instead of advisory.

    Scale shape: two footer-count probes + one nlist-row centroid
    collect (driver-bounded, same as every IVF query) + one scan of
    the smaller vectors table for re-assignment + the partitioned
    write. Nothing touches raw embeddings.
    """
    import numpy as np

    norm = lambda p: os.path.normpath(p)  # noqa: E731
    if norm(out_path) in (norm(path_a), norm(path_b)):
        raise ValueError(
            "merge_ivf_index: out_path must differ from both inputs "
            "(overwriting an index while lazily reading it loses data)"
        )
    if health_gate:
        assert_ivf_healthy(spark, path_a)
        assert_ivf_healthy(spark, path_b)
    # the two footer-count probes are independent — overlap them
    # (guide §2.6), same as the table writes below
    n_a, n_b = run_concurrent(
        lambda: spark.read.parquet(f"{path_a}/vectors").count(),
        lambda: spark.read.parquet(f"{path_b}/vectors").count(),
    )
    big, small = (path_a, path_b) if n_a >= n_b else (path_b, path_a)
    cent_rows = (
        spark.read.parquet(f"{big}/centroids").orderBy("cell").collect()
    )
    cent_n = np.array([r.centroid for r in cent_rows], dtype="float64")
    other_dim = spark.read.parquet(f"{small}/centroids").first()
    if other_dim is not None and len(other_dim.centroid) != cent_n.shape[1]:
        raise ValueError(
            "merge_ivf_index: dimension mismatch — "
            f"{cent_n.shape[1]} vs {len(other_dim.centroid)}"
        )
    def _write_centroids():
        local_df(spark,
            [(r.cell, [float(x) for x in r.centroid]) for r in cent_rows],
            "cell INT, centroid ARRAY<DOUBLE>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{out_path}/centroids")

    def _write_vectors():
        cols = ["nbr_id", "cvec", "cnorm", "cell"]
        big_vecs = spark.read.parquet(f"{big}/vectors").select(*cols)
        # id collisions resolve to the LARGER side deterministically (an
        # arbitrary dropDuplicates pick would make merged indexes
        # run-dependent when a vector was re-embedded between periods)
        small_re = (
            spark.read.parquet(f"{small}/vectors")
            .join(big_vecs.select("nbr_id"), "nbr_id", "left_anti")
            .drop("cell")
            .withColumn("cell", centroid_cells_expr(cent_n, F.col("cvec"))[0])
            .select(*cols)
        )
        (
            big_vecs.unionByName(small_re)
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{out_path}/vectors")
        )

    # centroid and vector writes both depend only on the collected
    # centroid rows — overlap them (guide §2.6)
    run_concurrent(_write_centroids, _write_vectors)
    return (
        spark.read.parquet(f"{out_path}/vectors")
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cell")
    )


def ivf_health(
    spark,
    index_path: str,
    imbalance_threshold: float = 3.0,
    max_empty_frac: float = 0.25,
    round_to: int = 6,
) -> DataFrame:
    """Index-maintenance health readout for a persisted IVF index
    (``build_ivf_index`` layout) — the cheap check between builds.
    ``merge_ivf_index`` keeps the larger side's quantizer and
    ``ivf_pq_append`` / ``write::stream_vector_ingest`` grow cells
    without retraining, so repeated consolidation degrades cell
    balance (and with it partial-probe recall) while nothing fails
    loudly. Measuring that with ``recall_eval`` needs a brute-force
    leg over raw embeddings; THIS report needs only index metadata:
    the centroids table (nlist rows) and the vectors table's ``cell``
    column — a partition column, so the scan reads directory metadata
    and footer counts, never an embedding.

    Returns ONE row: ``(nlist, n_vectors, empty_cells, min_cell,
    max_cell, mean_cell, imbalance, retrain, occupancy)`` —

    * ``occupancy`` — the cell-occupancy histogram, vector counts in
      cell order (empty cells as 0), ``nlist`` entries.
    * ``mean_cell`` — ``n_vectors / nlist`` (empty cells included;
      that's the balance the quantizer was trained to deliver).
    * ``imbalance`` — ``max_cell / mean_cell``; 1.0 is perfect, and a
      probe of the fattest cell costs ``imbalance``× the average probe
      — tail query latency scales with it.
    * ``retrain`` — the documented re-train trigger:
      ``imbalance > imbalance_threshold`` (default 3: the worst probe
      pays 3× the mean) OR ``empty_cells / nlist > max_empty_frac``
      (default 0.25: a quarter of the quantizer wasted — partial
      probes burn ``nprobe`` slots on dead cells). When it fires,
      rebuild with ``build_ivf_index`` from the consolidated vectors
      (and re-measure recall with ``recall_eval``).

    Scale shape: one nlist-row centroid read + one metadata-only
    group-count of the partition column + a single-row aggregate; no
    raw embeddings, no shuffle wider than nlist rows. Run it after
    every merge/append cycle — it's O(index files), not O(vectors).
    """
    if imbalance_threshold <= 0 or not (0 <= max_empty_frac <= 1):
        raise ValueError(
            "ivf_health: imbalance_threshold must be > 0 and "
            "max_empty_frac in [0, 1]"
        )
    cells = spark.read.parquet(f"{index_path}/centroids").select("cell")
    occ = (
        spark.read.parquet(f"{index_path}/vectors")
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )
    per_cell = cells.join(occ, "cell", "left").select(
        "cell", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    nlist = F.count("*")
    total = F.sum("n")
    mean_cell = total.cast("double") / nlist.cast("double")
    max_cell = F.max("n")
    empty = F.sum((F.col("n") == 0).cast("bigint"))
    return per_cell.agg(
        nlist.cast("bigint").alias("nlist"),
        total.cast("bigint").alias("n_vectors"),
        empty.alias("empty_cells"),
        F.min("n").cast("bigint").alias("min_cell"),
        max_cell.cast("bigint").alias("max_cell"),
        F.round(mean_cell, round_to).alias("mean_cell"),
        F.round(max_cell.cast("double") / mean_cell, round_to).alias(
            "imbalance"
        ),
        (
            (max_cell.cast("double") / mean_cell > F.lit(float(imbalance_threshold)))
            | (
                empty.cast("double") / nlist.cast("double")
                > F.lit(float(max_empty_frac))
            )
        ).alias("retrain"),
        F.sort_array(
            F.collect_list(F.struct("cell", "n"))
        ).n.alias("occupancy"),
    )


def assert_ivf_healthy(
    spark,
    index_path: str,
    imbalance_threshold: float = 3.0,
    max_empty_frac: float = 0.25,
) -> dict:
    """Executable form of :func:`ivf_health`'s retrain trigger — the
    gate the maintenance loop calls BEFORE :func:`merge_ivf_index` /
    ``ivf_pq_append`` so a degraded quantizer cannot silently keep
    absorbing consolidations (the readout alone is advisory; this
    raises). Returns the health row as a dict when healthy; raises
    :class:`~getl_spark.common.errors.IndexHealthError` (carrying the
    same dict as ``.readout``) when ``retrain`` fires. Cost is the
    readout's: index metadata only, never an embedding."""
    from getl_spark.common.errors import IndexHealthError

    row = ivf_health(
        spark, index_path, imbalance_threshold, max_empty_frac
    ).collect()[0].asDict()
    if row["retrain"]:
        raise IndexHealthError(
            f"assert_ivf_healthy: index at {index_path} needs retraining "
            f"before further maintenance (imbalance {row['imbalance']} vs "
            f"threshold {imbalance_threshold}, empty {row['empty_cells']}/"
            f"{row['nlist']} cells vs max_empty_frac {max_empty_frac}) — "
            "rebuild with build_ivf_index from the consolidated vectors, "
            "then re-measure recall with recall_eval",
            readout=row,
        )
    return row


# --------------------------------------------------- YAML-callable forms
def topk(
    df: DataFrame,
    query_ids: List[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "bruteforce",
    planes: int = 8,
    seed: int = 42,
    nlist: int = 16,
    nprobe: int = 4,
    index_path: str = None,
    metric: str = "cosine",
) -> DataFrame:
    """``transform::generic`` entry: queries selected by id from the
    input itself. With ``nprobe == nlist`` the IVF path probes every
    cell and is exactly equal to brute force (useful for oracle
    verification of the IVF machinery). ``method='ivf_index'`` queries
    a persisted ``build_ivf_index`` at ``index_path`` instead of
    training/assigning in-session; ``method='ivf_pq'`` queries a
    persisted ``build_ivf_pq_index`` (probe-pruned residual-code ADC,
    exact-cosine rerank against the input — the compressed-index
    path). ``metric`` ('cosine'|'dot'|'l2') selects the distance for
    the brute-force path; the banded/cell approximate paths are
    cosine-geometry constructions and reject other metrics."""
    if metric != "cosine" and method != "bruteforce":
        raise ValueError(
            f"topk: metric '{metric}' is only supported with "
            "method='bruteforce' — the lsh/ivf cell constructions are "
            "cosine-geometry (hyperplane signs / normalized centroids)"
        )
    queries = df.where(F.col(id_col).isin(list(query_ids)))
    if method == "lsh":
        return topk_lsh(df, queries, k, id_col, vec_col, planes=planes, seed=seed)
    if method == "ivf":
        return topk_ivf(
            df, queries, k, id_col, vec_col, nlist=nlist, nprobe=nprobe, seed=seed
        )
    if method == "ivf_index":
        if not index_path:
            raise ValueError("topk: method='ivf_index' needs index_path")
        return topk_ivf_indexed(
            df.sparkSession, queries, index_path, k, nprobe, id_col, vec_col
        )
    if method == "ivf_pq":
        if not index_path:
            raise ValueError("topk: method='ivf_pq' needs index_path")
        return topk_ivf_pq(
            df.sparkSession,
            queries,
            index_path,
            k,
            nprobe,
            id_col,
            vec_col,
            rerank=df,
        ).withColumnRenamed("score", "cosine")
    if method != "bruteforce":
        raise ValueError(
            f"topk: unknown method '{method}' "
            "(bruteforce|lsh|ivf|ivf_index|ivf_pq)"
        )
    return topk_bruteforce(df, queries, k, id_col, vec_col, metric=metric)


def topk_between(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id_col: str = "vec_id",
    corpus_id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "bruteforce",
    planes: int = 8,
    seed: int = 42,
    nlist: int = 16,
    nprobe: int = 4,
    metric: str = "cosine",
) -> DataFrame:
    """Cross-table embedding retrieval: for every row of ``queries``,
    the top-k neighbors in ``corpus`` — the eval-queries-vs-
    training-corpus shape (decontamination scoring, retrieval eval,
    semantic search against an indexed collection). Unlike ``topk``,
    the two id spaces are unrelated, so NO self-exclusion is applied —
    an identical id on both sides is still a valid match.

    Multi-input YAML form inside ``transform::generic``:
    ``Input: [Queries, Corpus]``. Methods as ``topk``: exact broadcast
    brute force, hyperplane LSH, or IVF. ``metric``
    ('cosine'|'dot'|'l2') applies to the brute-force path only.
    """
    if metric != "cosine" and method != "bruteforce":
        raise ValueError(
            f"topk_between: metric '{metric}' is only supported with "
            "method='bruteforce'"
        )
    q = queries.select(
        F.col(query_id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    c = corpus.select(
        F.col(corpus_id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    if method == "lsh":
        return topk_lsh(
            c, q, k, "vec_id", "embedding", planes=planes, seed=seed,
            exclude_self=False,
        )
    if method == "ivf":
        return topk_ivf(
            c, q, k, "vec_id", "embedding", nlist=nlist, nprobe=nprobe,
            seed=seed, exclude_self=False,
        )
    if method != "bruteforce":
        raise ValueError(f"topk_between: unknown method '{method}'")
    return topk_bruteforce(
        c, q, k, "vec_id", "embedding", exclude_self=False, metric=metric
    )


def range_search(
    queries: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.8,
    query_id_col: str = "vec_id",
    corpus_id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "bruteforce",
    bands: int = 8,
    planes_per_band: int = 8,
    seed: int = 42,
    max_queries: int = 100_000,
) -> DataFrame:
    """ALL corpus neighbors within cosine ≥ ``threshold`` of each
    query — the radius-query complement to ``topk_between`` (fixed k
    misses dense neighborhoods and pads sparse ones; a radius returns
    exactly what qualifies). The "find every near-copy of these seed
    documents" shape: leaked eval items, known-bad content, dedup
    against a blocklist of embeddings.

    Output ``(query_id, nbr_id, cosine)`` — no rank column; the result
    set size is data-dependent by design. No self-exclusion (the id
    spaces are unrelated, as in ``topk_between``).

    ``method='bruteforce'`` broadcasts the QUERY side and scans the
    corpus once — exact, and the right default while queries are
    blocklist/eval-sized. ``method='lsh'`` is the scale path when the
    query side outgrows broadcast: banded random-hyperplane keys on
    both sides (same family as ``dedup.embedding_cosine_pairs``), ONE
    equi-join on (band, key), exact cosine verify — recall follows the
    banded-LSH curve 1-(1-cosᵖ θ)ᵇ, so size bands/planes to the
    threshold (more bands → recall, more planes/band → precision of
    candidates).
    """
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(
            f"range_search: threshold must be in [-1, 1], got {threshold}"
        )
    c = with_norm(
        corpus.select(
            F.col(corpus_id_col).alias("nbr_id"), F.col(vec_col).alias("vec")
        ).where(F.col(vec_col).isNotNull())
    ).withColumnRenamed("vec", "cvec").withColumnRenamed("norm", "cnorm")
    q = with_norm(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("vec")
        ).where(F.col(vec_col).isNotNull())
    ).withColumnRenamed("vec", "qvec").withColumnRenamed("norm", "qnorm")
    cos = F.round(
        cosine_expr(F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")),
        6,
    )
    if method == "bruteforce":
        # the broadcast is JVM-side (no driver collect), but an
        # oversized query frame still multiplies every corpus
        # partition's work by |Q| — probe the bound first and point
        # at the lsh backend, mirroring _bounded_query_rows
        if queries.limit(max_queries + 1).count() > max_queries:
            raise ValueError(
                f"range_search: query set exceeds max_queries="
                f"{max_queries} for the exact broadcast path; use "
                f"method='lsh' (banded candidates + exact verify) for "
                f"corpus-scale query sets, or raise max_queries."
            )
        scored = c.crossJoin(F.broadcast(q)).select(
            "query_id", "nbr_id", cos.alias("cosine")
        )
    elif method == "lsh":
        from getl_spark.functions.dedup import _hyperplane_band_keys

        dim = embedding_dim(corpus, vec_col)
        keys_udf = _hyperplane_band_keys(bands, planes_per_band, dim, seed)
        ck = c.select(
            "*", F.posexplode(keys_udf(F.col("cvec"))).alias("band", "key")
        )
        qk = q.select(
            "*", F.posexplode(keys_udf(F.col("qvec"))).alias("band", "key")
        )
        # cosine computed before the distinct: it is deterministic per
        # pair, so deduping the scored 3-column rows equals pair-dedup
        # without shuffling the vectors themselves
        scored = (
            ck.join(qk, ["band", "key"])
            .select("query_id", "nbr_id", cos.alias("cosine"))
            .distinct()
        )
    else:
        raise ValueError(f"range_search: unknown method '{method}'")
    return scored.where(F.col("cosine") >= F.lit(float(threshold)))


def topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    model,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    exclude_self: bool = True,
    rerank: Optional[DataFrame] = None,
    rerank_factor: int = 4,
    max_queries: int = 10_000,
) -> DataFrame:
    """Approximate dot-product top-k over PQ codes with asymmetric
    distance computation (ADC): each query precomputes an (m, k_codes)
    lookup table of subvector dots against the codebooks, then scoring
    a corpus vector is m table lookups instead of d multiplies — and
    the corpus side travels as m-byte codes instead of d floats. At
    the defaults (m=8) that is a 32× byte cut and ~8× flop cut per
    (query, vector) pair versus brute force; on unit vectors the ADC
    dot approximates cosine with the PQ reconstruction error.

    ``corpus`` needs ``(id_col, code_col)`` (encode once with
    ``embedding.pq_encode``, persist the codes); queries bring raw
    vectors. The query set and its LUT tensor are broadcast via the
    Arrow UDF closure (bounded query sets, the ``topk_bruteforce``
    contract); per Arrow batch the scoring is one numpy gather+sum per
    query. Returns ``(query_id, nbr_id, score, rank)``.

    ADC scores carry the PQ reconstruction error (~k^(-1/subdim)), so
    raw ADC ranking blurs neighbors whose true similarity gap is below
    that error — the standard remedy is built in: pass the raw-vector
    table as ``rerank`` and the ADC pass becomes a shortlist of
    ``rerank_factor × k`` candidates per query (codes do the heavy
    scan; only shortlisted ids touch float vectors), re-scored with
    exact cosine. This is the published PQ search shape: compressed
    scan + exact re-rank, corpus bytes ~m per vector either way.

    Calibration (measured on this repo's worst case — UNstructured
    random 64-dim unit vectors, where neighbor gaps are smallest):
    m=8,k=32,rerank_factor=4 recalls only ~0.6, but m=16,k=64,rf=8
    recalls 1.0 and m=32,k=16,rf=4 recalls ~0.93. Real embedding
    corpora are manifold-shaped (PQ's favorable case); still, when in
    doubt raise m before k — code bytes grow linearly in m while
    subspace quantization error falls fast with shrinking subdim.
    """
    import numpy as np
    import pandas as pd

    from getl_spark.functions.embedding import _pq_batches

    books = _pq_batches(model)
    m, kc, ds = books.shape
    q_rows = _bounded_query_rows(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .where(F.col("qv").isNotNull()),
        "topk_pq",
        max_queries,
    )
    if not q_rows:
        raise ValueError("topk_pq: empty query set")
    q_ids = [r.qid for r in q_rows]
    q_mat = np.array([r.qv for r in q_rows], dtype="float64")
    if q_mat.shape[1] != m * ds:
        raise ValueError(
            f"topk_pq: query dim {q_mat.shape[1]} != codebook dim {m * ds}"
        )
    # LUT[q, j, c] = dot(q_sub_j, centroid_c_of_subspace_j)
    lut = np.einsum("qjd,jcd->qjc", q_mat.reshape(len(q_rows), m, ds), books)

    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"qi int, nbr_id {id_type}, score double"

    def score_batches(batches):
        for pdf in batches:
            codes = np.stack(pdf["code"].to_numpy()).astype("int64")  # (n, m)
            n = codes.shape[0]
            # scores[q, n] = sum_j LUT[q, j, codes[n, j]]
            scores = np.zeros((len(q_ids), n))
            for j in range(m):
                scores += lut[:, j, :][:, codes[:, j]]
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "qi": np.repeat(np.arange(len(q_ids), dtype="int32"), n),
                    "nbr_id": np.tile(ids, len(q_ids)),
                    "score": scores.reshape(-1),
                }
            )

    scored = (
        corpus.select(
            F.col(id_col).alias("id"), F.col(code_col).alias("code")
        )
        .where(F.col("code").isNotNull())
        .mapInPandas(score_batches, out_schema)
    )
    qmap = local_df(corpus.sparkSession,
        [(i, qid) for i, qid in enumerate(q_ids)],
        f"qi int, query_id {id_type}",
    )
    scored = scored.join(F.broadcast(qmap), "qi").drop("qi")
    if exclude_self:
        scored = scored.where(F.col("nbr_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    shortlist = k * rerank_factor if rerank is not None else k
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= shortlist)
    )
    if rerank is None:
        return top.select(
            "query_id", "nbr_id", F.round("score", 6).alias("score"), "rank"
        )
    c = with_norm(
        rerank.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("cvec"))
        .where(F.col("cvec").isNotNull()),
        "cvec",
    ).withColumnRenamed("norm", "cnorm")
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
        .where(F.col("qvec").isNotNull()),
        "qvec",
    ).withColumnRenamed("norm", "qnorm")
    rescored = (
        top.select("query_id", "nbr_id")
        .join(c, "nbr_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "nbr_id",
            F.round(
                cosine_expr(F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")),
                6,
            ).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "score", "rank")
    )


def _ivf_pq_assign(
    corpus: DataFrame, cent_n, books, id_col: str, vec_col: str,
    keep_vec: bool = False,
) -> DataFrame:
    """The IVF-PQ encode stage shared by ``build_ivf_pq_index`` and
    ``ivf_pq_append``: JVM cell assignment (centroid literals fold
    into the plan), Arrow residual encoding against the given
    codebooks. Returns ``(id, cell, code)``."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(cent_n, dtype="float64")
    books = np.asarray(books, dtype="float64")
    mm, kk, ds = books.shape

    def _encode_residual(vecs, cells):
        out = []
        mask = vecs.notna()
        codes = None
        if mask.any():
            x = np.stack(vecs[mask].to_numpy()).astype("float64")
            x = x - cents[cells[mask].to_numpy().astype("int64")]
            parts = []
            for j in range(mm):
                sub = x[:, j * ds : (j + 1) * ds]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                parts.append(d2.argmin(axis=1).astype("int8"))
            codes = np.stack(parts, axis=1)
        it = iter(codes.tolist() if codes is not None else [])
        for ok in mask:
            out.append(next(it) if ok else None)
        return pd.Series(out)

    assigned = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .where(F.col("v").isNotNull())
        .withColumn("cell", centroid_cells_expr(cents, F.col("v"))[0])
        .withColumn(
            "code",
            pandas_udf(_encode_residual, "array<tinyint>")(
                F.col("v"), F.col("cell")
            ),
        )
    )
    return assigned if keep_vec else assigned.select("id", "cell", "code")


def build_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    train_limit: int = 10000,
    kmeans_iters: int = 10,
    store_raw: bool = False,
) -> DataFrame:
    """Persist an IVF-PQ index — the billion-vector ANN layout: a
    k-means coarse quantizer shards the corpus into ``nlist`` cells
    and a product quantizer encodes each vector's RESIDUAL from its
    cell centroid into ``m`` code bytes (residuals are tighter than
    raw vectors, so the same code budget quantizes finer — the classic
    IVF-PQ design). Writes ``{path}/centroids`` (cell → centroid),
    ``{path}/codebooks`` (subspace, code → centroid piece), and
    ``{path}/codes`` (id, cell, m-byte code — partitioned by cell).
    Index bytes ≈ m + 1 per vector; a 10⁹-vector corpus indexes into
    ~10 GB, probe-pruned at query time.

    ``store_raw`` additionally persists ``{path}/raw`` (id, cell, full
    vector — cell-partitioned like the codes). Search never needs it;
    INGEST DEDUP does: ``dedup_against_index`` verifies against
    reconstructions whose error grows for vectors off the trained
    manifold — and the vectors that survive a dedup are by definition
    the off-manifold ones, so an index that keeps growing via
    ``ivf_pq_append`` should pay the raw sidecar (4·dim bytes/vector)
    for exact verify, exactly as the MinHash text index stores
    signatures beside fingerprints.

    Training is bounded-driver twice over (IVF centroids, then
    per-subspace residual k-means on the same ordered sample); both
    assignments run distributed (JVM cell expression, Arrow residual
    encode). Returns per-cell occupancy (the health check).
    """
    import numpy as np

    from getl_spark.functions.embedding import PQModel, _pq_batches, train_pq

    train = _collect_train_sample(corpus, id_col, vec_col, train_limit)
    cent_n = _train_centroids(
        corpus, id_col, vec_col, nlist, seed, train_limit, kmeans_iters,
        sample=train,
    )
    spark = corpus.sparkSession
    local_df(spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(cent_n)],
        "cell INT, centroid ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")

    # residual-train the PQ on the SAME bounded sample (one collect
    # total), assigned in numpy — residuals never round-trip Spark
    assign = (train @ cent_n.T).argmax(axis=1)
    residuals = train - cent_n[assign]
    pq = train_pq(
        corpus, id_col, vec_col, m=m, k=k, seed=seed,
        train_limit=train_limit, kmeans_iters=kmeans_iters,
        sample=residuals,
    )
    local_df(spark,
        [
            (j, c, [float(x) for x in cent])
            for j, book in enumerate(pq.codebooks)
            for c, cent in enumerate(book)
        ],
        "subspace INT, code INT, centroid ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")

    # distributed: assign cell (JVM), residual-encode (Arrow)
    assigned = _ivf_pq_assign(
        corpus, cent_n, _pq_batches(pq), id_col, vec_col, keep_vec=store_raw
    )
    if store_raw:
        assigned = assigned.transform(pin)
        assigned.select("id", "cell", "v").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(f"{path}/raw")
        assigned = assigned.select("id", "cell", "code")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes")
    return (
        spark.read.parquet(f"{path}/codes")
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cell")
    )


def _read_ivf_pq_model(spark, index_path: str):
    """Load a persisted IVF-PQ quantizer pair: (normalized centroid
    matrix, (m, k, subdim) codebook tensor). Bounded driver state —
    nlist·dim + m·k·subdim doubles."""
    import numpy as np

    cent_rows = (
        spark.read.parquet(f"{index_path}/centroids").orderBy("cell").collect()
    )
    cent_n = np.array([r.centroid for r in cent_rows], dtype="float64")
    book_rows = (
        spark.read.parquet(f"{index_path}/codebooks")
        .orderBy("subspace", "code")
        .collect()
    )
    mm = max(r.subspace for r in book_rows) + 1
    kk = max(r.code for r in book_rows) + 1
    books = np.array([r.centroid for r in book_rows], dtype="float64").reshape(
        mm, kk, -1
    )
    return cent_n, books


def _raw_sidecar(spark, index_path: str):
    """The optional ``{path}/raw`` exact-vector table, or None when
    the index was built without ``store_raw``."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(f"{index_path}/raw")
    except AnalysisException:
        return None


def ivf_pq_append(
    new_vectors: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    skip_existing: bool = True,
) -> DataFrame:
    """Grow a persisted ``build_ivf_pq_index`` with new vectors — the
    vector-side daily-ingest loop, symmetric with
    ``dedup.index_append``: encode the increment with the index's OWN
    quantizers (an append can never drift to different centroids or
    codebooks than the corpus was built with) and append the
    ``(id, cell, code)`` rows to the partitioned code table. No
    retraining, no rescan of the indexed corpus — the increment's cost
    is increment-sized.

    ``skip_existing`` anti-joins the increment against the indexed
    ids first, which makes a crashed-and-retried append idempotent
    (already-appended ids are skipped on the retry) and tolerates
    overlapping feeds. Returns the appended per-cell occupancy, so
    the caller can watch cells drift hot as the corpus grows (the
    signal to re-train with a larger ``nlist``).
    """
    import numpy as np

    spark = new_vectors.sparkSession
    cent_n, books = _read_ivf_pq_model(spark, index_path)
    mm, kk, ds = books.shape
    dim = embedding_dim(new_vectors, vec_col)
    if dim != mm * ds:
        raise ValueError(
            f"ivf_pq_append: vector dim {dim} != index dim {mm * ds}"
        )
    inc = new_vectors.where(F.col(vec_col).isNotNull())
    if skip_existing:
        existing = spark.read.parquet(f"{index_path}/codes").select(
            F.col("id").alias(id_col)
        )
        inc = inc.join(existing, id_col, "left_anti")
    # pin the encoded increment BEFORE the write: the plan is lazy, and
    # a post-write recompute would re-run the skip_existing anti-join
    # against the now-grown code table and see every row as existing
    has_raw = _raw_sidecar(spark, index_path) is not None
    assigned = _ivf_pq_assign(
        inc, cent_n, books, id_col, vec_col, keep_vec=has_raw
    ).transform(pin)
    if has_raw:
        # the sidecar grows with the codes so exact ingest verify
        # stays complete; codes are written LAST — they are the
        # membership source of truth (skip_existing here, the raw
        # semi-join in dedup_against_index), so a crash between the
        # two writes leaves only orphan raw rows that nothing reads as
        # members, and the replayed batch re-appends codes. The raw
        # write anti-joins the sidecar's own ids so that replay does
        # not duplicate the orphans it is reconciling (same id ⇒ same
        # vector — skipping the rewrite is lossless).
        raw_rows = assigned.select("id", "cell", "v")
        if skip_existing:
            raw_existing = spark.read.parquet(f"{index_path}/raw").select("id")
            raw_rows = raw_rows.join(raw_existing, "id", "left_anti")
        raw_rows.write.mode("append").partitionBy("cell").parquet(
            f"{index_path}/raw"
        )
        assigned = assigned.select("id", "cell", "code")
    assigned.write.mode("append").partitionBy("cell").parquet(
        f"{index_path}/codes"
    )
    return (
        assigned.groupBy("cell")
        .agg(F.count("*").alias("n_appended"))
        .orderBy("cell")
    )


def topk_ivf_pq(
    spark,
    queries: DataFrame,
    index_path: str,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    rerank: Optional[DataFrame] = None,
    rerank_factor: int = 4,
    max_queries: int = 10_000,
) -> DataFrame:
    """Query a persisted ``build_ivf_pq_index``: probe each query's
    ``nprobe`` nearest cells (partition pruning reads only those
    cells' code files), ADC-score the residual codes — score =
    q·centroid(cell) + Σⱼ LUT[j, codeⱼ] with the query-residual LUTs
    broadcast in the Arrow closure — and take top-k per query.
    Optional exact-cosine ``rerank`` of a ``rerank_factor×k``
    shortlist against a raw-vector table, exactly like ``topk_pq`` —
    pass ``rerank="index"`` to rerank against the index's own
    ``store_raw=True`` sidecar (no external raw table needed).
    Per-query scan cost: (nprobe/nlist)·corpus codes at m bytes each —
    the two prunings multiply.
    """
    import numpy as np
    import pandas as pd

    cent_n, books = _read_ivf_pq_model(spark, index_path)
    mm, kk, ds = books.shape
    if isinstance(rerank, str):
        if rerank != "index":
            raise ValueError(
                f"topk_ivf_pq: rerank must be a DataFrame or 'index', "
                f"got {rerank!r}"
            )
        raw = _raw_sidecar(spark, index_path)
        if raw is None:
            raise ValueError(
                "topk_ivf_pq: rerank='index' needs the store_raw=True "
                "sidecar ({path}/raw)"
            )
        rerank = raw.select(F.col("id").alias(id_col), F.col("v").alias(vec_col))

    q_rows = _bounded_query_rows(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .where(F.col("qv").isNotNull()),
        "topk_ivf_pq",
        max_queries,
    )
    if not q_rows:
        raise ValueError("topk_ivf_pq: empty query set")
    q_ids = [r.qid for r in q_rows]
    q_mat = np.array([r.qv for r in q_rows], dtype="float64")
    if q_mat.shape[1] != mm * ds:
        raise ValueError(
            f"topk_ivf_pq: query dim {q_mat.shape[1]} != codebook dim {mm * ds}"
        )
    # per-query probed cells + per-(query, cell) bias q·centroid
    cell_dots = q_mat @ cent_n.T  # (Q, nlist)
    probes = np.argsort(-cell_dots, axis=1)[:, :nprobe]  # (Q, nprobe)
    lut = np.einsum("qjd,jcd->qjc", q_mat.reshape(len(q_ids), mm, ds), books)
    probe_sets = [set(int(c) for c in row) for row in probes]

    id_type = queries.schema[id_col].dataType.simpleString()
    out_schema = f"qi int, nbr_id {id_type}, score double"

    def score_batches(batches):
        for pdf in batches:
            codes = np.stack(pdf["code"].to_numpy()).astype("int64")
            cells = pdf["cell"].to_numpy().astype("int64")
            ids = pdf["id"].to_numpy()
            frames = []
            for qi in range(len(q_ids)):
                mask = np.isin(cells, list(probe_sets[qi]))
                if not mask.any():
                    continue
                c, cl, idm = codes[mask], cells[mask], ids[mask]
                s = cell_dots[qi][cl].astype("float64")
                for j in range(mm):
                    s = s + lut[qi, j, :][c[:, j]]
                frames.append(
                    pd.DataFrame({"qi": qi, "nbr_id": idm, "score": s})
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cells_wanted = sorted({c for s in probe_sets for c in s})
    codes_df = spark.read.parquet(f"{index_path}/codes").where(
        F.col("cell").isin(cells_wanted)  # partition pruning
    )
    scored = codes_df.mapInPandas(score_batches, out_schema)
    qmap = local_df(spark,
        [(i, qid) for i, qid in enumerate(q_ids)],
        f"qi int, query_id {id_type}",
    )
    scored = scored.join(F.broadcast(qmap), "qi").drop("qi")
    if exclude_self:
        scored = scored.where(F.col("nbr_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    shortlist = k * rerank_factor if rerank is not None else k
    top = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= shortlist
    )
    if rerank is None:
        return top.select(
            "query_id", "nbr_id", F.round("score", 6).alias("score"), "rank"
        )
    c = with_norm(
        rerank.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("cvec"))
        .where(F.col("cvec").isNotNull()),
        "cvec",
    ).withColumnRenamed("norm", "cnorm")
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
        .where(F.col("qvec").isNotNull()),
        "qvec",
    ).withColumnRenamed("norm", "qnorm")
    rescored = (
        top.select("query_id", "nbr_id")
        .join(c, "nbr_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "nbr_id",
            F.round(
                cosine_expr(F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")),
                6,
            ).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "score", "rank")
    )


def dedup_against_index(
    new_vectors: DataFrame,
    index_path: str,
    threshold: float = 0.9,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    verify: str = "auto",
) -> DataFrame:
    """Drop every new vector with a near-duplicate already in a
    persisted ``build_ivf_pq_index`` — the vector-side analog of
    ``dedup.against_stored_index``, and the dedup half of the
    embedding daily-ingest loop (filter the increment here, then
    ``ivf_pq_append`` the survivors). Returns the surviving rows of
    ``new_vectors``.

    Fully distributed — no driver-side query LUTs, so the increment
    can be corpus-sized: each new vector probes its ``nprobe``
    nearest cells with the stored centroids (JVM literal expression),
    joins the cell-partitioned index table on the cell key, and
    verifies exact cosine. Candidates = Σ_cell |increment_cell| ×
    |index_cell| — the SemDeDup cell-join shape against persisted
    state.

    ``verify`` picks the index side of the cosine:

    * ``'raw'`` — the exact stored vectors (requires the
      ``store_raw=True`` sidecar). EXACT verify at any threshold,
      regardless of how far the index has grown off its training
      manifold. The right mode for a growing ingest-dedup index.
    * ``'reconstruction'`` — centroid + decoded PQ residual (pure JVM
      array expressions; no extra storage). Sketch-level, like the
      MinHash index's signature-agreement phase: the cosine carries
      the PQ quantization error, so copies of vectors the codebooks
      quantize well score ≈ 1, while an increment far off the
      training distribution reconstructs poorly (self-scores can fall
      to ~0.5) — the signal to re-train or to store the raw sidecar.
    * ``'auto'`` (default) — raw when the sidecar exists, else
      reconstruction.

    An id already present in the index counts as its own duplicate.
    """
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(
            f"dedup_against_index: threshold must be in [-1, 1], got "
            f"{threshold}"
        )
    if verify not in ("auto", "raw", "reconstruction"):
        raise ValueError(
            f"dedup_against_index: verify must be auto|raw|reconstruction, "
            f"got {verify!r}"
        )
    import numpy as np

    spark = new_vectors.sparkSession
    cent_n, books = _read_ivf_pq_model(spark, index_path)
    nlist = len(cent_n)
    nprobe = min(nprobe, nlist)
    mm, kk, ds = books.shape
    dim = embedding_dim(new_vectors, vec_col)
    if dim != mm * ds:
        raise ValueError(
            f"dedup_against_index: vector dim {dim} != index dim {mm * ds}"
        )

    raw = _raw_sidecar(spark, index_path) if verify in ("auto", "raw") else None
    if verify == "raw" and raw is None:
        raise ValueError(
            "dedup_against_index: verify='raw' needs the store_raw=True "
            "sidecar ({path}/raw) — rebuild with store_raw or use "
            "verify='reconstruction'"
        )
    if raw is not None:
        # exact verify against the stored vectors. Membership is the
        # CODES table, not the sidecar: ivf_pq_append writes raw before
        # codes, so a crash between the two leaves orphan raw rows — if
        # they counted as members, a replayed ingest batch would see
        # its survivors "already present", filter them out, and the
        # codes append would never complete (ids permanently invisible
        # to topk_ivf_pq). Semi-joining raw onto codes ignores orphans,
        # so the replay re-admits those rows and append reconciles.
        members = spark.read.parquet(f"{index_path}/codes").select("id")
        raw = raw.join(members, "id", "left_semi")
        idx = raw.select(
            "cell",
            F.col("v").alias("__rv"),
            norm_expr(F.col("v")).alias("__rn"),
        )
    else:
        # reconstructed vector = centroid[cell] + decoded residual
        cent_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in cent_n]
        )
        pieces = [
            F.element_at(
                F.array(
                    *[F.array(*[F.lit(float(x)) for x in cent]) for cent in books[j]]
                ),
                F.col("code")[j].cast("int") + F.lit(1),
            )
            for j in range(mm)
        ]
        recon = F.zip_with(
            F.element_at(cent_lit, F.col("cell").cast("int") + F.lit(1)),
            F.concat(*pieces),
            lambda a, b: a + b,
        )
        idx = (
            spark.read.parquet(f"{index_path}/codes")
            .where(F.col("code").isNotNull())
            .withColumn("__rv", recon)
            .select(
                "cell", F.col("__rv"), norm_expr(F.col("__rv")).alias("__rn")
            )
        )

    q = with_norm(
        new_vectors.select(
            F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qv")
        ).where(F.col("__qv").isNotNull()),
        "__qv",
    ).withColumnRenamed("norm", "__qn")
    probed = q.select(
        "__qid", "__qv", "__qn",
        F.explode(
            centroid_cells_expr(cent_n, F.col("__qv"), nassign=nprobe)
        ).alias("cell"),
    )
    cos = cosine_expr(
        F.col("__qv"), F.col("__rv"), F.col("__qn"), F.col("__rn")
    )
    dup_ids = (
        probed.join(idx, "cell")
        .where(cos >= F.lit(float(threshold)))
        .select(F.col("__qid").alias(id_col))
        .distinct()
    )
    return new_vectors.join(dup_ids, id_col, "left_anti")


def recall_eval(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_col: str = "query_id",
    nbr_col: str = "nbr_id",
    round_to: int = 6,
) -> DataFrame:
    """ANN quality readout: recall@k of an approximate top-k result
    against the exact (brute-force) result ON THE SAME QUERIES — the
    number that decides whether an IVF probe count / LSH band setting
    is shippable, measured instead of guessed. Feed it any two frames
    shaped like the ``topk_*`` outputs (``query_col``, ``nbr_col``,
    optional rank — rows beyond rank ≤ k are ignored if a ``rank``
    column is present).

    One row: ``(n_queries, k, mean_recall, min_recall, perfect_frac,
    missing_queries)``. Per-query recall = |approx ∩ exact| /
    |exact-truth for that query| (≤ k — queries whose corpus has
    fewer than k neighbors are not penalized for the shortfall).
    ``missing_queries`` counts queries present in the exact frame with
    NO approx rows at all (e.g. an LSH query whose bands matched
    nothing) — they score recall 0 AND are surfaced separately,
    because silent empty results are the failure mode that averages
    hide. A query whose approx rows exist but are all WRONG also
    scores recall 0 yet is NOT missing — that is a ranking failure,
    not an empty-retrieval one, and the two need different fixes
    (more probes/bands vs a better metric). Queries only in ``approx``
    (no truth rows) are ignored.

    Shape: one (query, nbr) equi-join + a query-keyed count agg + a
    1-row reduce — truth side is query-set-sized (n_queries × k), so
    at corpus scale this costs what the ANN run already cost, nothing
    more.
    """
    if k < 1:
        raise ValueError(f"recall_eval: k must be >= 1, got {k}")

    def _prep(df, name):
        cols = [F.col(query_col).alias("__q"), F.col(nbr_col).alias("__n")]
        out = df
        if "rank" in df.columns:
            out = out.where(F.col("rank") <= k)
        return out.select(*cols).distinct()

    a = _prep(approx, "approx")
    e = _prep(exact, "exact")
    truth = e.groupBy("__q").agg(F.count("*").cast("bigint").alias("__t"))
    hits = (
        e.join(a, ["__q", "__n"], "left_semi")
        .groupBy("__q")
        .agg(F.count("*").cast("bigint").alias("__h"))
    )
    # "missing" = the approx frame has NO rows for the query (presence
    # probed on query id, not on hit count — zero CORRECT rows with
    # wrong rows present is a ranking failure, not a missing query)
    present = a.select("__q").distinct().withColumn("__p", F.lit(1))
    per_q = (
        truth.join(hits, "__q", "left")
        .join(present, "__q", "left")
        .select(
            "__q",
            "__t",
            F.coalesce("__h", F.lit(0)).alias("__h"),
            (F.coalesce("__h", F.lit(0)).cast("double") / F.col("__t")).alias(
                "__r"
            ),
            F.col("__p").isNull().cast("int").alias("__miss"),
        )
    )
    return per_q.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.lit(int(k)).alias("k"),
        F.round(F.avg("__r"), round_to).alias("mean_recall"),
        F.round(F.min("__r"), round_to).alias("min_recall"),
        F.round(
            F.avg((F.col("__h") == F.col("__t")).cast("double")), round_to
        ).alias("perfect_frac"),
        F.sum("__miss").cast("bigint").alias("missing_queries"),
    )


def knn_label(
    labeled: DataFrame,
    unlabeled: DataFrame,
    k: int = 5,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "bruteforce",
    **retrieval_kwargs,
) -> DataFrame:
    """Weak labeling by k-NN majority vote: every unlabeled vector
    takes the most common label among its k nearest LABELED neighbors
    — the cheapest way to stretch an expensive seed set (human labels,
    LLM-judged quality grades) across a whole corpus, and the standard
    "is this cluster's label coherent?" probe before training on it.
    Treat the output as CANDIDATE labels with a confidence gate, not
    ground truth: ``vote_share`` (winning votes / k-neighbors found)
    is the filter — ≥ 0.8 votes is a usable weak label, ~0.5 is a
    coin flip sitting on a decision boundary.

    One row per unlabeled vector: ``(id_col, knn_label, votes,
    n_neighbors, vote_share)`` — ties break to the lexicographically
    smallest label (deterministic across engines); vectors whose
    retrieval returned nothing (possible under ``method='lsh'`` —
    empty bands) are absent, which is a surfaced retrieval problem,
    not a labeling one (``recall_eval`` measures it).

    Scale shape: the retrieval leg is ``topk_between`` (broadcast
    brute force, or the LSH/IVF scale paths via ``method``), then ONE
    (query, label)-keyed count aggregate and a query-keyed max — the
    vote never materializes more than queries × k rows. Labels join
    onto neighbors by the corpus id (keyed join, labeled side is the
    seed set — usually broadcastable).
    """
    if k < 1:
        raise ValueError(f"knn_label: k must be >= 1, got {k}")
    # NULL-label seeds are excluded BEFORE retrieval: they cannot vote,
    # so letting them occupy neighbor slots would silently dilute every
    # vote they appear in
    seeds = labeled.where(F.col(label_col).isNotNull())
    nbrs = topk_between(
        unlabeled,
        seeds,
        k=k,
        query_id_col=id_col,
        corpus_id_col=id_col,
        vec_col=vec_col,
        method=method,
        **retrieval_kwargs,
    ).select("query_id", "nbr_id")
    lab = seeds.select(
        F.col(id_col).alias("__lid"),
        F.col(label_col).cast("string").alias("__lab"),
    )
    # pinned: totals / top_votes / winner all branch from this frame,
    # and without the pin each branch RE-RUNS the whole retrieval leg
    # (IVF fit + assign + top-k) — three evaluations of the expensive
    # subtree to read one (query × label)-bounded table (r13 measured:
    # knn_label_ivf 9.7 s → the pin collapses it to one retrieval).
    # Size is ≤ queries × k rows, the same class the retrieval already
    # shuffles, so the materialization is scale-safe by construction.
    votes = pin(
        nbrs.join(lab, nbrs["nbr_id"] == lab["__lid"])
        .groupBy("query_id", "__lab")
        .agg(F.count("*").cast("bigint").alias("__votes"))
    )
    totals = votes.groupBy("query_id").agg(
        F.sum("__votes").cast("bigint").alias("n_neighbors"),
    )
    # deterministic argmax: the max vote count, then the
    # lexicographically smallest label among the tied winners
    top_votes = votes.groupBy("query_id").agg(
        F.max("__votes").alias("__maxv")
    )
    winner = (
        votes.join(top_votes, "query_id")
        .where(F.col("__votes") == F.col("__maxv"))
        .groupBy("query_id")
        .agg(
            F.min("__lab").alias("knn_label"),
            F.max("__votes").cast("bigint").alias("votes"),
        )
    )
    out = winner.join(
        totals.select("query_id", "n_neighbors"), "query_id"
    )
    return out.select(
        F.col("query_id").alias(id_col),
        "knn_label",
        "votes",
        "n_neighbors",
        F.round(
            F.col("votes").cast("double") / F.col("n_neighbors"), 6
        ).alias("vote_share"),
    )


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "query_id",
    nbr_col: str = "nbr_id",
    score_col: str = "cosine",
    max_candidates: int = 10_000,
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein,
    SIGIR'98 — public literature) of an ANN/BM25 candidate list:
    greedily pick the candidate maximizing
    ``lam·relevance − (1−lam)·max_cosine_to_already_selected`` — the
    standard de-redundancy pass between retrieval and a context
    window. A plain top-k hands an LLM five near-identical passages;
    MMR at ``lam≈0.7`` keeps the relevant ones that say something NEW
    — same knob RAG stacks expose.

    ``candidates`` is any per-query ranked list carrying
    ``(query_col, nbr_col, score_col)`` — the exact output shape of
    ``topk_bruteforce`` / ``topk_ivf`` / ``search.bm25_topk`` (pass
    ``score_col='score'`` for BM25/dot legs). Candidate vectors come
    from ``corpus`` by equi-join on ``nbr_col = id_col`` (candidates
    whose id is absent from the corpus drop — they cannot be compared
    for redundancy). Returns
    ``(query_col, nbr_col, score_col, mmr_score, rank)`` with rank 1
    = first greedy pick; ``mmr_score`` is the value that won the pick
    (for rank 1 nothing is selected yet, so the diversity term is 0
    and the score is ``lam·relevance``). All ties break toward the smaller
    neighbor id, so the result is fully deterministic.

    Scale shape: the greedy loop is inherently sequential PER QUERY
    but embarrassingly parallel ACROSS queries, and it runs on a
    candidate list someone already capped (a rerank of top-N, not a
    corpus scan). So: one equi-join to attach vectors (broadcast when
    the candidate side is small), one Arrow-batched ``applyInPandas``
    keyed by query — state per task is one O(N·d) group. The UDF
    fail-louds beyond ``max_candidates`` rows per query rather than
    quietly buffering an unbounded group (the documented guard
    pattern; an uncapped candidate generator is an upstream bug this
    operator must not absorb).
    """
    import numpy as np
    import pandas as pd

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"mmr_rerank: lam must be in [0, 1], got {lam}")
    if k < 1:
        raise ValueError(f"mmr_rerank: k must be >= 1, got {k}")
    for c in (query_col, nbr_col, score_col):
        if c not in candidates.columns:
            raise ValueError(
                f"mmr_rerank: candidates is missing column '{c}'"
            )

    vecs = corpus.select(
        F.col(id_col).alias(nbr_col), F.col(vec_col).alias("__vec")
    ).where(F.col("__vec").isNotNull())
    joined = candidates.select(query_col, nbr_col, score_col).join(
        vecs, nbr_col
    )

    out_schema = (
        f"{query_col} {joined.schema[query_col].dataType.simpleString()}, "
        f"{nbr_col} {joined.schema[nbr_col].dataType.simpleString()}, "
        f"{score_col} double, mmr_score double, rank int"
    )
    kk, ll, cap = int(k), float(lam), int(max_candidates)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:
            raise ValueError(
                f"mmr_rerank: query group '{pdf[query_col].iloc[0]}' has "
                f"{len(pdf)} candidates > max_candidates={cap}; rerank a "
                "capped top-N list, or raise max_candidates deliberately"
            )
        # deterministic candidate order: id ascending
        pdf = pdf.sort_values(nbr_col, kind="mergesort").reset_index(drop=True)
        mat = np.array(pdf["__vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        safe = np.where(norms > 0, norms, 1.0)
        unit = mat / safe[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        max_sim = np.full(n, -np.inf)  # to selected set; -inf = empty
        picked: list = []
        scores: list = []
        remaining = np.ones(n, dtype=bool)
        for _ in range(min(kk, n)):
            div = np.where(np.isneginf(max_sim), 0.0, max_sim)
            mmr = ll * rel - (1.0 - ll) * div
            mmr_masked = np.where(remaining, mmr, -np.inf)
            best = int(np.argmax(mmr_masked))  # first = smallest id on ties
            picked.append(best)
            scores.append(mmr_masked[best])
            remaining[best] = False
            sims = unit @ unit[best]
            max_sim = np.maximum(max_sim, sims)
        sel = pdf.iloc[picked]
        return pd.DataFrame(
            {
                query_col: sel[query_col].to_numpy(),
                nbr_col: sel[nbr_col].to_numpy(),
                score_col: np.round(sel[score_col].to_numpy(np.float64), 6),
                "mmr_score": np.round(np.array(scores), 6),
                "rank": np.arange(1, len(picked) + 1, dtype=np.int32),
            }
        )

    return joined.groupBy(query_col).applyInPandas(greedy, out_schema)
