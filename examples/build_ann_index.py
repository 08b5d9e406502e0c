"""Code block for examples/semantic_search.yaml: persist an IVF-PQ
index for the embedding corpus (cells × residual code bytes) and
return the per-cell occupancy summary as the block's result."""

from getl_spark.functions import similarity


def resolve(params):
    emb = params["dataframes"]["LoadEmbeddings"]
    return similarity.build_ivf_pq_index(
        emb, params["index_path"], nlist=8, m=16, k=32, seed=7
    )
