"""Code block for examples/training_mixture.yaml: candidate pairs →
connected components → keep the cluster-min document."""

from getl_spark.functions import graph


def resolve(params):
    docs = params["dataframes"]["LoadDocs"]
    pairs = params["dataframes"]["NearDupPairs"]
    return graph.dedup_by_component(docs, pairs, id_col="doc_id")
