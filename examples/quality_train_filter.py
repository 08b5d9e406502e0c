"""Code block for examples/quality_filter.yaml: weak-supervision
quality curation — heuristic rules label the obvious extremes (long
prose = good, scraps = junk), a hashed-n-gram logistic classifier
generalizes to the unlabeled middle, and the corpus keeps only docs
the model scores above the threshold."""

from pyspark.sql import functions as F

from getl_spark.functions import quality, text


def resolve(params):
    docs = params["dataframes"]["LoadDocs"]
    # CustomProps are flattened into params top-level by python_codeblock
    threshold = float(params.get("threshold", 0.5))

    sig = text.quality(docs)
    labeled = sig.select(
        "doc_id",
        "text",
        F.when(F.col("q_n_words") >= 60, F.lit(1.0))
        .when(F.col("q_n_words") < 20, F.lit(0.0))
        .alias("label"),
    ).where(F.col("label").isNotNull())
    model = quality.train_classifier(labeled, dim=512, max_iter=30)
    return quality.filter_by_score(
        docs, model, threshold=threshold, keep_score=True
    )
