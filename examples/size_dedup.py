"""Code block for examples/dedup_sizing.yaml: budget-driven dedup
sizing — profile the shingle document-frequency distribution, pick the
largest ``max_df`` whose cumulative candidate-pair mass fits the
budget, then run the exact n-gram Jaccard join at that cap.

The profile is at most ~64 bucket rows (one per power-of-two df), so
collecting it to the driver is metadata-plane. For corpora where even
the capped exact join is too big, `dedup.minhash_params` sizes the
MinHash banding instead (same decision, sketch-based join).
"""

from getl_spark.functions import dedup

# candidate pairs we are willing to pay for in the self-join; at full
# scale this comes from cluster size x time budget, not a constant
CANDIDATE_BUDGET = 200_000.0


def resolve(params):
    docs = params["dataframes"]["LoadDocs"]
    profile = sorted(
        dedup.shingle_profile(docs, n=3).collect(), key=lambda r: r.df_lo
    )
    kept, max_df = 0.0, 1
    for r in profile:
        if kept + r.pair_mass > CANDIDATE_BUDGET:
            break
        kept += r.pair_mass
        max_df = r.df_hi
    return dedup.ngram_jaccard(docs, n=3, threshold=0.5, max_df=int(max_df))
