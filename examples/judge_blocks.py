"""Code blocks for examples/judge_reliability.yaml: the judge-panel
reliability lifecycle over the documents table, dispatched on
``CustomProps.step``.

The "panel": three deterministic hash-derived LLM judges each score
every document 1-10 around a shared doc-quality signal with
judge-specific noise and a per-judge scale shift. Each reliability
lens answers a different question about the same panel:
``cronbach_alpha`` — do the scores co-vary (is the 3-judge mean
signal)?; ``kendall_w`` — do the judges ORDER the documents the same
way (the leaderboard question)?; ``krippendorff_alpha`` — same
question after a deterministic 20% of ratings go missing (the real
crowdsourced shape — cronbach/kendall loud-fail there by contract);
``cohens_kappa`` — chance-corrected agreement of two judges'
pass/fail cuts; ``bt_ratings`` — Bradley-Terry strengths when the
panel is recast as pairwise battles between judges' picks.
"""

from pyspark.sql import functions as F

from getl_spark.functions import stats

JUDGES = ["j_alpha", "j_beta", "j_gamma"]


def _panel(df):
    """Long-format (item, judge, score): shared per-doc signal +
    judge noise + a per-judge constant shift (alpha/W are shift-immune,
    so the shift is free realism)."""
    docs = df.where(F.col("doc_id").isNotNull()).select("doc_id")
    legs = []
    for i, j in enumerate(JUDGES):
        sig = F.pmod(F.xxhash64("doc_id"), F.lit(1000)) / 100.0
        noise = (
            F.pmod(F.xxhash64("doc_id", F.lit(j)), F.lit(300)) / 100.0
        )
        legs.append(
            docs.select(
                F.col("doc_id").alias("item"),
                F.lit(j).alias("judge"),
                F.round(sig + noise + F.lit(float(i)) * 0.5, 2).alias(
                    "score"
                ),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def resolve(params):
    step = params["step"]
    panel = _panel(params["dataframes"]["LoadDocs"])
    if step == "cronbach":
        return stats.cronbach_alpha(panel, "item", "judge", "score")
    if step == "kendall":
        return stats.kendall_w(panel, "item", "judge", "score")
    if step == "krippendorff":
        # deterministic ~20% of ratings missing: the incomplete-panel
        # case the two ops above loud-fail on by contract
        sparse = panel.where(
            F.pmod(F.xxhash64("item", "judge", F.lit("drop")), F.lit(5))
            != 0
        )
        return stats.krippendorff_alpha(
            sparse, "item", "score", metric="interval"
        )
    if step == "kappa":
        # two judges' pass/fail cuts on their own score medians-ish bar
        wide = (
            panel.groupBy("item")
            .pivot("judge", JUDGES)
            .agg(F.first("score"))
        )
        cuts = wide.select(
            (F.col("j_alpha") > 7.0).cast("string").alias("a_pass"),
            (F.col("j_beta") > 7.5).cast("string").alias("b_pass"),
        )
        return stats.cohens_kappa(cuts, "a_pass", "b_pass")
    if step == "arena":
        # recast as battles: per item, alpha's pick vs beta's pick,
        # winner = whichever judge gamma's score seconds
        wide = (
            panel.groupBy("item")
            .pivot("judge", JUDGES)
            .agg(F.first("score"))
        )
        battles = wide.select(
            F.lit("j_alpha").alias("model_a"),
            F.lit("j_beta").alias("model_b"),
            F.when(F.col("j_alpha") > F.col("j_beta") + 0.3, "j_alpha")
            .when(F.col("j_beta") > F.col("j_alpha") + 0.3, "j_beta")
            .otherwise("tie")
            .alias("winner"),
        )
        return stats.bt_ratings(battles)
    raise ValueError(f"unknown step {step!r}")
