"""Code blocks for examples/experiment_readout.yaml: the full
experiment-readout lifecycle over the events table, dispatched on
``CustomProps.step``.

The "experiment": users split 50/50 by id parity, metric = event
value. The validity gate runs FIRST (a failed SRM makes every later
number meaningless), then the plain readout, the CUPED-adjusted
readout (covariate: the user's id-derived pseudo pre-period score —
deliberately uncorrelated here, so ``var_reduction ~ 0`` shows what a
useless covariate looks like), the TOST equivalence proof, the k-arm
ANOVA omnibus gate (3-way split), and the censoring-aware survival
readout (Kaplan-Meier curves + the log-rank arm comparison over an
id-derived duration with ~70% event rate).
"""

from pyspark.sql import functions as F

from getl_spark.functions import stats


def _assign(df):
    return df.where(F.col("user_id").isNotNull()).select(
        F.when(F.col("user_id") % 2 == 0, F.lit("control"))
        .otherwise(F.lit("treatment"))
        .alias("arm"),
        F.col("value").alias("metric"),
        # pseudo pre-period covariate (uncorrelated by construction)
        (F.col("user_id") % 97).cast("double").alias("pre_metric"),
    )


def resolve(params):
    step = params["step"]
    ev = _assign(params["dataframes"]["LoadEvents"])
    if step == "srm":
        return stats.srm(ev, "arm", {"control": 0.5, "treatment": 0.5})
    if step == "readout":
        return stats.ab_compare(ev, "arm", "metric", "control", "treatment")
    if step == "cuped":
        return stats.cuped(
            ev, "arm", "metric", "pre_metric", "control", "treatment"
        )
    if step == "equivalence":
        return stats.tost_equivalence(
            ev, "arm", "metric", "control", "treatment", margin=5.0
        )
    if step == "anova":
        three = params["dataframes"]["LoadEvents"].where(
            F.col("user_id").isNotNull()
        ).select(
            (F.col("user_id") % 3).cast("string").alias("arm"),
            F.col("value").alias("metric"),
        )
        return stats.anova(three, "arm", "metric")
    if step in ("survival", "log_rank"):
        surv = params["dataframes"]["LoadEvents"].select(
            F.when(F.col("user_id") % 2 == 0, F.lit("control"))
            .otherwise(F.lit("treatment"))
            .alias("arm"),
            (F.col("event_id") % 30 + 1).cast("double").alias("dur"),
            (F.col("event_id") % 10 < 7).cast("int").alias("churned"),
        )
        if step == "survival":
            return stats.kaplan_meier(
                surv, "dur", "churned", group_by="arm"
            )
        return stats.log_rank(
            surv, "dur", "churned", "arm", "control", "treatment"
        )
    raise ValueError(f"unknown step {step!r}")
