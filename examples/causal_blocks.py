"""Code blocks for examples/causal_kit.yaml: the observational-analysis
workflow — build a unit panel with a propensity score, construct
matched pairs (stats.psm_match), check covariate balance
(stats.ipw_balance), and read the effect with the confounder-cancelling
estimator (stats.diff_in_diff). One ``resolve`` dispatching on
``CustomProps.step`` (the python_codeblock contract)."""

from pyspark.sql import functions as F

from getl_spark.functions import stats


def _panel(params):
    """Unit-level panel from the customer table. The propensity here is
    a DETERMINISTIC logistic score of the confounder (account balance)
    — in a real analysis plug in your model's calibrated probability
    (e.g. quality.train_classifier + platt_calibrate); everything
    downstream only needs a (0,1) column. Treatment is deliberately
    CONFOUNDED with balance (richer customers opt in more), which is
    exactly the bias matching/weighting must remove."""
    cust = params["dataframes"]["LoadCustomer"]
    z = (F.col("c_acctbal") - F.lit(4500.0)) / F.lit(3000.0)
    propensity = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    # confounded assignment: treated iff a balance-linked hash clears
    # the unit's own propensity band (deterministic, no RNG state)
    band = (F.abs(F.xxhash64("c_custkey")) % 1000) / 1000.0
    treated = (band < propensity).cast("int")
    # outcome with a KNOWN effect: y = balance/1000 + 2·treated — the
    # raw treated-vs-control mean gap is inflated by the confounder
    # (treated skew rich), the matched ATT should recover ~2
    return cust.select(
        "c_custkey",
        F.col("c_acctbal").alias("balance"),
        F.col("c_nationkey").cast("double").alias("nation"),
        F.round(propensity, 6).alias("propensity"),
        treated.alias("treated"),
        (F.col("c_acctbal") / F.lit(1000.0) + F.lit(2.0) * treated).alias("y"),
    )


def _match(params):
    """Matched pairs: every treated customer gets its closest-propensity
    control within the caliper (with replacement — the deterministic,
    parallel form). Treated units with no comparable control simply
    produce no pair; a large unmatched share means the groups do not
    overlap and no estimator should be trusted."""
    panel = params["dataframes"]["Panel"]
    return stats.psm_match(
        panel, "treated", "propensity", "c_custkey",
        caliper=float(params.get("caliper", 0.02)),
    )


def _balance(params):
    """Did the design work? Standardized mean differences per covariate
    before/after stabilized IPW weighting — |SMD| < 0.1 is the pass
    bar. Run it on the SAME panel the matching used; if balance fails
    here, the matched readout inherits the confounding."""
    panel = params["dataframes"]["Panel"]
    return stats.ipw_balance(
        panel, "treated", "propensity", ["balance", "nation"]
    )


def _effect(params):
    """The rollout readout on the matched population: diff-in-diff over
    a mid-month cutover cancels both the permanent treated/control gap
    and the common time shock. Events join to matched units only —
    treated ids from the pairs' left side, their matched controls from
    the right — so the comparison runs on comparable units."""
    ev = params["dataframes"]["LoadEvents"]
    pairs = params["dataframes"]["Matched"]
    treated = pairs.select(
        F.col("treated_id").alias("user_id"), F.lit("treat").alias("grp")
    ).distinct()
    controls = pairs.select(
        F.col("control_id").alias("user_id"), F.lit("ctrl").alias("grp")
    ).distinct()
    units = treated.unionByName(controls)
    ts = F.col("ts").cast("timestamp")
    panel = (
        ev.where(ts.isNotNull() & F.col("value").isNotNull())
        .withColumn("user_id", F.pmod(F.col("user_id"), F.lit(1500)))
        .join(F.broadcast(units), "user_id")
        .select(
            "grp",
            F.when(F.dayofmonth(ts) >= 15, F.lit("post"))
            .otherwise(F.lit("pre")).alias("phase"),
            F.col("value"),
        )
    )
    return stats.diff_in_diff(
        panel, "grp", "phase", "value",
        control="ctrl", treatment="treat", pre="pre", post="post",
    )


def _att(params):
    """The matched-pairs readout: mean treated-minus-matched-control
    outcome difference with the with-replacement-aware SE. On this
    panel the true effect is 2.0 by construction; the naive
    treated-vs-control mean gap overstates it because treatment is
    confounded with balance — the matched ATT is the honest number."""
    panel = params["dataframes"]["Panel"]
    pairs = params["dataframes"]["Matched"]
    return stats.psm_att(panel, pairs, "y", "c_custkey")


_STEPS = {
    "panel": _panel,
    "match": _match,
    "balance": _balance,
    "effect": _effect,
    "att": _att,
}


def resolve(params):
    return _STEPS[params["step"]](params)
