"""Code blocks for examples/layout_health.yaml: the small-files
health loop over a file-backed scan, dispatched on
``CustomProps.step``.

diagnose (``file_profile``: per-file row counts, metadata-plane) →
judge (``file_skew_report``: one-row skew/avg rollup) → plan
(``compaction_plan``: the deterministic rewrite work-list — which
small files co-rewrite into which output group, healthy files left
alone). The plan step is what a scheduled OPTIMIZE job consumes.
"""

from getl_spark.functions import layout


def resolve(params):
    step = params["step"]
    scan = params["dataframes"]["LoadLineitem"]
    if step == "profile":
        return layout.file_profile(scan)
    if step == "skew":
        return layout.file_skew_report(scan)
    if step == "plan":
        prof = layout.file_profile(scan)
        return layout.compaction_plan(
            prof, target=int(params.get("target", 500_000))
        )
    raise ValueError(f"unknown step {step!r}")
