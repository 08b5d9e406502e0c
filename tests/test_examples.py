"""Every example lift definition in examples/ runs end-to-end against
the driver testdata — runnable documentation that cannot rot."""

from __future__ import annotations

import glob
import json
import os

import pytest

from getl_spark import lift

SF = "/root/testdata/sf0.001"
EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")

STANDARD = sorted(
    os.path.basename(p)
    for p in glob.glob(f"{EXAMPLES}/*.yaml")
    if os.path.basename(p) not in ("incremental_ingest.yaml", "streaming_rollup.yaml")
)


@pytest.mark.parametrize("name", STANDARD)
def test_standard_example_runs(spark, tmp_path, name):
    log = lift(
        spark,
        os.path.join(EXAMPLES, name),
        {"source_dir": SF, "out_dir": str(tmp_path / "out")},
    )
    # every block produced a materializable DataFrame
    for block, df in log.items():
        assert df.count() >= 0, block


def test_incremental_ingest_example_two_runs(spark, tmp_path):
    """The registry example's second run with no new files must
    short-circuit via NoDataToProcess instead of re-lifting."""
    landing = tmp_path / "landing"
    landing.mkdir()
    spark.range(10).selectExpr("id AS v").coalesce(1).write.parquet(
        str(landing / "batch1")
    )
    params = {"landing": str(landing), "work": str(tmp_path / "work")}
    path = os.path.join(EXAMPLES, "incremental_ingest.yaml")
    log = lift(spark, path, params)
    assert log.get("WriteFacts").count() == 10
    # run 2: nothing new — the lift completes without rewriting
    log2 = lift(spark, path, params)
    assert log2 is not None


def test_streaming_rollup_example_drains(spark, tmp_path):
    events_dir = tmp_path / "in"
    events_dir.mkdir()
    (events_dir / "w1.json").write_text(
        "\n".join(
            json.dumps({"ts": f"2024-01-01T0{h}:15:00.000Z", "value": float(h)})
            for h in range(3)
        )
    )
    log = lift(
        spark,
        os.path.join(EXAMPLES, "streaming_rollup.yaml"),
        {"events_dir": str(events_dir), "out_dir": str(tmp_path / "out")},
    )
    assert log is not None
    rollup = spark.read.parquet(str(tmp_path / "out" / "hourly"))
    assert rollup.count() == 3


def test_index_maintenance_gate_decision(spark, tmp_path):
    """The gated-consolidation step must actually TRIP on the degraded
    period and fall back to a rebuild — the executable form of the
    ivf_health retrain trigger."""
    log = lift(
        spark,
        os.path.join(EXAMPLES, "index_maintenance.yaml"),
        {"source_dir": SF, "out_dir": str(tmp_path / "out")},
    )
    row = log.get("GatedConsolidation").collect()[0]
    assert row.decision == "rebuild"
    assert row.imbalance > 3.0  # the degraded period's readout
    # the recovery rebuild landed a fresh healthy index
    rebuilt = f"{tmp_path}/out/indexes/rebuilt"
    from getl_spark.functions import similarity

    assert similarity.assert_ivf_healthy(spark, rebuilt)["retrain"] is False


def test_contamination_audit_propagates_hops(spark, tmp_path):
    """bfs_distances as executable curation documentation: seeds flag
    at hop 0, their near-duplicate partners at hop 1, and the hop
    distance lands on the documents table as a quality feature."""
    log = lift(
        spark,
        os.path.join(EXAMPLES, "contamination_audit.yaml"),
        {"source_dir": SF, "out_dir": str(tmp_path / "out")},
    )
    flagged = {
        r.doc_id: r.contamination_hops
        for r in log.get("Flagged").where("contaminated").collect()
    }
    # the seeds themselves report hop 0
    assert flagged[5] == 0 and flagged[328] == 0
    # their direct near-duplicates (jaccard >= 0.5 partners in the
    # sf0.001 corpus) report hop 1
    pair_partners = {
        (a, b)
        for a, b in (
            (r.id_a, r.id_b) for r in log.get("NearDupPairs").collect()
        )
    }
    for a, b in pair_partners:
        if a in (5, 328) and b not in (5, 328):
            assert flagged[b] == 1
        if b in (5, 328) and a not in (5, 328):
            assert flagged[a] == 1
    # at least one hop-1 doc exists (the corpus has near-dups of both
    # seeds) and every unreached doc is NULL, not fabricated
    assert any(v == 1 for v in flagged.values())
    total = log.get("Flagged").count()
    assert total == 500 and len(flagged) < total


def test_causal_kit_att_recovers_known_effect(spark, tmp_path):
    """The causal kit's matched ATT must recover the constructed
    effect (2.0) that the naive confounded mean gap (~4.6 on this
    panel) wildly overstates — the whole point of the workflow."""
    from pyspark.sql import functions as F

    log = lift(
        spark,
        os.path.join(EXAMPLES, "causal_kit.yaml"),
        {"source_dir": SF, "out_dir": str(tmp_path / "out")},
    )
    att = log.get("Att").collect()[0]
    assert abs(att.att - 2.0) < 0.3
    assert att.max_reuse > 1  # controls reused: the SE must know
    assert att.se > 0 and att.p_value < 0.05
    naive = {
        r.treated: r.m
        for r in log.get("Panel")
        .groupBy("treated")
        .agg(F.avg("y").alias("m"))
        .collect()
    }
    assert naive[1] - naive[0] > 3.0  # the confounded gap ATT corrects
