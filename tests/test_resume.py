"""Checkpoint/lineage resume (FIXTURES F4 resume case): kill mid-stage,
re-run, identical output; completed partitions skipped via lineage
anti-join (orchestrator.py:484-536, 589-597 semantics)."""

import glob
import os
import tempfile

import pandas as pd

from kartograph_spark.config import PipelineConfig
from kartograph_spark.graph import TableStore
from kartograph_spark.lineage import (
    LINEAGE_DIR,
    completed_partitions,
    read_lineage,
    record_completed,
)
from kartograph_spark.pipeline import run_mentions_stage


def _mentions_pdf(spark, out):
    return (
        spark.read.parquet(f"{out}/mentions")
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "kind_rank", "match_idx"])
        .reset_index(drop=True)
        .drop(columns=["bucket"], errors="ignore")
    )


def test_resume_skips_completed_and_is_idempotent(spark, transcripts_df):
    cfg = PipelineConfig(n_buckets=8)
    out = tempfile.mkdtemp(prefix="kg-resume-")
    store = TableStore(spark, out)

    run_mentions_stage(spark, transcripts_df, store, cfg)
    baseline = _mentions_pdf(spark, out)
    lin1 = read_lineage(spark, out).toPandas()
    assert set(lin1["partition_id"]) == set(range(8))

    # simulate a mid-stage kill: forget completion of 3 buckets
    lost = {1, 4, 6}
    survivors = lin1[~lin1["partition_id"].isin(lost)]
    for f in glob.glob(os.path.join(out, LINEAGE_DIR, "*.parquet")):
        os.remove(f)
    record_completed(
        out,
        "mentions",
        cfg.config_hash,
        dict(zip(survivors["partition_id"], survivors["rows"])),
    )
    assert completed_partitions(spark, out, "mentions", cfg.config_hash) == (
        set(range(8)) - lost
    )
    lin_mid = read_lineage(spark, out).toPandas()

    # resume: only the lost buckets re-run; final output identical
    run_mentions_stage(spark, transcripts_df, store, cfg)
    resumed = _mentions_pdf(spark, out)
    pd.testing.assert_frame_equal(baseline, resumed)
    lin2 = read_lineage(spark, out).toPandas()
    redone = set(
        lin2[lin2["finished_at"] > lin_mid["finished_at"].max()]["partition_id"]
    )
    assert redone == lost


def test_config_hash_invalidation(spark, transcripts_df):
    cfg_a = PipelineConfig(n_buckets=8, rules_version="1")
    cfg_b = PipelineConfig(n_buckets=8, rules_version="2")
    assert cfg_a.config_hash != cfg_b.config_hash
    out = tempfile.mkdtemp(prefix="kg-cfg-")
    store = TableStore(spark, out)
    run_mentions_stage(spark, transcripts_df, store, cfg_a)
    # a different config hash sees zero completed partitions
    assert completed_partitions(spark, out, "mentions", cfg_b.config_hash) == set()
    assert completed_partitions(spark, out, "mentions", cfg_a.config_hash) == set(
        range(8)
    )


def test_full_pipeline_resume_mid_triples(spark, transcripts_df, alias_df):
    """Kill after the canonical stage (triples/materialize lineage rows
    lost, outputs wiped): the re-run skips mentions AND canonical — no
    new lineage rows, no extraction re-run — recomputes only the lost
    stages, and converges to the identical triple set."""
    import shutil
    import tempfile

    from kartograph_spark.pipeline import run_pipeline

    cfg = PipelineConfig(n_buckets=8)
    out = tempfile.mkdtemp(prefix="kg-full-resume-")
    m1 = run_pipeline(spark, transcripts_df, alias_df, out, cfg)
    baseline = (
        spark.read.parquet(f"{out}/triples")
        .toPandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    lin1 = read_lineage(spark, out).toPandas()
    assert {"mentions", "canonical", "triples", "materialize"} <= set(lin1["stage"])

    # simulate the kill: drop the triples+materialize lineage rows and
    # their outputs; mentions + canonical survive
    survivors = lin1[~lin1["stage"].isin(["triples", "materialize"])]
    for f in glob.glob(os.path.join(out, LINEAGE_DIR, "*.parquet")):
        os.remove(f)
    for _, r in survivors.iterrows():
        record_completed(
            out, r["stage"], r["config_hash"], {int(r["partition_id"]): int(r["rows"])}
        )
    for t in ("triples", "broken_refs", "graph_nodes", "graph_edges"):
        shutil.rmtree(os.path.join(out, t), ignore_errors=True)
    lin_mid = read_lineage(spark, out).toPandas()

    m2 = run_pipeline(spark, transcripts_df, alias_df, out, cfg)
    resumed = (
        spark.read.parquet(f"{out}/triples")
        .toPandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        baseline.astype({"turn_idx": "int64"}), resumed.astype({"turn_idx": "int64"})
    )
    # the completed stages were NOT re-run: no lineage rows newer than
    # the kill for mentions/canonical; triples/materialize re-recorded
    lin2 = read_lineage(spark, out).toPandas()
    new_rows = lin2[lin2["finished_at"] > lin_mid["finished_at"].max()]
    assert set(new_rows["stage"]) == {"triples", "materialize"}
    assert m2["triples"] == m1["triples"]
    assert m2["review_flags"] == m1["review_flags"]


def test_full_pipeline_rerun_skips_everything(spark, transcripts_df, alias_df):
    """A clean re-run against a completed out dir recomputes no stage —
    only the metrics rollup — and reports identical counts."""
    import tempfile

    from kartograph_spark.pipeline import run_pipeline

    cfg = PipelineConfig(n_buckets=8)
    out = tempfile.mkdtemp(prefix="kg-rerun-")
    m1 = run_pipeline(spark, transcripts_df, alias_df, out, cfg)
    lin1 = read_lineage(spark, out).toPandas()
    m2 = run_pipeline(spark, transcripts_df, alias_df, out, cfg)
    lin2 = read_lineage(spark, out).toPandas()
    assert len(lin1) == len(lin2)  # zero new lineage rows
    for k in ("triples", "entities", "edges", "mentions", "review_flags"):
        assert m1[k] == m2[k], k


def test_config_round_trip_recomputes(spark):
    """run A, run B, run A again against ONE out dir: B overwrites the
    stage tables, so A's surviving lineage rows must NOT serve B's data —
    the stage markers force recompute and A's second output equals A's
    first (incl. a bucket-count change, which also exercises the full-
    overwrite path that clears B's extra bucket partitions)."""
    import tempfile

    import pandas as pd

    from kartograph_spark.pipeline import run_pipeline

    tr = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": [f"c{i}" for i in range(6) for _ in (0, 1)],
                "turn_idx": pd.array([0, 1] * 6, dtype="int32"),
                "role": ["user", "assistant"] * 6,
                "text": [
                    "Service <urn:Application:pay> uses Prometheus.",
                    "It is running on AWS and calls Vault.",
                ]
                * 6,
                "tool": [None, "query_dgraph"] * 6,
                "ts": pd.to_datetime(["2026-01-01 00:00"] * 12).astype(
                    "datetime64[us]"
                ),
            }
        )
    )
    al = spark.createDataFrame(
        [],
        "alias_norm string, canonical_urn string, entity_type string,"
        " canonical_name string",
    )
    out = tempfile.mkdtemp(prefix="kg-roundtrip-")

    cfg_a = PipelineConfig(n_buckets=4, extra={"tag": "A"})
    cfg_b = PipelineConfig(n_buckets=8, extra={"tag": "B"})
    run_pipeline(spark, tr, al, out, cfg_a)
    a1 = (
        spark.read.parquet(f"{out}/triples")
        .toPandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    # B: different config writes the same tables (same corpus here — the
    # point is the gating, not the content delta)
    run_pipeline(spark, tr, al, out, cfg_b)
    # A again: lineage rows for A still exist, but the markers say the
    # tables belong to B -> every stage must recompute, not resume
    m3 = run_pipeline(spark, tr, al, out, cfg_a)
    a2 = (
        spark.read.parquet(f"{out}/triples")
        .toPandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a1.astype({"turn_idx": "int64"}), a2.astype({"turn_idx": "int64"})
    )
    assert m3["config_hash"] == cfg_a.config_hash
    # the mentions table must contain ONLY cfg_a's 4 buckets (full
    # overwrite cleared B's 8-bucket layout)
    mb = spark.read.parquet(f"{out}/mentions").select("bucket").distinct()
    assert {r["bucket"] for r in mb.collect()} <= set(range(4))
