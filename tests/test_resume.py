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
