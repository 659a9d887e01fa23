"""Structured Streaming: incremental extraction parity + resume, windowed
counts vs the batch plan (same-plan property of windowed_mention_counts)."""

from __future__ import annotations

import os

import pandas as pd

from kartograph_spark import synth
from kartograph_spark.extraction.mentions import extract_mentions
from kartograph_spark.streaming import (
    stream_mention_counts,
    stream_mentions,
    windowed_mention_counts,
)

_MKEY = ["conv_id", "turn_idx", "urn"]


def _write_slice(df: pd.DataFrame, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df.to_parquet(path, index=False)


def test_stream_mentions_matches_batch_and_resumes(spark, tmp_path):
    tr = synth.gen_transcripts(n_conv=30, mean_turns=6)
    half = tr[tr.conv_id < "conv-000015"].reset_index(drop=True)
    rest = tr[tr.conv_id >= "conv-000015"].reset_index(drop=True)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_slice(half, f"{in_dir}/part-0.parquet")

    q = stream_mentions(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir).toPandas()
    exp1 = extract_mentions(
        spark.createDataFrame(half)
    ).toPandas()
    assert (
        got1.sort_values(_MKEY).reset_index(drop=True)[_MKEY].equals(
            exp1.sort_values(_MKEY).reset_index(drop=True)[_MKEY]
        )
    )

    # append new files; re-run drains ONLY the new ones (checkpoint resume)
    _write_slice(rest, f"{in_dir}/part-1.parquet")
    q2 = stream_mentions(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir).toPandas()
    exp_all = extract_mentions(spark.createDataFrame(tr)).toPandas()
    assert len(got2) == len(exp_all)
    assert (
        got2.sort_values(_MKEY).reset_index(drop=True)[_MKEY].equals(
            exp_all.sort_values(_MKEY).reset_index(drop=True)[_MKEY]
        )
    )


def test_windowed_counts_stream_subset_of_batch(spark, tmp_path):
    tr = synth.gen_transcripts(n_conv=40, mean_turns=8)
    in_dir = str(tmp_path / "in")
    _write_slice(tr, f"{in_dir}/part-0.parquet")

    batch = windowed_mention_counts(spark.createDataFrame(tr)).toPandas()
    assert len(batch) > 0

    out_dir = str(tmp_path / "out")
    q = stream_mention_counts(spark, in_dir, out_dir, str(tmp_path / "ck"))
    q.awaitTermination(120)
    streamed = spark.read.parquet(out_dir).toPandas()
    # append mode withholds windows newer than the final watermark, so the
    # streamed result is a prefix subset of the batch aggregation — and
    # every emitted row must match the batch plan exactly
    key = ["window_start", "urn"]
    merged = streamed.merge(batch, on=key, suffixes=("_s", "_b"), how="left")
    assert len(merged) == len(streamed)
    assert (merged["n_mentions_s"] == merged["n_mentions_b"]).all()
    assert len(streamed) > 0
    assert len(streamed) <= len(batch)


def test_stateful_first_mentions(spark, tmp_path):
    """applyInPandasWithState: each urn emitted exactly ONCE across
    micro-batches (streaming W1 first-occurrence), state survives between
    batches within a query run."""
    from kartograph_spark.streaming import stream_first_mentions

    tr = synth.gen_transcripts(n_conv=30, mean_turns=6)
    in_dir = str(tmp_path / "in")
    # two files -> two micro-batches via maxFilesPerTrigger=1
    half = tr[tr.conv_id < "conv-000015"].reset_index(drop=True)
    rest = tr[tr.conv_id >= "conv-000015"].reset_index(drop=True)
    _write_slice(half, f"{in_dir}/part-0.parquet")
    _write_slice(rest, f"{in_dir}/part-1.parquet")

    q = stream_first_mentions(
        spark, in_dir, str(tmp_path / "ck"), query_name="fm_test",
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM fm_test").toPandas()

    exp = extract_mentions(spark.createDataFrame(tr)).toPandas()
    # exactly one row per distinct urn, never re-emitted in batch 2
    assert len(got) == exp["urn"].nunique()
    assert got["urn"].is_unique
    # urns first seen in batch 1 must carry a batch-1 (conv_id, turn_idx)
    b1_urns = set(extract_mentions(spark.createDataFrame(half)).toPandas()["urn"])
    from_b1 = got[got["urn"].isin(b1_urns)]
    assert (from_b1["conv_id"] < "conv-000015").all()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: cross-micro-batch duplicate
    fingerprints are dropped while inside the watermark horizon; distinct
    contents all survive; batch and streaming agree on the fingerprint."""
    import datetime as dt

    from kartograph_spark.streaming import stream_dedup_documents

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda rows: pd.DataFrame(
        rows, columns=["doc_id", "text", "ts"]
    ).astype({"doc_id": "int64", "ts": "datetime64[us]"})
    # batch 1: two distinct docs (b == a token-set after reorder -> dup!)
    b1 = mk([
        (1, "alpha beta gamma", t0),
        (2, "gamma beta alpha", t0),          # same token set as doc 1
        (3, "delta epsilon", t0),
    ])
    # batch 2 (minutes later, inside the 1h watermark): dup of doc 1 and
    # one genuinely new doc
    b2 = mk([
        (4, "alpha beta gamma", t0 + dt.timedelta(minutes=5)),
        (5, "zeta eta theta", t0 + dt.timedelta(minutes=5)),
    ])
    in_dir = str(tmp_path / "docs")
    _write_slice(b1, f"{in_dir}/part-0.parquet")
    _write_slice(b2, f"{in_dir}/part-1.parquet")

    q = stream_dedup_documents(
        spark, in_dir, str(tmp_path / "ck_dd"), query_name="dd_test",
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM dd_test").toPandas()

    # three distinct token-set fingerprints -> exactly three survivors
    assert len(got) == 3
    assert got["fp"].is_unique
    # the duplicate arrivals (2: same-batch reorder, 4: next batch) lost
    assert set(got["doc_id"]) & {2, 4} == set()
    assert {1, 3, 5} == set(got["doc_id"])


def test_session_window_agrees_with_lag_formulation(spark):
    """session_window (native) and the lag-gap window (user_sessions) are
    independent plans for the same session semantics — per-user session
    counts and total event counts must agree on the shared testdata."""
    from pyspark.sql import functions as F

    from kartograph_spark.datapipe.relational import user_sessions
    from kartograph_spark.streaming import session_window_counts

    sf = "/root/testdata/sf0.01"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    sw = (
        session_window_counts(ev, gap="30 minutes")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    got = {r["user_id"]: r["n_sessions"] for r in sw.collect()}
    exp = {
        r["user_id"]: r["n_sessions"]
        for r in user_sessions(spark, sf).collect()
    }
    assert got == exp


def test_stream_review_flags_matches_batch(spark, tmp_path):
    """The streaming review queue carries exactly the batch extraction's
    MEDIUM rows (pre-canonicalization), and the checkpoint makes re-runs
    incremental."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kartograph_spark.extraction.mentions import extract_mentions
    from kartograph_spark.streaming import stream_review_flags

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pd.array([0, 1, 0], dtype="int32"),
            "role": ["user", "assistant", "user"],
            "text": [
                "Service <urn:Application:pay> is running on AWS today.",
                "It uses Prometheus and depends on Kafka.",
                "Deployed by hand in the production environment.",
            ],
            "tool": [None, "query_dgraph", None],
            "ts": pd.to_datetime(["2026-01-01"] * 3).astype("datetime64[us]"),
        }
    ).to_parquet(f"{in_dir}/part-0.parquet", index=False)

    q = stream_review_flags(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).toPandas()
    batch = (
        extract_mentions(spark.read.parquet(in_dir))
        .filter(F.col("confidence") == "MEDIUM")
        .toPandas()
    )
    key = ["conv_id", "turn_idx", "kind"]
    assert set(map(tuple, got[key].itertuples(index=False))) == set(
        map(tuple, batch[key].itertuples(index=False))
    )
    assert set(got["pred"]) == {"runsOn", "dependsOn", "environment"}
    # the anchored flag carries its subject; anchorless fall back to conv
    by_kind = got.set_index("kind")
    assert by_kind.loc["running_on", "subj"] == "urn:Application:pay"
    assert by_kind.loc["env_context", "subj"] == "urn:Conversation:c2"
    # re-run: checkpoint skips processed files, no duplicate rows
    q2 = stream_review_flags(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(got)
