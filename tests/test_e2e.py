"""End-to-end: Spark pipeline vs pure-pandas oracle on the deterministic
synthetic corpus (FIXTURES F3; BASELINE.json: triple P/R >= 0.95 required,
exact equality targeted)."""

import tempfile

import pytest

from kartograph_spark.config import PipelineConfig
from kartograph_spark.oracle.oracle import oracle_triples, triple_prf
from kartograph_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def pipeline_out(spark, transcripts_df, alias_df):
    out = tempfile.mkdtemp(prefix="kg-out-")
    cfg = PipelineConfig(n_buckets=8)
    metrics = run_pipeline(spark, transcripts_df, alias_df, out, cfg)
    return out, metrics


def test_triples_match_oracle(spark, pipeline_out, transcripts_pdf, alias_pdf):
    out, metrics = pipeline_out
    actual = spark.read.parquet(f"{out}/triples").toPandas()
    expected = oracle_triples(transcripts_pdf, alias_pdf)
    prf = triple_prf(actual, expected)
    assert prf["precision"] >= 0.95, prf
    assert prf["recall"] >= 0.95, prf
    # target: exact set equality
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0, prf


def test_first_occurrence_provenance_matches_oracle(
    spark, pipeline_out, transcripts_pdf, alias_pdf
):
    out, _ = pipeline_out
    actual = (
        spark.read.parquet(f"{out}/triples")
        .toPandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    expected = (
        oracle_triples(transcripts_pdf, alias_pdf)
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    merged = actual.merge(
        expected, on=["subj", "pred", "obj"], suffixes=("_a", "_e")
    )
    assert (merged["conv_id_a"] == merged["conv_id_e"]).all()
    assert (
        merged["turn_idx_a"].astype("int64") == merged["turn_idx_e"].astype("int64")
    ).all()


def test_metrics_rollup(pipeline_out):
    _, metrics = pipeline_out
    assert metrics["triples"] > 0
    assert metrics["entities"] > 0
    assert metrics["edges"] > 0
    assert metrics["broken_refs"] == 0
    assert metrics["triples_per_sec"] is not None


def test_graph_tables_consistent(spark, pipeline_out):
    out, metrics = pipeline_out
    nodes = spark.read.parquet(f"{out}/graph_nodes")
    edges = spark.read.parquet(f"{out}/graph_edges")
    assert nodes.count() == metrics["entities"]
    # every edge endpoint is a node (two-pass rule: broken refs excluded)
    dangling = edges.join(
        nodes.selectExpr("urn as obj"), "obj", "left_anti"
    ).count()
    assert dangling == 0


def test_schema_manifest(pipeline_out):
    import json

    out, _ = pipeline_out
    manifest = json.load(open(f"{out}/schema_manifest.json"))
    by_pred = {m["predicate"]: m for m in manifest}
    assert by_pred["mentions"]["resolved_type"] == "uid"
    assert by_pred["mentions"]["reverse"] is True
    assert by_pred["turn_count"]["resolved_type"] == "int"
    assert by_pred["has_tool_calls"]["resolved_type"] == "bool"
    assert by_pred["avg_gap_secs"]["resolved_type"] == "float"
    assert by_pred["name"]["index"] == ["exact", "term", "fulltext", "trigram"]
    assert by_pred["mentions"]["index"] == []

    # sparse per-type predicate lists + Dgraph-style schema text
    tps = {t["type"]: t["predicates"] for t in json.load(
        open(f"{out}/type_predicates.json")
    )}
    assert "turn_count" in tps["Conversation"]
    assert all("dgraph.type" not in ps for ps in tps.values())
    schema = open(f"{out}/schema.dgraph").read()
    assert "name: string @index(exact, term, fulltext, trigram) ." in schema
    assert "mentions: [uid] @reverse ." in schema
    assert "type Conversation {" in schema


def test_long_conversation_salting(spark):
    """C2 analog: an under-split scan containing one huge conversation is
    repartitioned into (conv_id, turn-range) groups so it cannot pin a
    single task (chunk binary-split semantics, orchestrator.py:637-687)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kartograph_spark.pipeline import ensure_parallelism

    n = 5000
    pdf = pd.DataFrame(
        {
            "conv_id": ["conv-long"] * n,
            "turn_idx": list(range(n)),
            "role": ["user"] * n,
            "text": ["turn text"] * n,
            "tool": [None] * n,
            "ts": pd.to_datetime("2026-01-01"),
        }
    )
    df = spark.createDataFrame(pdf).coalesce(1)
    salted = ensure_parallelism(spark, df, salt_turns=1024)
    n_parts = (
        salted.select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    # 5000 turns / 1024-turn salt -> at least ceil(5000/1024)=5 distinct
    # task groups are POSSIBLE; require the conversation spans > 1
    assert n_parts > 1
    assert salted.count() == n


def test_report_sinks_written(pipeline_out):
    """S11/S12 integration: run_pipeline writes every report format."""
    import os

    out, metrics = pipeline_out
    for name in (
        "metrics.json", "metrics.csv", "metrics.md",
        "validation_report.md", "validation_report.txt",
        "schema_manifest.json", "type_predicates.json", "schema.dgraph",
    ):
        p = os.path.join(out, name)
        assert os.path.exists(p) and os.path.getsize(p) > 0, name
    md = open(os.path.join(out, "metrics.md")).read()
    assert f"- **Triples**: {metrics['triples']:,}" in md


def test_review_flags_match_oracle(spark, pipeline_out, transcripts_pdf, alias_pdf):
    """MEDIUM-tier relationships land in review_flags (not in the graph)
    and match the pandas oracle exactly."""
    from kartograph_spark.oracle.oracle import oracle_review_flags

    out, metrics = pipeline_out
    actual = spark.read.parquet(f"{out}/review_flags").toPandas()
    expected = oracle_review_flags(transcripts_pdf, alias_pdf)
    key = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    a = set(map(tuple, actual[key].itertuples(index=False)))
    e = set(map(tuple, expected[key].itertuples(index=False)))
    assert a == e
    assert len(actual) > 0  # the corpus plants MEDIUM phrases
    assert metrics["review_flags"] == len(actual)
    # the flagged predicates never appear as graph edges
    flagged_preds = set(actual["pred"])
    triples = spark.read.parquet(f"{out}/triples").toPandas()
    assert not (triples["pred"].isin(flagged_preds) & triples["obj_is_ref"]).any()
    # but the flagged entities DO exist as nodes (entity extracted)
    import pandas as pd

    from kartograph_spark import rules

    enc_objs = set(rules.encode_urn(actual["obj"].drop_duplicates()))
    node_set = set(
        triples.loc[triples["pred"] == "dgraph.type", "subj"]
    )
    assert enc_objs <= node_set
