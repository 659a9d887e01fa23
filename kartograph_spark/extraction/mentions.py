"""Spark-side mention detection (operator E1/E4 + verb patterns).

Design (Spark-first):
- ``mapInPandas`` — UDTF-shaped map: each Arrow batch of turns yields many
  mention rows, all regex work is vectorized pandas inside the batch
  (SURVEY.md §2.13).  No shuffle is introduced here; the stage is a pure
  map and scales linearly with input partitions.
- Stable ordering: downstream first-occurrence semantics never depend on
  partition iteration order — every consumer orders by
  ``(conv_id, turn_idx, kind_rank, match_idx)`` explicitly
  (reference invariant W1/W5, SURVEY.md §2.7).
- Column pruning: we select only (conv_id, turn_idx, text) before the UDF
  so the parquet/Iceberg scan reads 3 columns (check with
  ``.explain`` -> ReadSchema).

Reference parity: EntityExtractor.ts:18-49 (regex + dedupe-keep-first),
entity_extraction.yaml:77-81, docs/PROCESS.md:2123-2199.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kartograph_spark.extraction.core import MENTION_COLUMNS, extract_mentions_block

MENTION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("kind_rank", T.LongType()),
        T.StructField("match_idx", T.LongType()),
        T.StructField("urn", T.StringType()),
        T.StructField("entity_type", T.StringType()),
        T.StructField("ident", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("surface", T.StringType()),
        T.StructField("subj_urn", T.StringType()),
        T.StructField("confidence", T.StringType()),
    ]
)


def _extract_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = extract_mentions_block(pdf)
        if len(out):
            yield out[MENTION_COLUMNS]


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> mentions.

    Pure map stage: project the 4 needed columns (column pruning reaches
    the scan) and run the vectorized extractor per Arrow batch.  The
    ``tool`` column feeds the usedTool emission (ThinkingStep toolName
    analog); inputs without it still work (text-only extraction).
    """
    cols = [
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("long"),
        F.col("text"),
    ]
    if "tool" in transcripts.columns:
        cols.append(F.col("tool").cast("string"))
    turns = transcripts.select(*cols)
    return turns.mapInPandas(_extract_iter, schema=MENTION_SCHEMA)


def extract_mentions_grouped(
    transcripts: DataFrame, cross_turn_anchors: bool = True
) -> DataFrame:
    """Grouped-map variant (SURVEY §2.13 applyInPandas surface): whole
    conversations per group, turns sorted inside the group, so verb
    subject attribution can carry the last E1 anchor FORWARD ACROSS TURNS
    (the cross-turn coref the reference's per-chunk agent context gave it,
    orchestrator.py:294-325).  Costs one shuffle on conv_id — use the
    map-only ``extract_mentions`` when within-turn attribution suffices.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        out = extract_mentions_block(
            pdf.reset_index(drop=True), cross_turn_anchors=cross_turn_anchors
        )
        return out[MENTION_COLUMNS]

    cols = [
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("long"),
        F.col("text"),
    ]
    if "tool" in transcripts.columns:
        cols.append(F.col("tool").cast("string"))
    turns = transcripts.select(*cols)
    return turns.groupBy("conv_id").applyInPandas(fn, schema=MENTION_SCHEMA)


LOW_LOG_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("match_idx", T.LongType()),
        T.StructField("surface", T.StringType()),
        T.StructField("reason", T.StringType()),
    ]
)


def low_confidence_log(transcripts: DataFrame) -> DataFrame:
    """LOW-tier manual-review log (PROCESS.md:2158-2163): vague /
    ambiguous / conditional mentions, logged and NOT extracted.  Pure
    map stage over (conv_id, turn_idx, text), like extract_mentions."""
    from kartograph_spark.extraction.core import (
        LOW_COLUMNS,
        extract_low_confidence,
    )

    def it(batches):
        for pdf in batches:
            out = extract_low_confidence(pdf)
            if len(out):
                yield out[LOW_COLUMNS]

    turns = transcripts.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("long"),
        F.col("text"),
    )
    return turns.mapInPandas(it, schema=LOW_LOG_SCHEMA)
