"""Per-phase wall-clock profile of build_triples at one parallelism level.

Replicates build_triples stage-by-stage with timestamps so the 2-core vs
8-core comparison shows WHERE the non-scaling time lives (Amdahl terms:
driver collects, job scheduling, broadcast builds).

Usage: python tools/profile_pipeline.py <cores> <corpus_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1])
    corpus = sys.argv[2]

    from pyspark.sql import functions as F

    from kartograph_spark import triples as tr
    from kartograph_spark import validation as val
    from kartograph_spark.canonical import (
        build_type_normalization,
        apply_type_normalization,
        coreference_pairs,
    )
    from kartograph_spark.components import canonical_map
    from kartograph_spark.config import PipelineConfig
    from kartograph_spark.extraction.mentions import extract_mentions
    from kartograph_spark.pipeline import ensure_parallelism
    from kartograph_spark.session import get_spark

    spark = get_spark(
        f"kg-profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cores}"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(f"{corpus}/transcripts.parquet")
    alias = spark.read.parquet(f"{corpus}/alias_dictionary.parquet")
    transcripts.count()

    # warm-up full run (untimed)
    from kartograph_spark.pipeline import build_triples

    warm, _ = build_triples(spark, transcripts, alias)
    warm.count()
    spark.catalog.clearCache()

    cfg = PipelineConfig()
    phases: dict[str, float] = {}
    t00 = time.time()

    def mark(name, t0):
        phases[name] = round(time.time() - t0, 2)
        return time.time()

    t0 = time.time()
    salted = ensure_parallelism(spark, transcripts, cfg.salt_turns)
    mentions = extract_mentions(salted).drop("surface").persist()
    norm = build_type_normalization(mentions)  # first action: extract+cache
    t0 = mark("extract_and_typecounts", t0)

    typed = apply_type_normalization(mentions, norm)
    alias_pdf = alias.toPandas()
    alias_local = spark.createDataFrame(alias_pdf)
    pairs = coreference_pairs(typed, alias_local, cfg.confidence_threshold)
    cmap = canonical_map(pairs, preferred=set(alias_pdf["canonical_urn"]))
    t0 = mark("pairs_and_cc", t0)

    scmap = cmap.select(
        F.col("member_urn").alias("subj_urn"),
        F.col("canonical_urn").alias("_subj_canon"),
    )
    rewritten = (
        typed.withColumnRenamed("urn", "member_urn")
        .join(F.broadcast(cmap), "member_urn", "left")
        .withColumn("urn", F.coalesce(F.col("canonical_urn"), F.col("member_urn")))
        .drop("member_urn", "canonical_urn")
        .join(F.broadcast(scmap), "subj_urn", "left")
        .withColumn("subj_urn", F.coalesce(F.col("_subj_canon"), F.col("subj_urn")))
        .drop("_subj_canon")
    )
    meta_pdf = (
        alias_pdf.groupby("canonical_urn")
        .agg(_dict_type=("entity_type", "min"), _dict_name=("canonical_name", "min"))
        .reset_index()
        .rename(columns={"canonical_urn": "urn"})
    )
    dict_meta = spark.createDataFrame(meta_pdf[["urn", "_dict_type", "_dict_name"]])
    canonical = (
        rewritten.join(F.broadcast(dict_meta), "urn", "left")
        .withColumn("entity_type", F.coalesce(F.col("_dict_type"), F.col("entity_type")))
        .withColumn("name", F.coalesce(F.col("_dict_name"), F.col("name")))
        .drop("_dict_type", "_dict_name")
    )
    raw = tr.mention_triples(canonical).unionByName(
        tr.conversation_triples(transcripts)
    )
    deduped = tr.dedup_first_occurrence(raw).persist()
    uid_preds = tr.collect_uid_predicates(deduped)
    t0 = mark("dedup_agg", t0)

    resolved = tr.apply_uid_resolution(deduped, uid_preds)
    t0 = mark("resolve_collect", t0)

    encoded = tr.encode_final(resolved)
    kept, _broken = val.split_broken_refs(encoded)
    n = kept.count()
    t0 = mark("validate_and_count", t0)

    total = round(time.time() - t00, 2)
    print("RESULT " + json.dumps({"cores": cores, "total": total, "phases": phases, "triples": n}))


if __name__ == "__main__":
    main()
