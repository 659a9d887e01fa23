"""Per-round benchmark — prints ONE JSON line.

Runs the headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the full KG
pipeline (extract -> link -> canonicalize -> triples) on the seeded
synthetic transcript corpus scaled to match, reporting per-query seconds
and KG triples/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kartograph_spark.session import get_spark  # noqa: E402


def _ensure_corpus(sf: float) -> str:
    """Deterministic synthetic transcripts sized to the scale factor
    (FIXTURES F5: sf0.1 -> 5000 conversations ~150k turns)."""
    from kartograph_spark import synth

    n_conv = max(200, int(50000 * sf))
    d = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "data",
        f"bench_corpus_{synth.CORPUS_TAG}_{n_conv}",
    )
    if not os.path.exists(os.path.join(d, "transcripts.parquet")):
        synth.write_corpus(d, n_conv=n_conv, mean_turns=30)
    return d


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    spark = get_spark(
        "kartograph-bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    # Warm-up (untimed): first-job costs — codegen compiler init, shuffle
    # infra, Python-worker fork + pandas import — are per-JVM one-offs that
    # a long-lived cluster never pays per query; excluding them measures
    # the engine, not JVM startup.
    warm = spark.range(0, 100_000, 1, 8).selectExpr(
        "id % 97 AS k", "md5(cast(id AS string)) AS h"
    )
    warm.groupBy("k").count().count()
    warm.join(warm.limit(100).hint("broadcast"), "k").count()
    warm.limit(1000).mapInPandas(
        lambda it: it, schema="k long, h string"
    ).count()

    headline = [
        "kg_doc_mentions",
        "kg_doc_triples",
        "dedup_minhash_signatures",
        "dedup_neardup_lsh",
        "dedup_exact",
        "dedup_cluster_keep",
        "sim_knn_topk",
        "sim_ann_lsh",
        "text_lang_quality",
        "qual_repetition",
        "qual_decontaminate",
        "pipe_seq_packing",
        "mm_media_features",
        "rel_pricing_summary",
        "rel_top_customers",
        "rel_user_sessions",
        "rel_asof_join",
    ]
    qs = entry_mod.queries()
    per_q: dict[str, float] = {}
    first_run: dict[str, float] = {}
    # Protocol (r04): two timed executions per query, plus a THIRD when
    # the best so far is under 5s — on this VM run-to-run variance is
    # ±40% and min-of-2 still carries warm-up on fast queries (r03
    # recorded kg_doc_mentions at 2.36s where the steady state is ~1.25s;
    # reproduced: [4.7, 1.6, 1.4, 1.2, ...]).  Best reported; first-run
    # numbers kept alongside so the de-noising is transparent.
    for name in headline:
        times = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        if min(times) < 5.0:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        first_run[name] = times[0]
        per_q[name] = min(times)

    # KG pipeline throughput on the synthetic transcript corpus
    from kartograph_spark.pipeline import build_triples

    corpus = _ensure_corpus(sf)
    transcripts = spark.read.parquet(f"{corpus}/transcripts.parquet")
    alias = spark.read.parquet(f"{corpus}/alias_dictionary.parquet")
    n_turns = transcripts.count()
    # COLD pass: first execution of the full pipeline in this JVM —
    # includes codegen compilation + pandas-worker fork.  Reported
    # alongside the steady-state number so round-over-round comparisons
    # can't be gamed by moving cost into warm-up.
    t0 = time.time()
    warm_kept, _ = build_triples(spark, transcripts, alias)
    warm_kept.count()
    cold_secs = round(time.time() - t0, 3)
    # steady state: what a long-lived cluster job sees per run — two
    # passes, best reported (same de-noising protocol as the headline
    # queries; the cold number above keeps the comparison honest)
    kg_times = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        kept, _ = build_triples(spark, transcripts, alias)
        n_triples = kept.count()
        kg_times.append(round(time.time() - t0, 3))
    kg_secs = min(kg_times)
    per_q["kg_pipeline"] = kg_secs

    # 10x pipeline row (r05): ~1.5M turns at sf0.1 — large enough that
    # the under-split guard actually fires (30-file scan -> 128-part
    # salted repartition) and the corpus-sized dedup shuffle runs at
    # AQE-relevant volume.  One cold pass + best-of-2 warm (measured
    # warm draws spread 21.5-31.8 s on this VM — a single draw is too
    # noisy for round-over-round comparison).
    large_corpus = _ensure_corpus(sf * 10)
    ltr = spark.read.parquet(f"{large_corpus}/transcripts.parquet")
    lal = spark.read.parquet(f"{large_corpus}/alias_dictionary.parquet")
    l_turns = ltr.count()
    spark.catalog.clearCache()
    t0 = time.time()
    lk, _ = build_triples(spark, ltr, lal)
    l_triples = lk.count()
    large_cold = round(time.time() - t0, 3)
    large_times = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        lk, _ = build_triples(spark, ltr, lal)
        l_triples = lk.count()
        large_times.append(round(time.time() - t0, 3))
    large_secs = min(large_times)
    per_q["kg_pipeline_large"] = large_secs

    total = round(sum(per_q.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": per_q,
                "sf": sf,
                "cpus": cpus,
                "first_run": first_run,
                "kg_pipeline_cold_sec": cold_secs,
                "kg_turns": n_turns,
                "kg_triples": n_triples,
                "kg_triples_per_sec": round(n_triples / kg_secs, 1),
                "kg_turns_per_sec": round(n_turns / kg_secs, 1),
                "kg_large_turns": l_turns,
                "kg_large_triples": l_triples,
                "kg_pipeline_large_cold_sec": large_cold,
                "kg_large_triples_per_sec": round(l_triples / large_secs, 1),
                "kg_large_turns_per_sec": round(l_turns / large_secs, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
