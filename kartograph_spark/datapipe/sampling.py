"""Dataset assembly operators: deterministic sampling + sequence packing.

Training-data pipelines end with corpus assembly: down-sample strata to a
target mix (e.g. re-weight languages) and pack documents into fixed token
budgets for efficient sequence batching.  Both operators here are
deterministic functions of the data — no RNG — so the DuckDB oracles
reproduce them bit-for-bit and re-runs are idempotent (a resumed 100 TB
assembly job picks the same rows).

Scale posture:
- Sampling is a pure map-side filter on an md5-derived hash bucket —
  no shuffle, fully pushdown-friendly, and stable under repartitioning
  (the keep decision depends only on doc_id, never on partition layout).
- Packing windows are partitioned by (stratum, shard): the shard count
  bounds every window partition to ~|stratum|/shards rows, so no single
  task ever sorts a whole stratum.  At 100 TB raise ``shards`` (the knob
  is corpus-size / target-partition-size, same reasoning as
  similarity.lsh_n_planes) — the pack ids stay deterministic per shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kartograph_spark.datapipe.textstats import docs

#: hash denominator: first 4 md5 nibbles of the doc id -> [0, 65536)
HASH_MOD = 1 << 16

#: driver-contract stratum rates (lang -> keep fraction); strata absent
#: from the map fall back to DEFAULT_RATE
SAMPLE_RATES = {"en": 0.5}
DEFAULT_RATE = 0.2

#: packing defaults: whitespace-token budget per packed sequence, shard
#: count bounding the per-window partition size
PACK_BUDGET = 512
PACK_SHARDS = 32


def _hash_bucket(c) -> Column:
    """Deterministic [0, 65536) bucket from the md5 of the id — the same
    4-hex-nibble extraction the oracle replays (engine-portable, unlike
    xxhash64/DuckDB hash which differ across engines)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("long")


def stratified_sample(
    spark: SparkSession,
    sf_dir: str,
    rates: dict[str, float] | None = None,
    default_rate: float = DEFAULT_RATE,
) -> DataFrame:
    """Deterministic per-stratum down-sampling of the documents table.

    keep(doc) <=> md5_bucket(doc_id) < rate(lang) * 65536 — a pure
    column predicate (no RNG, no shuffle, survives repartitioning), the
    hash-mod idiom production dedup/sampling pipelines use so that
    re-runs and incremental appends sample consistently.
    """
    rates = SAMPLE_RATES if rates is None else rates
    d = docs(spark, sf_dir)
    thresh = F.lit(int(default_rate * HASH_MOD))
    for lang, r in sorted(rates.items()):
        thresh = F.when(F.col("lang") == lang, int(r * HASH_MOD)).otherwise(thresh)
    bucket = _hash_bucket(F.col("doc_id"))
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < thresh)
        .select("doc_id", "lang", "bucket")
    )


#: train/val/test split boundaries as fractions of the hash space
SPLIT_BOUNDS = (("train", 0.90), ("val", 0.95), ("test", 1.0))


def train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: the doc's md5 bucket
    against fixed hash-space boundaries (90/5/5).  Pure column predicate —
    no RNG, no shuffle, stable under repartitioning and incremental
    appends (a doc's split never changes as the corpus grows — the
    property random splits lose and hash splits are used for in
    production).  Output one row per doc with its split label.
    """
    bucket = _hash_bucket(F.col("doc_id"))
    label = F.lit(SPLIT_BOUNDS[-1][0])
    for name, hi in reversed(SPLIT_BOUNDS):
        label = F.when(bucket < int(hi * HASH_MOD), F.lit(name)).otherwise(label)
    return docs(spark, sf_dir).select(
        "doc_id", label.alias("split"), bucket.alias("bucket")
    )


#: domain-mix defaults: overall token budget as a fraction of the corpus,
#: re-balanced across sources by sqrt-temperature smoothing
MIX_FRACTION = 0.25


def domain_mix(
    spark: SparkSession, sf_dir: str, fraction: float = MIX_FRACTION
) -> DataFrame:
    """Temperature-weighted source mixing — the corpus-assembly step that
    re-balances domain shares before pretraining (multinomial smoothing:
    target share of source s ∝ n_s^alpha, here alpha = 1/2 so small
    sources are up-weighted relative to their raw share).

    keep-rate(s) = min(1, fraction * T * w_s / n_s) with n_s = source
    token count, T = total tokens, w_s = sqrt(n_s) / Σ sqrt(n_t); a doc
    is kept iff its md5 bucket < rate * 65536 — the same deterministic
    hash-keep as stratified_sample (idempotent re-runs, no RNG).

    alpha = 1/2 is implemented as sqrt() because IEEE-754 requires sqrt
    to be correctly rounded — pow(x, 0.7) may differ in the last ulp
    across engines and flip a keep threshold; rates are additionally
    rounded to 6 places in BOTH engines before the bucket comparison.

    Scale: the per-source stats are a tiny map-side-combinable agg
    (|sources| rows) broadcast back onto the corpus — the corpus itself
    is scanned once and never shuffled.
    """
    d = docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
    )
    per = d.groupBy("source").agg(F.sum("toks").alias("n_s"))
    tot = per.agg(
        F.sum(F.sqrt(F.col("n_s").cast("double"))).alias("s_sum"),
        F.sum("n_s").alias("t_tot"),
    )
    rates = per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(fraction)
                * F.col("t_tot")
                * (F.sqrt(F.col("n_s").cast("double")) / F.col("s_sum"))
                / F.col("n_s"),
            ),
            6,
        ).alias("rate"),
    )
    bucket = _hash_bucket(F.col("doc_id"))
    return (
        d.join(F.broadcast(rates), "source")
        .filter(bucket.cast("double") < F.col("rate") * F.lit(float(HASH_MOD)))
        .select("doc_id", "source")
    )


def seq_packing(
    spark: SparkSession,
    sf_dir: str,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Offset-based sequence packing: documents fill fixed token budgets
    in stable doc_id order within (lang, shard) partitions.

    pack_id = floor(start_offset / budget) where start_offset is the
    running token count before the document — the deterministic
    "concatenate then cut every ``budget`` tokens" rule (documents may
    straddle a boundary; each pack holds the docs whose first token lands
    in its window).  Output: one row per (lang, shard, pack_id) with doc
    and token counts — the shape a batch loader consumes.

    The window partition is (lang, shard) so the sort is bounded by
    |stratum| / shards rows per task; ``shards`` scales with the corpus.
    """
    d = docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
    )
    shard = (_hash_bucket(F.col("doc_id")) % shards).alias("shard")
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = d.select("doc_id", "lang", "toks", shard).withColumn(
        "pack_id",
        F.floor((F.sum("toks").over(w) - F.col("toks")) / F.lit(budget)),
    )
    return (
        staged.groupBy("lang", "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .select("lang", "shard", "pack_id", "n_docs", "sum_tokens", "first_doc")
    )
