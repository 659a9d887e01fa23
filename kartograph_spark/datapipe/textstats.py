"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline components: mention extraction (the E1 operator
shape applied to a document corpus), language-ID heuristic, quality
scoring, token counting, document fingerprinting.  Every query here has a
matching DuckDB oracle in __spark_entry__.py; all expressions are
JVM-side built-ins (whole-stage codegen), no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed extraction vocabulary (the 'tool taxonomy' analog of
#: docs/PROCESS.md:2123-2199 applied to the synthetic document corpus)
VOCAB_RE = r"\b(spark|hash|join|merge|window|stream|filter|scan|sort|vector)\b"

#: stopword set for the quality heuristic
STOPWORDS = ("the", "a", "of")

#: BPE-ish pretokenizer (GPT-2-style split simplified to constructs that
#: behave identically in Java regex and RE2 — no lookarounds): English
#: contractions, space-prefixed letter runs, digit runs, punctuation runs,
#: whitespace runs (filtered out of the counts)
BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan with an under-split guard: text operators do heavy
    per-row work (regex, shingling, hashing), so a small single-file scan
    must not serialize them onto one task.  On a real many-file corpus the
    scan already yields >= cores splits and this is a no-op."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < target:
        d = d.repartition(target)
    return d


def mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-shaped: extract vocabulary mentions per document with
    first-occurrence index and per-doc counts (dedupe-keep-first analog,
    EntityExtractor.ts:26-49)."""
    d = docs(spark, sf_dir).select(
        "doc_id",
        # F.lit pattern (not F.expr) — SQL string literals would eat the \b
        F.regexp_extract_all(F.col("text"), F.lit(VOCAB_RE), F.lit(1)).alias("ms"),
    )
    exploded = d.select("doc_id", F.posexplode("ms").alias("idx", "term"))
    return (
        exploded.groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("idx").cast("long").alias("first_idx"),
        )
        .select("doc_id", "term", "n_occurrences", "first_idx")
    )


def doc_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple emission over documents: mention edges + term node records
    (the (subj,pred,obj) output contract, load_dgraph.py:273-349)."""
    m = mentions(spark, sf_dir)
    edges = m.select(
        F.concat(F.lit("urn:Doc:"), F.col("doc_id").cast("string")).alias("subj"),
        F.lit("mentions").alias("pred"),
        F.concat(F.lit("urn:Term:"), F.col("term")).alias("obj"),
        F.lit("uid").alias("dtype"),
    )
    node_types = m.select(
        F.concat(F.lit("urn:Term:"), F.col("term")).alias("subj"),
        F.lit("dgraph.type").alias("pred"),
        F.lit("Term").alias("obj"),
        F.lit("string").alias("dtype"),
    )
    names = m.select(
        F.concat(F.lit("urn:Term:"), F.col("term")).alias("subj"),
        F.lit("name").alias("pred"),
        F.col("term").alias("obj"),
        F.lit("string").alias("dtype"),
    )
    return edges.unionByName(node_types).unionByName(names).distinct()


def schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 analog: per-predicate observed dtype set + uid>string resolution
    (load_dgraph.py:86-206) as a relational aggregation."""
    t = doc_triples(spark, sf_dir)
    agg = t.groupBy("pred").agg(
        F.array_join(F.sort_array(F.collect_set("dtype")), ",").alias("observed"),
        F.count(F.lit(1)).alias("n_triples"),
    )
    resolved = F.when(
        F.col("observed").contains("uid"), F.lit("uid")
    ).otherwise(
        F.when(F.col("observed").contains(","), F.lit("string")).otherwise(
            F.col("observed")
        )
    )
    return agg.select("pred", "observed", resolved.alias("resolved"), "n_triples")


def first_mention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 analog: first document (stable doc_id order) mentioning each term."""
    m = mentions(spark, sf_dir)
    return m.groupBy("term").agg(
        F.min("doc_id").alias("first_doc"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + quality scoring + token counting.

    token_count      whitespace tokens
    est_tokens       chars/4 heuristic (cost_estimator.py:61 analog)
    stop_ratio       stopword tokens / tokens (round 4)
    quality_score    0.5*min(1, tokens/60) + 0.5*(1 - stop_ratio), round 4
    pred_lang        'en' when stop_ratio high enough else declared lang
    """
    d = docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    stop_cond = " OR ".join([f"t = '{s}'" for s in STOPWORDS])
    n_stop = F.expr(f"size(filter(split(text, ' '), t -> {stop_cond}))")
    token_count = F.size(toks)
    stop_ratio = F.round(n_stop / token_count, 4)
    quality = F.round(
        0.5 * F.least(F.lit(1.0), token_count / F.lit(60.0))
        + 0.5 * (1.0 - n_stop / token_count),
        4,
    )
    return d.select(
        "doc_id",
        token_count.cast("long").alias("token_count"),
        F.floor(F.col("n_chars") / 4).cast("long").alias("est_tokens"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality_score"),
        F.when(n_stop / token_count >= 0.05, F.lit("en"))
        .otherwise(F.col("lang"))
        .alias("pred_lang"),
    )


def bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pretokenizer regex (the
    tokenizer-aware sizing pass of a training-data pipeline): per-doc
    total and distinct token counts, whitespace runs excluded.  Pure JVM
    (regexp_extract_all + array HOFs), one map stage."""
    d = docs(spark, sf_dir)
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), F.lit(0))
    nonws = F.filter(toks, lambda t: ~t.rlike(r"^\s+$"))
    return d.select(
        "doc_id",
        F.size(nonws).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(nonws)).cast("long").alias("n_distinct_bpe"),
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set (the
    deterministic content signature used for exact dedup)."""
    d = docs(spark, sf_dir)
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " ")
    )
    return d.select("doc_id", fp.alias("fp"), F.col("n_chars"))
