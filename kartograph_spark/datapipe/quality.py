"""Corpus-quality operators: repetition metrics, source rollup,
benchmark decontamination.

Training-data curation beyond per-doc scoring (textstats.lang_quality):

- ``repetition_metrics`` — the published repetition heuristics (duplicate
  token / top-token / top-bigram fractions, the "Gopher rules" family)
  as shuffle-free column expressions.
- ``source_rollup`` — per-(source, lang) corpus composition, the
  map-side-combinable aggregate a curation dashboard reads.
- ``decontaminate`` — n-gram overlap between the training corpus and a
  deterministic held-out slice (the eval-benchmark stand-in): any doc
  sharing an ``NGRAM``-gram with the held-out slice is flagged, the
  standard exact-substring decontamination pass.

Scale posture:
- repetition metrics are per-row array HOFs (whole-stage codegen, zero
  shuffle).  Per-row cost is O(tokens * distinct); for book-length docs
  swap in the explode + two-level groupBy twin — same outputs, one
  shuffle — but for web-scale doc lengths (<= a few k tokens) the
  shuffle-free form wins.
- source_rollup is a single partial-aggregated shuffle on (source, lang)
  — low cardinality, no skew concern.
- decontamination broadcasts only the held-out slice's distinct n-gram
  set (eval benchmarks are tiny vs the corpus); the corpus side stays a
  map + broadcast-hash semi-join + per-doc count, never a corpus-corpus
  join.  At 100 TB the corpus side still reads each doc once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kartograph_spark.datapipe.sampling import HASH_MOD, _hash_bucket
from kartograph_spark.datapipe.textstats import docs

#: n-gram order for the decontamination pass (5-grams: long enough that
#: chance collisions are rare, short enough to catch partial copies)
NGRAM = 5

#: held-out fraction: docs whose md5 bucket falls below this fraction of
#: HASH_MOD form the deterministic "benchmark" slice
EVAL_FRACTION = 0.02

#: minimum whitespace-token count for the rollup's quality counter
QUALITY_MIN_TOKENS = 40


def _toks() -> Column:
    return F.split(F.col("text"), " ")


#: per-row HOF cost is O(tokens * distinct-tokens): fine for web-scale
#: doc lengths, quadratic on book-length docs — above this token count
#: the explode + two-level groupBy twin takes over (same outputs)
REPETITION_EXPLODE_MIN_TOKENS = 2048


def _repetition_hof(d: DataFrame) -> DataFrame:
    """d(doc_id, toks) -> repetition stats as one shuffle-free projection
    (array_distinct + nested filter/transform HOFs): a pure map that
    survives any partitioning, but per-row O(tokens * distinct)."""
    toks = F.col("toks")
    n = F.size(toks)
    top_tok = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda x: F.size(F.filter(toks, lambda t: t == x)),
        )
    )
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    top_big = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda x: F.size(F.filter(bigrams, lambda t: t == x)),
        )
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n, 4).alias("distinct_ratio"),
        F.round(top_tok / n, 4).alias("top_token_ratio"),
        F.when(n > 1, F.round(top_big / (n - 1), 4))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_ratio"),
    )


def _repetition_exploded(d: DataFrame) -> DataFrame:
    """d(doc_id, toks) -> identical stats via explode + two-level groupBy
    (linear per-row work, two map-side-combinable shuffles): the
    book-length path.  Counts are integers and the output expressions
    apply the identical op sequence, so results match the HOF twin
    bit-for-bit (pinned by tests/test_quality.py)."""
    n = F.col("n")
    base = d.select("doc_id", F.size("toks").alias("n"), "toks")
    tstats = (
        base.select("doc_id", "n", F.explode("toks").alias("g"))
        .groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n")
        .agg(F.max("c").alias("top_tok"), F.count(F.lit(1)).alias("n_distinct"))
    )
    bigrams = F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice("toks", 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bstats = (
        base.select("doc_id", "n", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n")
        .agg(F.max("c").alias("top_big"))
    )
    return tstats.join(bstats, ["doc_id", "n"], "left").select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(F.col("n_distinct") / n, 4).alias("distinct_ratio"),
        F.round(F.col("top_tok") / n, 4).alias("top_token_ratio"),
        F.when(n > 1, F.round(F.col("top_big") / (n - 1), 4))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_ratio"),
    )


def repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition stats: distinct-token ratio, top-token fraction,
    top-bigram fraction (rounded to 4 places, matching the oracle).

    Length-switched plan: docs at or under REPETITION_EXPLODE_MIN_TOKENS
    take the shuffle-free HOF projection; longer docs (book-length, where
    the HOF's O(tokens * distinct) per-row cost goes quadratic) take the
    explode + groupBy twin.  Outputs are bit-identical either way, so the
    switch threshold never changes results — only the physical plan.
    """
    # Routing predicate: CHARACTER length, not token count.  The r04
    # form routed on size(split(text)) — which tokenizes every doc once
    # just to decide the branch, on top of each branch's own split (the
    # +71% qual_repetition regression in BENCH_r04).  Any routing is
    # output-identical (both branches compute the same metrics), so route
    # on length(text): a cheap scalar the scan evaluates without
    # materializing the token array.  A doc of more than
    # 2*REPETITION_EXPLODE_MIN_TOKENS chars has at most that many
    # whitespace tokens only when tokens average < 2 chars — the explode
    # twin is linear either way, so an occasional short-token doc routed
    # long costs nothing; NULL text routes down the HOF branch (size(NULL)
    # would fail both predicates and silently drop the row).
    char_threshold = 2 * REPETITION_EXPLODE_MIN_TOKENS
    d = docs(spark, sf_dir).select(
        "doc_id", "text", F.split(F.col("text"), " ").alias("toks")
    )
    short = d.filter(
        (F.length("text") <= char_threshold) | F.col("text").isNull()
    ).drop("text")
    long = d.filter(F.length("text") > char_threshold).drop("text")
    return _repetition_hof(short).unionByName(_repetition_exploded(long))


def source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition per (source, lang): doc count, token volume,
    mean length, and how many docs clear the QUALITY_MIN_TOKENS bar.

    One partial-aggregated shuffle on a low-cardinality key — the
    map-side combine does nearly all the work at scale.
    """
    n = F.size(_toks())
    return (
        docs(spark, sf_dir)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n.cast("long")).alias("sum_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.sum((n >= QUALITY_MIN_TOKENS).cast("long")).alias("n_quality"),
        )
        .select("source", "lang", "n_docs", "sum_tokens", "avg_chars", "n_quality")
    )


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, md5 bucket, distinct NGRAM-gram set (docs shorter than
    NGRAM tokens have no n-grams and drop out, both engines).

    Grams are built by folding zip_with over NGRAM shifted slices —
    per-element array indexing inside a transform lambda is interpreted
    and re-walks the array per lookup (the dedup._shingles measurement:
    ~5x slower), while zip_with streams all slices; and slices need no
    ANSI out-of-bounds guards."""
    toks = _toks()
    # gram count for docs passing the filter below; clamped at 0 because
    # Spark may evaluate the projection on rows the filter later prunes
    # (common-subexpression eval order is not guaranteed) and slice
    # rejects negative lengths
    n_sh = F.greatest(F.size(toks) - (NGRAM - 1), F.lit(0))
    grams = F.slice(toks, 1, n_sh)
    for k in range(1, NGRAM):
        grams = F.zip_with(
            grams,
            F.slice(toks, k + 1, n_sh),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return (
        docs(spark, sf_dir)
        .filter(F.size(toks) >= NGRAM)
        .select(
            "doc_id",
            _hash_bucket(F.col("doc_id")).alias("bucket"),
            F.array_distinct(grams).alias("shingles"),
        )
    )


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing any NGRAM-gram with the held-out slice (md5 bucket
    below EVAL_FRACTION of HASH_MOD), with the distinct-hit count.

    The held-out side collapses to a distinct n-gram set and is
    broadcast; the training side is exploded once and hash-joined
    locally — the corpus is never shuffled and never self-joined.
    """
    sh = _shingled(spark, sf_dir)
    thresh = int(EVAL_FRACTION * HASH_MOD)
    eval_grams = (
        sh.filter(F.col("bucket") < thresh)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    train = sh.filter(F.col("bucket") >= thresh).select(
        "doc_id",
        F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("s"),
    )
    return (
        train.join(F.broadcast(eval_grams), "s")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            "doc_id",
            "n_hits",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.round(F.col("n_hits") / F.col("n_shingles"), 4).alias("hit_ratio"),
        )
    )


#: PII patterns (engine-portable: same string compiles in Java regex and
#: RE2, so the oracle replays the scrub exactly)
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9().\s-]{7,}[0-9]"


def pii_scrub(transcripts: DataFrame) -> DataFrame:
    """PII masking — the curation stage that redacts contact data before
    a corpus ships: emails (the same EMAIL_RE the extractor recognizes),
    IPv4 addresses and phone-shaped digit runs replaced with typed
    placeholders, with per-row match counts for the scrub report.

    Pure column map (regexp_count + a regexp_replace chain, zero
    shuffle); the output carries the redacted text's md5 rather than the
    text so the driver hash check stays compact.  Replacement order
    (email -> ip -> phone) is part of the contract: an email's digits
    must not be re-matched as a phone number, and the oracle applies the
    identical order.
    """
    from kartograph_spark.rules import EMAIL_RE

    t = F.col("text")
    no_email = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    no_ip = F.regexp_replace(no_email, IPV4_RE, "[IP]")
    redacted = F.regexp_replace(no_ip, PHONE_RE, "[PHONE]")
    return transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(no_email, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(no_ip, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )
