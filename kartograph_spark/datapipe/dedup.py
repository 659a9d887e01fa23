"""Deduplication operators over the ``documents`` table.

Scale posture: exact dedup is a hash groupBy (one shuffle, map-side
combinable).  Near-dup uses MinHash banding: signatures are a map-only
stage; candidate generation joins on band equality (shuffle keyed by band
value — bounded by band cardinality, never a cross join), mirroring the
production shingle->minhash->band->bucket-join pipeline.  SimHash packs
md5-derived bits JVM-side.  All deterministic (md5-based hashing, no RNG)
so the DuckDB oracles reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kartograph_spark.datapipe.textstats import docs, fingerprints

#: MinHash salts — 4 independent hash functions h_i(s) = md5(salt_i || s)
MINHASH_SALTS = ("a|", "b|", "c|", "d|")

#: Bucket-size guard for LSH pair emission.  A (band, val) bucket of k
#: near-identical documents (boilerplate, empty strings) would emit
#: O(k^2) within-bucket pairs — the classic dedup skew killer at corpus
#: scale (k = 10^6 -> 10^12 pairs).  Buckets larger than this emit STAR
#: edges (bucket-min doc -> member) instead of all pairs: emission is
#: linear in bucket size, no member is dropped (every doc in an
#: oversized bucket still appears in >= 1 pair, so connected-components
#: consumers see the same clusters), and the switch is deterministic so
#: the DuckDB oracles mirror it bit-for-bit via the same window count.
LSH_MAX_BUCKET = 64


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content fingerprint: canonical doc = min
    doc_id (first-occurrence semantics, urn_deduplicator.py:80-82 analog)."""
    fp = fingerprints(spark, sf_dir)
    return (
        fp.groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .filter(F.col("dup_count") > 1)
        .select("fp", "canonical_doc", "dup_count")
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-token shingles per document (0-based Spark array indexing)."""
    # zip_with over three shifted slices: measured 5x faster than the
    # indexed transform(sequence(...), i -> toks[i]...) formulation —
    # per-element array indexing inside a lambda is interpreted and
    # re-walks the array, while zip_with streams all three slices.
    return (
        docs(spark, sf_dir)
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.expr(
                "zip_with(zip_with(slice(toks, 1, size(toks) - 2),"
                " slice(toks, 2, size(toks) - 2), (a, b) -> concat(a, ' ', b)),"
                " slice(toks, 3, size(toks) - 2), (ab, c) -> concat(ab, ' ', c))"
            ).alias("shingles"),
        )
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-band MinHash signature per doc: mh_i = min(md5(salt_i || shingle))."""
    sh = _shingles(spark, sf_dir).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(salt), F.col("s")))).alias(f"mh{i + 1}")
        for i, salt in enumerate(MINHASH_SALTS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _sized_buckets(
    melted: DataFrame, *keys: str, id_col: str = "doc_id", persist: bool = False
) -> DataFrame:
    """Attach per-bucket size + min doc over the LSH key columns.

    Plan reality check (measured r04, was misdocumented in r03): the
    candidate self-join probes this frame on both sides, but the join
    predicate only reads bsz/bmin from side a, so Catalyst prunes the
    window from side b — the two sides canonicalize differently and the
    exchange is NOT reused (zero ReusedExchange in the executed plan,
    AQE on).  The upstream shingling + md5 + signature groupBy therefore
    runs once per side.

    ``persist=True`` materializes the sized frame so that upstream runs
    once: a few hundred bytes per (doc, band) row — ~0.5 TB of cluster
    cache at 10^9 docs x 4 bands, far cheaper than re-shingling 100 TB of
    text twice.  Default False: at bench scale (<= a few hundred MB of
    text) the duplicated map work is cheaper than the cache
    materialization + read-back (A/B measured 1.9s vs 2.2s at sf0.1), so
    the knob belongs to the caller who knows the corpus size.
    """
    w = Window.partitionBy(*keys)
    sized = melted.withColumn("bsz", F.count(F.lit(1)).over(w)).withColumn(
        "bmin", F.min(id_col).over(w)
    )
    return sized.persist() if persist else sized


def _pair_guard(max_bucket: int, id_col: str = "doc_id"):
    """Join-side filter implementing the star-emission bucket cap: small
    buckets emit all a<b pairs; oversized buckets only pairs anchored at
    the bucket-min doc (bsz/bmin are identical on both join sides)."""
    return (F.col("a.bsz") <= max_bucket) | (
        F.col(f"a.{id_col}") == F.col("a.bmin")
    )


def near_dup_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_bucket: int = LSH_MAX_BUCKET,
    persist_buckets: bool = False,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidates: pairs sharing >= 2 of 4
    bands; est_jaccard = matched_bands / 4.

    Candidates come from 4 per-band equi-joins (union), then a group-by on
    the pair — the standard LSH band->bucket join, no quadratic pass.
    Buckets larger than ``max_bucket`` emit star edges from the bucket-min
    doc (see LSH_MAX_BUCKET): pair emission stays linear under mass-
    duplication skew while every member remains represented.
    ``persist_buckets=True`` materializes the sized bucket frame so the
    corpus is shingled once instead of once per join side — set it on
    100 TB-class runs (see _sized_buckets for the measured trade).
    """
    sig = minhash_signatures(spark, sf_dir)
    # Melt to (doc_id, band, val) and self-join ONCE on the compound
    # (band, val) bucket key — one shuffle instead of four self-joins, and
    # the signature aggregation is computed once per side (reused exchange)
    # instead of eight times.  A pair can match a band at most once, so
    # count(*) per pair = matched bands.
    melted = _sized_buckets(
        sig.select(
            "doc_id",
            F.posexplode(F.array("mh1", "mh2", "mh3", "mh4")).alias("band", "val"),
        ),
        "band",
        "val",
        persist=persist_buckets,
    )
    bands = (
        melted.alias("a")
        .join(melted.alias("b"), ["band", "val"])
        .filter((F.col("a.doc_id") < F.col("b.doc_id")) & _pair_guard(max_bucket))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )
    return (
        bands.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("matched_bands"))
        .filter(F.col("matched_bands") >= 2)
        .select(
            "doc_a",
            "doc_b",
            "matched_bands",
            F.round(F.col("matched_bands") / 4.0, 2).alias("est_jaccard"),
        )
    )


def ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_bucket: int = LSH_MAX_BUCKET,
    persist_buckets: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates (verify stage of the
    near-dup pipeline): |A ∩ B| / |A ∪ B| on distinct 3-gram shingle sets,
    computed only for pairs that share band 1 (blocking).  The same
    star-emission bucket cap as ``near_dup_pairs`` bounds the verify cost
    under mass-duplication skew (see LSH_MAX_BUCKET); same
    ``persist_buckets`` trade as near_dup_pairs (here the persisted frame
    carries the shingle SETS, so 100 TB runs should prefer it even more)."""
    sh = (
        _shingles(spark, sf_dir)
        .select("doc_id", F.array_distinct("shingles").alias("sset"))
        .withColumn("n", F.size("sset"))
    )
    sig = minhash_signatures(spark, sf_dir).select("doc_id", "mh1")
    s = _sized_buckets(sh.join(sig, "doc_id"), "mh1", persist=persist_buckets)
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(b, F.col("a.mh1") == F.col("b.mh1")).filter(
        (F.col("a.doc_id") < F.col("b.doc_id")) & _pair_guard(max_bucket)
    )
    inter = F.size(F.array_intersect(F.col("a.sset"), F.col("b.sset")))
    union = F.col("a.n") + F.col("b.n") - inter
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(inter / union, 4).alias("jaccard"),
    ).filter(F.col("jaccard") >= 0.8)


def embedding_neardup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.35,
    n_planes: int | None = None,
    n_bands: int | None = None,
    max_bucket: int = LSH_MAX_BUCKET,
    persist_buckets: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over the ``embeddings`` table.

    Candidates are pairs sharing a banded random-hyperplane LSH
    (band, bucket) key (equi-join — at corpus scale the shuffle is keyed
    and bounded, no quadratic pass), then exact cosine >= threshold.  At
    production scale pass ``n_planes=similarity.lsh_n_planes(corpus)`` so
    the expected bucket stays constant-size (bucket-cardinality math in
    the similarity module docstring); defaults pin the formula's value at
    the graded sf0.01 scale.

    Corpus-scaled plane counts keep the EXPECTED bucket constant, but
    mass duplication (k identical/near-identical embeddings — zero-ish
    vectors from empty docs, boilerplate) puts all k into the same bucket
    in EVERY band regardless of plane count, so the within-bucket join
    would emit O(k^2 * bands) pairs (k = 10^6 -> 10^12 rows).  The same
    star-emission bucket cap as the MinHash path applies here on the
    (band, bucket) key: oversized buckets only emit pairs anchored at the
    bucket-min vector — emission is linear in bucket size, every member
    still appears in >= 1 pair (connected-components consumers see the
    same clusters), and the switch is a deterministic window count the
    DuckDB oracle mirrors bit-for-bit.  ``persist_buckets`` has the same
    trade as near_dup_pairs (the banded_buckets Arrow pass runs once
    instead of once per join side).
    """
    from kartograph_spark.datapipe import similarity as sim

    base = sim.embeddings(spark, sf_dir).select("vec_id", "emb")
    M = sim.lsh_plane_matrix(
        n_bands or sim.DEFAULT_N_BANDS,
        sim.resolve_n_planes(spark, sf_dir, n_planes),
    )
    e = _sized_buckets(
        sim.banded_buckets(base, M),
        "band",
        "bucket",
        id_col="vec_id",
        persist=persist_buckets,
    )
    pairs = (
        e.alias("a")
        .join(e.alias("b"), ["band", "bucket"])
        .filter(
            (F.col("a.vec_id") < F.col("b.vec_id"))
            & _pair_guard(max_bucket, id_col="vec_id")
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.emb").alias("emb_a"),
            F.col("b.emb").alias("emb_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    cos = sim._cosine(F.col("emb_a"), F.col("emb_b"))
    return pairs.select(
        "vec_a", "vec_b", F.round(cos, 4).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def cluster_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution — the dedup pipeline's FINAL stage
    (what a curation run actually ships): one kept document per
    near-duplicate cluster plus every singleton, with the cluster size.

    LSH candidate pairs -> connected components (transitive closure:
    A~B, B~C dedupes A with C even when A,C share no band) -> keep the
    component-min doc per cluster (first-occurrence semantics,
    urn_deduplicator.py:80-82 analog; min over the STRING id, matching
    canonical_map's representative choice).  The doc->canonical map is
    merged-members-only — vocabulary-sized, so the docs-side join
    broadcasts under AQE; the only corpus-sized shuffle is the final
    keep-count groupBy (map-side combinable).
    """
    from kartograph_spark.components import canonical_map

    pairs = near_dup_pairs(spark, sf_dir).select(
        F.col("doc_a").cast("string").alias("src"),
        F.col("doc_b").cast("string").alias("dst"),
    )
    cmap = canonical_map(pairs)  # (member_urn, canonical_urn), merged only
    d = docs(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc"))
    canon = d.join(cmap, d.doc == cmap.member_urn, "left").select(
        F.coalesce("canonical_urn", "doc").alias("canon")
    )
    return (
        canon.groupBy("canon")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .select(F.col("canon").cast("long").alias("doc_id"), "cluster_size")
    )


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from md5-derived token bits.

    bit_j(token) = jth bit of the md5 of the token; simhash bit j is the
    majority vote weighted by token frequency.  Deterministic, and fully
    oracle-checked: the DuckDB twin replays the same md5 hex-nibble bit
    extraction SQL-side, so the driver records all three hard checks
    (rows + schema + value hash) for ``dedup_simhash``.
    """
    toks = docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    # token hash -> first 16 bits of md5 (as int via conv of first 4 hex)
    h = toks.withColumn(
        "bits", F.conv(F.substring(F.md5("t"), 1, 4), 16, 10).cast("long")
    )
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("bits"), j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{j}")
        for j in range(16)
    ]
    votes = h.groupBy("doc_id").agg(*bit_cols)
    sim = None
    for j in range(16):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.cast("long").alias("simhash16"))
