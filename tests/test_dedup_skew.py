"""Bucket-size guard for LSH pair emission (the dedup skew killer).

A mass-duplicated document (boilerplate, empty strings) puts k docs into
the same (band, val) bucket in every band; an uncapped within-bucket join
emits O(k^2) pairs (k = 10^6 -> 10^12 at corpus scale).  The guard
switches oversized buckets to star emission from the bucket-min doc:
pair count is linear, every member stays represented, and connected-
components consumers see the same clusters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kartograph_spark.components import canonical_map
from kartograph_spark.datapipe import dedup

CLUSTER = 500  # >> LSH_MAX_BUCKET(64); all-pairs would be ~125k rows


def _write_corpus(tmp_path) -> str:
    boiler = (
        "the same boilerplate text repeated verbatim across the corpus "
        "over and over once more"
    )
    rows = [
        {"doc_id": i, "text": boiler, "n_chars": len(boiler), "lang": "en"}
        for i in range(CLUSTER)
    ]
    # a small duplicate group (3 < cap: all-pairs behavior must survive)
    small = "three documents share this small duplicate body of text here"
    for i in range(3):
        rows.append(
            {
                "doc_id": 9000 + i,
                "text": small,
                "n_chars": len(small),
                "lang": "en",
            }
        )
    # distinct singletons (no pairs at all)
    for i in range(5):
        uniq = f"unique document number {i} talks about topic{i} alone entirely"
        rows.append(
            {
                "doc_id": 9500 + i,
                "text": uniq,
                "n_chars": len(uniq),
                "lang": "en",
            }
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_lsh_bucket_cap_bounds_skewed_cluster(spark, tmp_path):
    sf = _write_corpus(tmp_path)
    pairs = dedup.near_dup_pairs(spark, sf).toPandas()

    cluster = pairs[(pairs.doc_a < CLUSTER) & (pairs.doc_b < CLUSTER)]
    # star emission: k-1 pairs anchored at the bucket-min doc, not k(k-1)/2
    assert len(cluster) == CLUSTER - 1
    assert (cluster.doc_a == 0).all()
    assert set(cluster.doc_b) == set(range(1, CLUSTER))
    # identical docs share every band
    assert (cluster.matched_bands == 4).all()
    assert (cluster.est_jaccard == 1.0).all()

    # sub-cap duplicate group keeps full all-pairs emission
    small = pairs[pairs.doc_a >= 9000]
    assert sorted(map(tuple, small[["doc_a", "doc_b"]].to_numpy())) == [
        (9000, 9001),
        (9000, 9002),
        (9001, 9002),
    ]
    # singletons emit nothing
    assert not ((pairs.doc_a >= 9500) | (pairs.doc_b >= 9500)).any()


def test_lsh_cap_preserves_connected_components(spark, tmp_path):
    sf = _write_corpus(tmp_path)
    edges = dedup.near_dup_pairs(spark, sf).select(
        F.col("doc_a").cast("string").alias("src"),
        F.col("doc_b").cast("string").alias("dst"),
    )
    cm = canonical_map(edges).toPandas()
    got = dict(zip(cm.member_urn, cm.canonical_urn))
    # the whole planted cluster collapses to one component rooted at min
    assert {got[str(i)] for i in range(1, CLUSTER)} == {"0"}
    assert got["9001"] == "9000" and got["9002"] == "9000"


def test_ngram_jaccard_verify_stage_capped(spark, tmp_path):
    sf = _write_corpus(tmp_path)
    jac = dedup.ngram_jaccard_pairs(spark, sf).toPandas()
    cluster = jac[(jac.doc_a < CLUSTER) & (jac.doc_b < CLUSTER)]
    assert len(cluster) == CLUSTER - 1
    assert (cluster.doc_a == 0).all()
    assert (cluster.jaccard == 1.0).all()
    small = jac[jac.doc_a >= 9000]
    assert len(small) == 3 and (small.jaccard == 1.0).all()


def test_persist_buckets_identical_results(spark):
    """persist_buckets only changes the physical plan (one shingling pass
    vs one per join side) — never the emitted pair set."""
    from kartograph_spark.datapipe import dedup

    sf = "/root/testdata/sf0.001"
    base = {tuple(r) for r in dedup.near_dup_pairs(spark, sf).collect()}
    pers = {
        tuple(r)
        for r in dedup.near_dup_pairs(spark, sf, persist_buckets=True).collect()
    }
    assert base == pers


# --------------------------------------------------------------------------
# embedding_neardup: the same skew class, on the (band, bucket) LSH key
# --------------------------------------------------------------------------

EMB_CLUSTER = 400  # >> LSH_MAX_BUCKET(64); all-pairs would be ~80k rows/band


def _write_embeddings(tmp_path) -> str:
    import numpy as np

    from kartograph_spark.datapipe import similarity as sim

    rng = np.random.default_rng(7)
    v_cluster = rng.normal(size=sim.EMBED_DIM)
    v_small = rng.normal(size=sim.EMBED_DIM)
    rows = []
    # mass-duplicated vector: every band puts all EMB_CLUSTER copies in
    # ONE bucket no matter how many planes — the uncapped join would emit
    # O(k^2 * bands) pairs
    for i in range(EMB_CLUSTER):
        rows.append({"vec_id": i, "embedding": v_cluster.astype("float32"), "label": 0})
    # a small identical group (3 < cap: all-pairs behavior must survive)
    for i in range(3):
        rows.append({"vec_id": 9000 + i, "embedding": v_small.astype("float32"), "label": 1})
    # distinct random singletons (near-orthogonal, below the 0.35 threshold)
    for i in range(5):
        rows.append(
            {
                "vec_id": 9500 + i,
                "embedding": rng.normal(size=sim.EMBED_DIM).astype("float32"),
                "label": 2,
            }
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_embedding_bucket_cap_bounds_skewed_cluster(spark, tmp_path):
    sf = _write_embeddings(tmp_path)
    pairs = dedup.embedding_neardup(spark, sf).toPandas()

    cluster = pairs[(pairs.vec_a < EMB_CLUSTER) & (pairs.vec_b < EMB_CLUSTER)]
    # star emission: k-1 pairs anchored at the bucket-min vector
    assert len(cluster) == EMB_CLUSTER - 1
    assert (cluster.vec_a == 0).all()
    assert set(cluster.vec_b) == set(range(1, EMB_CLUSTER))
    assert (cluster.cosine == 1.0).all()

    # sub-cap identical group keeps full all-pairs emission
    small = pairs[(pairs.vec_a >= 9000) & (pairs.vec_b < 9500)]
    assert sorted(map(tuple, small[["vec_a", "vec_b"]].to_numpy())) == [
        (9000, 9001),
        (9000, 9002),
        (9001, 9002),
    ]
    assert (small.cosine == 1.0).all()


def test_embedding_cap_preserves_connected_components(spark, tmp_path):
    sf = _write_embeddings(tmp_path)
    edges = dedup.embedding_neardup(spark, sf).select(
        F.col("vec_a").cast("string").alias("src"),
        F.col("vec_b").cast("string").alias("dst"),
    )
    cm = canonical_map(edges).toPandas()
    got = dict(zip(cm.member_urn, cm.canonical_urn))
    assert {got[str(i)] for i in range(1, EMB_CLUSTER)} == {"0"}
    assert got["9001"] == "9000" and got["9002"] == "9000"
