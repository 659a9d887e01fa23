"""Distributed connected components — large-star / small-star.

Canonicalization of coreferent entities is a transitive closure over the
pair set (SURVEY.md §2.6; reference applies duplicate_groups maps
incrementally, agent_deduplicator.py:337-389, which chains across rounds —
the closure is exactly connected components).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", CIKM'14) — O(log n)
rounds, each round two shuffles (groupBy min + join), no GraphFrames
dependency.  Each round is ``localCheckpoint``-ed to cut lineage so the
plan stays bounded on skewed celebrity components (SURVEY.md §7.4).

Scale note: star operations emit at most |E| edges per round and the
min-aggregation is a map-side-combinable groupBy, so the loop survives a
100x scale-up; the convergence check is an O(1)-result aggregate
(count + xor-ish hash sum), not a collect of the edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 25

#: below this many pairs, transitive closure runs as a driver-side
#: union-find (one collect) instead of the iterative distributed loop —
#: the same size-based strategy choice AQE makes for broadcast joins.
#: Coreference pair sets are entity-vocabulary-sized, so even 10^12-turn
#: corpora typically stay under this; the distributed path remains for
#: adversarial cases (celebrity components).
DRIVER_UNION_FIND_MAX = 2_000_000


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    joined = sym.join(mins, "u")
    return (
        joined.filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    joined = oriented.join(mins, "u")
    out = joined.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = joined.select(F.col("u"), F.col("m").alias("v"))
    return out.union(self_edge).filter(F.col("u") != F.col("v")).distinct()


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Small-input fast path: path-halving union-find on collected pairs.
    One collect + one createDataFrame — replaces ~2 log-rounds x 4 jobs of
    driver-coordinated latency for vocabulary-sized pair sets."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edges.collect():
        ra, rb = find(r["u"]), find(r["v"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(m, find(m)) for m in list(parent)]
    return edges.sparkSession.createDataFrame(
        rows, "member string, component string"
    )


def connected_components(
    pairs: DataFrame, max_driver_edges: int | None = None
) -> DataFrame:
    """pairs(src, dst) -> labels(member, component) with component = min id.

    Includes a self row (component, component) for each component root, so
    every node seen in ``pairs`` appears exactly once in the output.
    """
    edges = (
        pairs.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    if n_edges == 0:
        return pairs.sparkSession.createDataFrame([], "member string, component string")
    cap = DRIVER_UNION_FIND_MAX if max_driver_edges is None else max_driver_edges
    if n_edges <= cap:
        return _driver_union_find(edges)

    sig = _signature(edges)
    for _ in range(MAX_ROUNDS):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_sig = _signature(edges)
        if new_sig == sig:
            break
        sig = new_sig

    # After convergence edges form stars (member -> component min).
    members = edges.select(
        F.col("u").alias("member"), F.col("v").alias("component")
    )
    roots = edges.select(F.col("v").alias("member"), F.col("v").alias("component"))
    return members.union(roots).distinct()


def canonical_map(
    pairs: DataFrame,
    preferred: DataFrame | None = None,
    max_driver_edges: int | None = None,
) -> DataFrame:
    """Coreference pairs -> rewrite map (member_urn, canonical_urn).

    The representative of each component is the minimum URN, except that
    URNs present in ``preferred`` (a one-column ``urn`` DataFrame of alias-
    dictionary canonicals) win first — mirroring the reference's
    primary_urn taking precedence inside a duplicate group
    (agent_deduplicator.py:344-378).  Identity rows are filtered out, so
    the result is small (only actually-merged entities) and broadcastable.
    """
    labels = connected_components(pairs, max_driver_edges=max_driver_edges)
    if labels.isEmpty():
        return labels.sparkSession.createDataFrame(
            [], "member_urn string, canonical_urn string"
        )
    if preferred is not None:
        pref = preferred.select(F.col("urn").alias("member"), F.lit(0).alias("tier"))
        labels = labels.join(F.broadcast(pref), "member", "left").withColumn(
            "tier", F.coalesce(F.col("tier"), F.lit(1))
        )
    else:
        labels = labels.withColumn("tier", F.lit(1))

    reps = labels.groupBy("component").agg(
        F.min(F.struct("tier", "member")).alias("best")
    ).select("component", F.col("best.member").alias("canonical_urn"))

    return (
        labels.join(reps, "component")
        .select(F.col("member").alias("member_urn"), "canonical_urn")
        .filter(F.col("member_urn") != F.col("canonical_urn"))
        .distinct()
    )
