"""Connected components + canonical map (SURVEY.md §2.6; FIXTURES F4
coreference-chain case: A≡B in conv 1, B≡C in conv 2 -> one component)."""

from kartograph_spark.components import canonical_map, connected_components


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_transitive_chain(spark):
    labels = connected_components(
        _pairs(spark, [("b", "a"), ("c", "b"), ("e", "d")])
    )
    got = {(r["member"], r["component"]) for r in labels.collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")}


def test_long_chain_converges(spark):
    n = 40
    rows = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    labels = connected_components(_pairs(spark, rows))
    comps = {r["component"] for r in labels.collect()}
    assert comps == {"n000"}
    assert labels.count() == n + 1


def test_canonical_map_min_urn(spark):
    cmap = canonical_map(_pairs(spark, [("urn:T:b", "urn:T:a"), ("urn:T:c", "urn:T:b")]))
    got = {(r["member_urn"], r["canonical_urn"]) for r in cmap.collect()}
    assert got == {("urn:T:b", "urn:T:a"), ("urn:T:c", "urn:T:a")}


def test_canonical_map_prefers_dictionary(spark):
    # min urn would be urn:A:x, but urn:Z:canon is a dictionary canonical
    pairs = _pairs(spark, [("urn:A:x", "urn:Z:canon")])
    pref = spark.createDataFrame([("urn:Z:canon",)], "urn string")
    cmap = canonical_map(pairs, preferred=pref)
    got = {(r["member_urn"], r["canonical_urn"]) for r in cmap.collect()}
    assert got == {("urn:A:x", "urn:Z:canon")}


def test_empty_pairs(spark):
    cmap = canonical_map(_pairs(spark, []))
    assert cmap.count() == 0


def test_distributed_path_matches_driver_path(spark):
    rows = [(f"u{i:02d}", f"u{i + 1:02d}") for i in range(0, 30, 2)] + [
        ("u01", "u02"),
        ("u15", "u16"),
    ]
    dist = connected_components(_pairs(spark, rows), max_driver_edges=0)
    drv = connected_components(_pairs(spark, rows))
    assert {tuple(r) for r in dist.collect()} == {tuple(r) for r in drv.collect()}


def test_triangle_counts_k4_plus_star(spark):
    from kartograph_spark.components import triangle_counts

    # K4 on a,b,c,d: 4 triangles, each vertex in exactly 3.
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    # star hub h -> s1..s4: no triangles at all.
    star = [("h", f"s{i}") for i in range(4)]
    got = {
        (r["node"], r["n_triangles"])
        for r in triangle_counts(_pairs(spark, k4 + star)).collect()
    }
    assert got == {("a", 3), ("b", 3), ("c", 3), ("d", 3)}


def test_triangle_counts_dedupes_and_ignores_direction(spark):
    from kartograph_spark.components import triangle_counts

    # same triangle given with duplicate and reversed edges counts once
    rows = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c")]
    got = {
        (r["node"], r["n_triangles"])
        for r in triangle_counts(_pairs(spark, rows)).collect()
    }
    assert got == {("a", 1), ("b", 1), ("c", 1)}
