"""Property tests (hypothesis): the distributed graph/time-join operators
must agree with trivially-correct brute-force references on arbitrary
small inputs.  Few examples, derandomized — each example is a Spark job;
the value is input-shape coverage (self-loops, duplicate/reversed edges,
disconnected nodes, tie timestamps), not volume.
"""

from __future__ import annotations

import datetime as dt
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_nodes = st.integers(min_value=0, max_value=7)
_edges = st.lists(st.tuples(_nodes, _nodes), min_size=0, max_size=16)


def _brute_triangles(edges):
    und = {tuple(sorted((f"n{u}", f"n{v}"))) for u, v in edges if u != v}
    nodes = sorted({x for e in und for x in e})
    counts: dict[str, int] = {}
    for a, b, c in combinations(nodes, 3):
        if (
            tuple(sorted((a, b))) in und
            and tuple(sorted((b, c))) in und
            and tuple(sorted((a, c))) in und
        ):
            for x in (a, b, c):
                counts[x] = counts.get(x, 0) + 1
    return counts


@_SETTINGS
@given(_edges)
def test_triangle_counts_matches_brute_force(spark, edges):
    from kartograph_spark.components import triangle_counts

    df = spark.createDataFrame(
        [(f"n{u}", f"n{v}") for u, v in edges] or [("x", "x")],
        "src string, dst string",
    )
    got = {
        (r["node"], r["n_triangles"]) for r in triangle_counts(df).collect()
    }
    assert got == set(_brute_triangles(edges).items())


_times = st.integers(min_value=0, max_value=5)
_left = st.lists(st.tuples(st.integers(0, 2), _times), min_size=1, max_size=8)
_right = st.lists(st.tuples(st.integers(0, 2), _times), min_size=0, max_size=8)


@_SETTINGS
@given(_left, _right)
def test_asof_join_matches_brute_force(spark, left_rows, right_rows):
    from kartograph_spark.datapipe.relational import asof_join

    t0 = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(k, t0 + dt.timedelta(hours=h), i) for i, (k, h) in enumerate(left_rows)],
        "k long, ts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, t0 + dt.timedelta(hours=h), i, float(i)) for i, (k, h) in enumerate(right_rows)],
        "k long, ts timestamp, rid long, amount double",
    )
    out = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            ldf, rdf, key="k", time="ts", tiebreak="rid", carry=["amount"]
        ).collect()
    }
    # brute force: latest right at-or-before, ties -> max rid
    expect = {}
    for i, (k, h) in enumerate(left_rows):
        cands = [
            (rh, ri)
            for ri, (rk, rh) in enumerate(right_rows)
            if rk == k and rh <= h
        ]
        expect[i] = max(cands)[1] if cands else None
    assert out == expect


_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-10**6, max_value=10**6),
    st.text(alphabet="abcXYZ0-9_:ur n", max_size=12),
)
_json_values = st.recursive(
    _json_scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=3),
        st.dictionaries(st.text(alphabet="abc@idtype", min_size=1, max_size=6), kids, max_size=3),
    ),
    max_leaves=8,
)
_entity_dicts = st.dictionaries(
    st.sampled_from(["@id", "@type", "name", "owner", "tags", "x"]),
    _json_values,
    max_size=5,
)


@_SETTINGS
@given(st.lists(_entity_dicts, min_size=1, max_size=5))
def test_jsonld_loader_and_validator_total(spark, tmp_path_factory, dicts):
    """The variant loader + validator are TOTAL over arbitrary JSON
    entities: no exception, and every loaded entity is either valid or
    carries at least one error row (warnings alone never drop one)."""
    import json as _json

    from kartograph_spark.jsonld import (
        load_jsonld_graph_lines,
        validate_jsonld_entities,
    )

    p = tmp_path_factory.mktemp("fz") / "ents.jsonl"
    p.write_text("\n".join(_json.dumps(d) for d in dicts))
    ents = load_jsonld_graph_lines(spark, str(p))
    n = ents.count()
    assert n == len(dicts)
    valid, errs = validate_jsonld_entities(ents)
    n_valid = valid.count()
    err_rows = errs.collect()
    n_err_entities = len({e["entity_id"] for e in err_rows if e["severity"] == "error"})
    # error-severity entity ids may collide on 'unknown' (missing @id), so
    # partition holds as an inequality both ways
    assert n_valid <= n
    assert n_valid + n_err_entities <= n + len(dicts)
    if n_valid < n:
        assert n_err_entities >= 1
