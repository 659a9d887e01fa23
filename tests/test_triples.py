"""Triple-emission rules: predicate cleaning, literal sanitization,
mixed-type resolution, N-Quads rendering (load_dgraph.py:273-417)."""

import pandas as pd
from pyspark.sql import functions as F

from kartograph_spark import rules
from kartograph_spark import triples as tr


def test_clean_predicate_pandas():
    s = pd.Series(["@type", "$schema", "a:b/c\\d", "uid", "dgraph.foo", "name"])
    out = list(rules.clean_predicate(s))
    assert out == ["type", "_schema", "a_b_c_d", "_uid", "_dgraph.foo", "name"]


def test_clean_predicate_spark(spark):
    df = spark.createDataFrame(
        [("@type",), ("$schema",), ("a:b/c\\d",), ("uid",), ("dgraph.foo",)],
        "pred string",
    )
    got = [r[0] for r in df.select(tr.clean_predicate_col(F.col("pred"))).collect()]
    assert got == ["type", "_schema", "a_b_c_d", "_uid", "_dgraph.foo"]


def test_literal_sanitization_parity(spark):
    vals = ['has "quotes"', "line\nbreak", "back\\slash", "{json}", "[arr]", "None", "ok"]
    s = pd.Series(vals)
    esc = rules.escape_literal(s)
    dropped = rules.literal_is_dropped(esc)
    # {json}, [arr], None dropped (load_dgraph.py:408-417)
    assert list(dropped) == [False, False, False, True, True, True, False]
    assert esc[0] == 'has \\"quotes\\"'
    assert esc[1] == "line\\nbreak"
    assert esc[2] == "back\\\\slash"

    df = spark.createDataFrame([(v,) for v in vals], "val string")
    got = df.select(
        tr.escape_literal_col(F.col("val")).alias("esc"),
        (~tr.literal_kept_col(tr.escape_literal_col(F.col("val")))).alias("dropped"),
    ).collect()
    assert [r["esc"] for r in got] == list(esc)
    assert [r["dropped"] for r in got] == list(dropped)


def test_encode_urn_parity(spark):
    import urllib.parse

    vals = [
        "urn:Service:api.v2",
        "urn:CodeRepository:https://github.com/org/repo",
        "urn:EmailAddress:a+b@c.io",
        "urn:Team:data eng",
        'urn:X:we"ird',
    ]
    s = rules.encode_urn(pd.Series(vals))
    # parity with urllib.parse.quote(urn, safe=":") on this charset
    for raw, enc in zip(vals, s):
        assert enc == urllib.parse.quote(raw, safe=":")
    df = spark.createDataFrame([(v,) for v in vals], "urn string")
    got = [r[0] for r in df.select(tr.encode_urn_col(F.col("urn"))).collect()]
    assert got == list(s)


def test_mixed_type_resolution(spark):
    rows = [
        # pred 'rel' observed as uid AND scalar -> scalar dropped
        ("urn:A:a", "rel", "urn:B:b", True, "uid", "c", 0, 0, 0),
        ("urn:A:a", "rel", "stringval", False, "string", "c", 1, 0, 0),
        # pred 'lit' scalar only -> kept
        ("urn:A:a", "lit", "42", False, "int", "c", 2, 0, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_ref boolean, dtype string,"
        " conv_id string, turn_idx long, kind_rank long, match_idx long",
    )
    out = tr.resolve_mixed_type_predicates(df).collect()
    kept = {(r["pred"], r["obj"]) for r in out}
    assert kept == {("rel", "urn:B:b"), ("lit", "42")}


def test_nquad_rendering(spark):
    rows = [
        ("urn:A:a", "rel", "urn:B:b", True, "uid"),
        ("urn:A:a", "name", "Alpha", False, "string"),
        ("urn:A:a", "n", "3", False, "int"),
        ("urn:A:a", "f", "1.5", False, "float"),
        ("urn:A:a", "ok", "true", False, "bool"),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_ref boolean, dtype string"
    )
    got = {r[0] for r in tr.to_nquads(df).collect()}
    assert got == {
        "<urn:A:a> <rel> <urn:B:b> .",
        '<urn:A:a> <name> "Alpha" .',
        '<urn:A:a> <n> "3"^^<xs:int> .',
        '<urn:A:a> <f> "1.5"^^<xs:float> .',
        '<urn:A:a> <ok> "true"^^<xs:boolean> .',
    }


def test_first_occurrence_dedup(spark):
    rows = [
        ("s", "p", "o", True, "uid", "c2", 5, 0, 0),
        ("s", "p", "o", True, "uid", "c1", 9, 0, 0),  # earlier conv wins
        ("s", "p", "o", True, "uid", "c1", 2, 3, 1),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_ref boolean, dtype string,"
        " conv_id string, turn_idx long, kind_rank long, match_idx long",
    )
    out = tr.dedup_first_occurrence(df).collect()
    assert len(out) == 1
    assert (out[0]["conv_id"], out[0]["turn_idx"]) == ("c1", 2)


def test_dedup_keep_last_strategy(spark):
    """urn_merge_strategy 'last' (urn_deduplicator.py:83-85): latest
    emission wins provenance."""
    rows = [
        ("s", "p", "o", True, "uid", "c2", 5, 0, 0),
        ("s", "p", "o", True, "uid", "c1", 9, 0, 0),
        ("s", "p", "o", True, "uid", "c1", 2, 3, 1),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_ref boolean, dtype string,"
        " conv_id string, turn_idx long, kind_rank long, match_idx long",
    )
    out = tr.dedup_first_occurrence(df, keep="last").collect()
    assert len(out) == 1
    assert (out[0]["conv_id"], out[0]["turn_idx"]) == ("c2", 5)


def test_build_nodes_first_vs_last(spark):
    """Reference first/last cases (tests/unit/test_deduplication.py:41-100):
    duplicate URN, strategy picks which record's attributes survive."""
    from kartograph_spark.graph import build_nodes

    rows = [
        ("urn:Service:api1", "dgraph.type", "Service", False, "string", "c1", 0),
        ("urn:Service:api1", "name", "API 1 - First", False, "string", "c1", 0),
        ("urn:Service:api1", "dgraph.type", "Service", False, "string", "c1", 5),
        ("urn:Service:api1", "name", "API 1 - Second", False, "string", "c1", 5),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_ref boolean, dtype string,"
        " conv_id string, turn_idx long",
    )
    first = build_nodes(df, strategy="first").collect()[0]
    assert first["name"] == "API 1 - First" and first["first_turn_idx"] == 0
    last = build_nodes(df, strategy="last").collect()[0]
    assert last["name"] == "API 1 - Second" and last["first_turn_idx"] == 5


def test_build_nodes_description_last_non_none(spark):
    """Description merge = 'use non-None description if available' scanning
    records in order (urn_deduplicator.py:124-127): the LAST record with a
    description wins, records without one never overwrite it — regardless
    of the first/last attribute strategy."""
    from kartograph_spark.graph import build_nodes

    rows = [
        ("urn:Service:a", "dgraph.type", "Service", False, "string", "c1", 0),
        ("urn:Service:a", "name", "A", False, "string", "c1", 0),
        ("urn:Service:a", "description", "first desc", False, "string", "c1", 1),
        ("urn:Service:a", "description", "second desc", False, "string", "c1", 4),
        # later record mentions the entity again WITHOUT a description
        ("urn:Service:a", "dgraph.type", "Service", False, "string", "c2", 9),
        # entity with no description at all -> NULL
        ("urn:Service:b", "dgraph.type", "Service", False, "string", "c1", 2),
        ("urn:Service:b", "name", "B", False, "string", "c1", 2),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_ref boolean, dtype string,"
        " conv_id string, turn_idx long",
    )
    for strategy in ("first", "last"):
        got = {
            r["urn"]: r["description"]
            for r in build_nodes(df, strategy=strategy).collect()
        }
        assert got["urn:Service:a"] == "second desc"
        assert got["urn:Service:b"] is None
