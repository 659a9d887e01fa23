"""Validation anti-joins: broken refs (J1), orphans (J2), record rules."""

from kartograph_spark import validation as val


def _triples(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_ref boolean, dtype string,"
        " conv_id string, turn_idx long",
    )


def test_broken_ref_excluded_and_reported(spark):
    df = _triples(
        spark,
        [
            ("urn:A:a", "dgraph.type", "A", False, "string", "c", 0),
            ("urn:A:a", "rel", "urn:B:missing", True, "uid", "c", 0),  # broken
            ("urn:A:a", "rel", "urn:A:a", True, "uid", "c", 0),  # self ok
        ],
    )
    kept, broken = val.split_broken_refs(df)
    kept_objs = {(r["pred"], r["obj"]) for r in kept.collect()}
    assert ("rel", "urn:B:missing") not in kept_objs
    assert ("rel", "urn:A:a") in kept_objs
    b = broken.collect()
    assert len(b) == 1
    assert b[0]["target_urn"] == "urn:B:missing"
    assert b[0]["severity"] == "error"


def test_orphan_detection(spark):
    df = _triples(
        spark,
        [
            ("urn:A:a", "dgraph.type", "A", False, "string", "c", 0),
            ("urn:B:b", "dgraph.type", "B", False, "string", "c", 0),
            ("urn:C:c", "dgraph.type", "C", False, "string", "c", 0),
            ("urn:A:a", "rel", "urn:B:b", True, "uid", "c", 0),
        ],
    )
    orphans = {r["entity_id"] for r in val.find_orphans(df).collect()}
    assert orphans == {"urn:C:c"}


def test_record_errors(spark):
    from kartograph_spark.extraction.mentions import MENTION_SCHEMA

    rows = [
        ("c", 0, "urn", 0, 0, "urn:service:x", "service", "x", "x", "mentions", "s", None, "HIGH"),
        ("c", 0, "urn", 0, 1, "not-a-urn", "Service", "y", "y", "mentions", "s", None, "HIGH"),
        ("c", 0, "urn", 0, 2, "urn:Service:ok", "Service", "ok", "ok", "mentions", "s", None, "HIGH"),
    ]
    df = spark.createDataFrame(rows, MENTION_SCHEMA)
    errs = val.record_errors(df).collect()
    by_field = {(e["field"], e["entity_id"]) for e in errs}
    # lowercase type fails both the URN rule (urn:service:x has lowercase
    # type segment) and the type rule
    assert ("id", "urn:service:x") in by_field
    assert ("type", "urn:service:x") in by_field
    assert ("id", "not-a-urn") in by_field
    assert not any(e["entity_id"] == "urn:Service:ok" for e in errs)
