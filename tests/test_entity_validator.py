"""EntityValidator rule transcription (reference
tests/unit/test_validation.py) against validate_jsonld_entities: each
case builds the same entity dicts the reference feeds validate_dict and
asserts the same error counts / severities / message content.
"""

from __future__ import annotations

import json

from kartograph_spark.jsonld import (
    load_jsonld_graph_lines,
    validate_jsonld_entities,
)


def _ents(spark, tmp_path, dicts):
    p = tmp_path / "ents.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in dicts))
    return load_jsonld_graph_lines(spark, str(p))


def _errors(spark, tmp_path, dicts, **cfg):
    _, errs = validate_jsonld_entities(_ents(spark, tmp_path, dicts), **cfg)
    return errs.collect()


VALID = {"@id": "urn:Service:payment-api", "@type": "Service", "name": "Payment API"}


def test_valid_entity_has_no_errors(spark, tmp_path):
    # test_validation.py:6-27 / :134-165
    assert _errors(spark, tmp_path, [VALID]) == []


def test_allows_missing_name_when_configured(spark, tmp_path):
    # test_validation.py:47-67: required fields without name -> no errors
    d = {"@id": "urn:Service:payment-api", "@type": "Service"}
    errs = _errors(
        spark, tmp_path, [d],
        required_fields=("@id", "@type"), allow_missing_name=True,
    )
    assert errs == []


def test_missing_name_warning_vs_error(spark, tmp_path):
    # entity_validator.py:129-152: allow_missing_name downgrades to warning
    d = {"@id": "urn:Service:payment-api", "@type": "Service"}
    warn = _errors(spark, tmp_path, [d], allow_missing_name=True)
    assert [e["severity"] for e in warn] == ["warning"]
    assert warn[0]["message"] == "Missing optional field: name"
    hard = _errors(spark, tmp_path, [d])
    assert [e["severity"] for e in hard] == ["error"]
    assert hard[0]["message"] == "Missing required field: name"
    # warning-only entities remain valid; error entities drop
    valid_w, _ = validate_jsonld_entities(
        _ents(spark, tmp_path, [d]), allow_missing_name=True
    )
    valid_e, _ = validate_jsonld_entities(_ents(spark, tmp_path, [d]))
    assert valid_w.count() == 1 and valid_e.count() == 0


def test_detects_invalid_urn_format(spark, tmp_path):
    # test_validation.py:69-98: strict mode
    for d in [
        {"@id": "payment-api", "@type": "Service", "name": "Payment API"},
        {"@id": "urn:Service", "@type": "Service", "name": "Payment API"},
    ]:
        errs = _errors(spark, tmp_path, [d])
        assert len(errs) > 0
        assert any("URN" in e["message"] or "urn" in e["message"] for e in errs)
    # 'payment-api' violates BOTH strict checks (prefix + 3 parts)
    both = _errors(
        spark, tmp_path,
        [{"@id": "payment-api", "@type": "Service", "name": "n"}],
    )
    assert sorted(e["message"] for e in both) == [
        "URN must have format 'urn:type:identifier' (at least 3 parts)",
        "URN must start with 'urn:'",
    ]


def test_non_strict_urn_mode(spark, tmp_path):
    # test_validation.py:246-267: non-strict downgrades to a warning and
    # only for colon-bearing non-urn ids
    d = {"@id": "svc:payment-api", "@type": "Service", "name": "n"}
    errs = _errors(spark, tmp_path, [d], strict_urn_format=False)
    assert [e["severity"] for e in errs] == ["warning"]
    plain = {"@id": "payment-api", "@type": "Service", "name": "n"}
    assert _errors(spark, tmp_path, [plain], strict_urn_format=False) == []


def test_detects_invalid_type_name(spark, tmp_path):
    # test_validation.py:100-132
    for d in [
        {"@id": "urn:service:x", "@type": "service", "name": "n"},
        {"@id": "urn:Service:x", "@type": "Service-Name", "name": "n"},
        {"@id": "urn:Service:x", "@type": "123Service", "name": "n"},
    ]:
        errs = _errors(spark, tmp_path, [d])
        assert len(errs) > 0
        assert any("type" in e["message"].lower() for e in errs)


def test_returns_multiple_errors(spark, tmp_path):
    # test_validation.py:167-188: one entity, several violated rules
    d = {"@id": "bad-urn", "@type": "bad-type"}  # name missing too
    errs = _errors(spark, tmp_path, [d])
    assert len(errs) >= 3
    assert {e["entity_id"] for e in errs} == {"bad-urn"}
    fields = {e["field"] for e in errs}
    assert {"@id", "@type", "name"} <= fields


def test_custom_required_fields(spark, tmp_path):
    # test_validation.py:284-304: an extra required open property
    d = dict(VALID)
    errs = _errors(
        spark, tmp_path, [d],
        required_fields=("@id", "@type", "name", "owner"),
    )
    assert [e["message"] for e in errs] == ["Missing required field: owner"]
    d2 = dict(VALID, owner={"@id": "urn:Team:payments"})
    assert _errors(
        spark, tmp_path, [d2],
        required_fields=("@id", "@type", "name", "owner"),
    ) == []


def test_extract_urn_references(spark, tmp_path):
    # test_enhanced_validation.py:14-32: nested dicts, arrays, plain strings
    from kartograph_spark.jsonld import extract_urn_refs

    d = {
        "@id": "urn:Service:api-1",
        "@type": "Service",
        "name": "API",
        "owner": {"@id": "urn:User:alice"},
        "dependsOn": {"@id": "urn:Service:db"},
        "tags": ["tag1", "urn:Tag:important"],
        "refs": [{"@id": "urn:Other:ref"}],
    }
    got = {r["ref"] for r in extract_urn_refs(_ents(spark, tmp_path, [d])).collect()}
    assert {
        "urn:User:alice", "urn:Service:db", "urn:Tag:important", "urn:Other:ref",
    } == got  # self-reference discarded


def test_detect_orphaned_entities(spark, tmp_path):
    # test_enhanced_validation.py:35-70: orphan has no refs, db has no
    # OUTGOING refs -> both flagged; connected is fine
    from kartograph_spark.jsonld import validate_jsonld_graph

    ents = _ents(spark, tmp_path, [
        {"@id": "urn:Service:orphan", "@type": "Service", "name": "Orphan Service"},
        {"@id": "urn:Service:connected", "@type": "Service", "name": "Connected",
         "dependsOn": {"@id": "urn:Service:db"}},
        {"@id": "urn:Service:db", "@type": "Service", "name": "Database"},
    ])
    errors = validate_jsonld_graph(ents).collect()
    orphan_errors = [e for e in errors if "orphaned" in e["message"].lower()]
    assert len(orphan_errors) == 2
    assert {e["entity_id"] for e in orphan_errors} == {
        "urn:Service:orphan", "urn:Service:db",
    }
    assert all(e["severity"] == "warning" for e in orphan_errors)


def test_detect_broken_references(spark, tmp_path):
    # test_enhanced_validation.py:73-97
    from kartograph_spark.jsonld import validate_jsonld_graph

    ents = _ents(spark, tmp_path, [
        {"@id": "urn:Service:broken", "@type": "Service", "name": "Broken",
         "owner": {"@id": "urn:User:nonexistent"},
         "dependsOn": {"@id": "urn:Service:missing"}},
    ])
    errors = validate_jsonld_graph(ents, detect_orphans=False).collect()
    broken = [e for e in errors if "non-existent" in e["message"].lower()]
    assert len(broken) == 2
    assert any("urn:User:nonexistent" in e["message"] for e in broken)
    assert any("urn:Service:missing" in e["message"] for e in broken)
    assert all(e["severity"] == "error" for e in broken)
