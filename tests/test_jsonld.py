"""JSON-LD round-trip (S4/S5) + N-Quads export (S6) over a real pipeline
run on the seeded corpus."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kartograph_spark import jsonld
from kartograph_spark.graph import build_edges, build_nodes
from kartograph_spark.pipeline import build_triples


def _graph(spark, transcripts_df, alias_df):
    kept, _ = build_triples(spark, transcripts_df, alias_df)
    return build_nodes(kept), build_edges(kept), kept


def test_jsonld_document_roundtrip(spark, transcripts_df, alias_df, tmp_path):
    nodes, edges, _ = _graph(spark, transcripts_df, alias_df)
    path = str(tmp_path / "graph.jsonld")
    jsonld.save_jsonld_document(nodes, edges, path)

    doc = json.load(open(path))
    assert "@context" in doc and "@graph" in doc
    n_nodes = nodes.count()
    assert len(doc["@graph"]) == n_nodes
    ent = {e["@id"]: e for e in doc["@graph"]}
    # every entity has the reference's required keys (@id/@type, name)
    sample = next(iter(ent.values()))
    assert sample["@id"].startswith("urn:") and sample["@type"]

    # S4: load back through spark.read.json(multiLine) + explode
    loaded = jsonld.load_jsonld_document(spark, path)
    assert loaded.count() == n_nodes
    back = {r["urn"]: r["type"] for r in loaded.collect()}
    for r in nodes.collect():
        assert back[r["urn"]] == r["type"]


def test_jsonld_distributed_sink(spark, transcripts_df, alias_df, tmp_path):
    nodes, edges, _ = _graph(spark, transcripts_df, alias_df)
    out = str(tmp_path / "jl")
    jsonld.write_jsonld_graph(nodes, edges, out)
    lines = spark.read.text(f"{out}/graph_jsonl")
    assert lines.count() == nodes.count()
    # each line parses as a JSON object with @id; ref values are {"@id": ...}
    parsed = [json.loads(r["value"]) for r in lines.limit(50).collect()]
    assert all(p["@id"].startswith("urn:") for p in parsed)
    with_refs = [p for p in parsed if "mentions" in p]
    if with_refs:
        tgt = with_refs[0]["mentions"]
        first = tgt[0] if isinstance(tgt, list) else tgt
        assert "@id" in first


def test_p3_property_normalization(spark, tmp_path):
    """P3 rules transcribed from the reference's normalization semantics
    (models.py:71-119 _normalize_property_value, load_dgraph.py:314-322):
    nested-list flattening, None dropping, urn-string promotion to refs,
    @id dicts kept as refs, non-ref dicts JSON-stringified."""
    doc = {
        "@context": {"@vocab": "urn:kartograph:"},
        "@graph": [
            {
                "@id": "urn:Service:payment-api",
                "@type": "Service",
                "name": "Payment API",
                "description": "handles payments",  # reserved, not a prop
                # plain urn string -> promoted to ref (models.py:114-117)
                "dependsOn": "urn:Service:auth-service",
                # ref dict kept as ref (models.py:105-110)
                "ownedBy": {"@id": "urn:Team:platform"},
                # nested list flattened, None dropped (models.py:88-103)
                "tags": [["a", "b"], None, ["urn:Tag:hot"]],
                # plain list of scalars
                "envs": ["dev", "prod"],
                # non-ref dict -> JSON string literal (load_dgraph.py:318-322)
                "config": {"retries": 3},
                # scalars -> typed literals
                "replicas": 4,
                "cpu": 1.5,
                "active": True,
                # None property dropped entirely
                "legacy": None,
            },
        ],
    }
    p = tmp_path / "p3.jsonld"
    p.write_text(json.dumps(doc))
    ents = jsonld.load_jsonld_document(spark, str(p))
    rows = {
        (r["pred"], r["obj"]): (r["obj_is_ref"], r["dtype"])
        for r in jsonld.jsonld_property_triples(ents).collect()
    }
    assert rows[("dependsOn", "urn:Service:auth-service")] == (True, "uid")
    assert rows[("ownedBy", "urn:Team:platform")] == (True, "uid")
    # flattened list: scalars stay literals, urn member becomes a ref
    assert rows[("tags", "a")] == (False, "string")
    assert rows[("tags", "b")] == (False, "string")
    assert rows[("tags", "urn:Tag:hot")] == (True, "uid")
    assert rows[("envs", "dev")] == (False, "string")
    assert rows[("envs", "prod")] == (False, "string")
    assert rows[("config", '{"retries":3}')] == (False, "json")
    assert rows[("replicas", "4")] == (False, "int")
    assert rows[("cpu", "1.5")] == (False, "float")
    assert rows[("active", "true")] == (False, "bool")
    assert not any(pred == "legacy" for pred, _ in rows)
    # description is extraction-side reserved (models.py:159-160) — it is
    # NOT an open property here; the LOAD conversion path (jsonld_to_triples)
    # emits it separately per load_dgraph.py:292-346
    assert not any(pred == "description" for pred, _ in rows)
    # exactly the expected triple set, nothing extra
    assert len(rows) == 11


FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "fixtures",
    "ref_graph.jsonld",
)


def _fixture_triples(spark):
    vents = jsonld.load_jsonld_entities(spark, FIXTURE)
    valid, errs = jsonld.validate_jsonld_entities(vents)
    return jsonld.jsonld_to_triples(valid), errs


def test_jsonld_conversion_strict_reference_contract(spark):
    """Transcription of convert_to_nquads (load_dgraph.py:272-349) over
    the committed reference-shaped fixture — every branch of the
    reference's value ladder, asserted as the exact triple multiset."""
    out, errs = _fixture_triples(spark)
    # the name-less entity fails required-field validation
    assert errs.count() == 1
    rows = [(r["subj"], r["pred"], r["obj"], r["obj_is_ref"], r["dtype"])
            for r in out.collect()]
    t = set(rows)
    assert len(rows) == len(t) == 29  # no dedup applied, no dupes planted
    s1 = "urn:Service:payment%20api"

    # list-valued @type: one dgraph.type AND one 'type' literal per item
    assert (s1, "dgraph.type", "Service", False, "string") in t
    assert (s1, "dgraph.type", "CriticalService", False, "string") in t
    assert (s1, "type", "Service", False, "string") in t
    assert (s1, "type", "CriticalService", False, "string") in t
    # description: escaped literal (load_dgraph.py:401-407)
    assert (s1, "description",
            'Handles \\"all\\" payments\\nretries enabled', False, "string") in t
    # refs: scalar-position and list-position @id dicts
    assert (s1, "ownedBy", "urn:Team:platform", True, "uid") in t
    assert (s1, "dependsOn", "urn:Service:auth", True, "uid") in t
    assert (s1, "dependsOn", "urn:Database:pg-main", True, "uid") in t
    # typed literals
    assert (s1, "replicas", "4", False, "int") in t
    assert (s1, "cpu", "1.5", False, "float") in t
    assert (s1, "active", "true", False, "bool") in t
    assert (s1, "tags", "hot", False, "string") in t
    assert (s1, "tags", "tier-1", False, "string") in t
    # scalar-position non-ref dict DROPPED (:388-390); list-position one
    # JSON-stringified with quotes escaped, empty dict skipped (:313-322)
    assert not any(p == "config" for _, p, *_ in t)
    assert (s1, "endpoints", '{\\"path\\":\\"/pay\\"}', False, "string") in t
    # plain urn: string stays a LITERAL on the load path (no promotion)
    assert (s1, "repo", "urn:Repo:payments", False, "string") in t
    # null property dropped
    assert not any(p == "legacy" for _, p, *_ in t)

    s2 = "urn:Team:platform"
    # brace-containing description sanitized away (:408-417)
    assert not any(s == s2 and p == "description" for s, p, *_ in t)
    # '@' prefix stripped from property keys (:357-360)
    assert (s2, "contact", "platform@example.com", False, "string") in t
    assert (s2, "mixed", "urn:Service:auth", True, "uid") in t

    s3 = "urn:Service:auth"
    # mixed-type predicate: uid beats scalar (:172-206, :324-346)
    assert not any(s == s3 and p == "mixed" for s, p, *_ in t)
    # literal 'None' string sanitized away (:413-416)
    assert not any(p == "notes" for _, p, *_ in t)
    assert (s3, "description", "Token service", False, "string") in t

    s4 = "urn:Database:pg-main"
    # list-nested list dropped (str form has brackets, :408-417); sibling
    # scalar kept; empty list emits nothing
    assert (s4, "nested", "keep", False, "string") in t
    assert sum(1 for s, p, *_ in t if s == s4 and p == "nested") == 1
    assert not any(p == "empty_list" for _, p, *_ in t)


def test_jsonld_conversion_duplicates_preserved(spark, tmp_path):
    """The reference appends every emission without dedup — duplicate
    list values must produce duplicate triples."""
    doc = {"@context": {}, "@graph": [
        {"@id": "urn:A:1", "@type": "T", "name": "A",
         "tags": ["x", "x"],
         "deps": [{"@id": "urn:B:2"}, {"@id": "urn:B:2"}]},
    ]}
    p = tmp_path / "dup.jsonld"
    p.write_text(json.dumps(doc))
    vents = jsonld.load_jsonld_entities(spark, str(p))
    out = jsonld.jsonld_to_triples(vents).collect()
    tags = [r for r in out if r["pred"] == "tags"]
    deps = [r for r in out if r["pred"] == "deps"]
    assert len(tags) == 2 and len(deps) == 2


def test_jsonld_graph_lines_variant_loader(spark, tmp_path):
    """Distributed JSON-lines loader produces the same conversion as the
    single-document loader for equivalent content."""
    ents = [
        {"@id": "urn:A:1", "@type": ["T", "U"], "name": "A",
         "description": "d", "ref": {"@id": "urn:B:2"}},
        {"@id": "urn:B:2", "@type": "U", "name": "B"},
    ]
    doc = {"@context": {}, "@graph": ents}
    p1 = tmp_path / "doc.jsonld"
    p1.write_text(json.dumps(doc))
    d2 = tmp_path / "lines"
    d2.mkdir()
    (d2 / "part-0.jsonl").write_text("\n".join(json.dumps(e) for e in ents))
    a = jsonld.jsonld_to_triples(jsonld.load_jsonld_entities(spark, str(p1)))
    b = jsonld.jsonld_to_triples(jsonld.load_jsonld_graph_lines(spark, str(d2)))
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb and len(ka) == 10


def test_load_jsonld_document_list_type(spark, tmp_path):
    """S4 struct loader handles list-valued @type (load_dgraph.py:286-289):
    ``types`` carries all items, ``type`` the first."""
    doc = {"@context": {}, "@graph": [
        {"@id": "urn:A:1", "@type": ["Service", "Critical"], "name": "A"},
        {"@id": "urn:B:2", "@type": ["Team"], "name": "B"},
    ]}
    p = tmp_path / "lt.jsonld"
    p.write_text(json.dumps(doc))
    got = {r["urn"]: (r["type"], list(r["types"]))
           for r in jsonld.load_jsonld_document(spark, str(p)).collect()}
    assert got["urn:A:1"] == ("Service", ["Service", "Critical"])
    assert got["urn:B:2"] == ("Team", ["Team"])


def test_nquads_export(spark, transcripts_df, alias_df, tmp_path):
    _, _, kept = _graph(spark, transcripts_df, alias_df)
    out = str(tmp_path / "nq")
    jsonld.write_nquads(kept, out)
    nq = spark.read.text(out)
    assert nq.count() == kept.count()
    # line format: every line ends ' .', uid lines use <...> objects,
    # typed literals carry ^^<xs:...> suffixes (load_dgraph.py:384-417)
    bad = nq.filter(~F.col("value").rlike(r"^<[^>]+> <[^>]+> .+ \.$"))
    assert bad.count() == 0
    typed = nq.filter(F.col("value").contains("^^<xs:int>"))
    assert typed.count() > 0
