"""JSON-LD round-trip (S4/S5) + N-Quads export (S6) over a real pipeline
run on the seeded corpus."""

from __future__ import annotations

import json

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
    assert not any(pred == "description" for pred, _ in rows)
    # exactly the expected triple set, nothing extra
    assert len(rows) == 11


def test_jsonld_to_triples_full_conversion(spark, tmp_path):
    """load_dgraph steps 2-6 over an arbitrary loaded document: required-
    field validation, type/name head triples, P3 props, predicate
    cleaning, sanitize/escape, uid>scalar resolution, URN encoding."""
    doc = {
        "@context": {},
        "@graph": [
            {
                "@id": "urn:Service:pay api",  # space -> %20 on encode
                "@type": "Service",
                "name": "Pay API",
                "@owner": "urn:Team:platform",  # '@' stripped, ref promoted
                "mixed": "urn:Team:platform",   # uid observation...
                "config": {"a": 1},
            },
            {
                "@id": "urn:Team:platform",
                "@type": "Team",
                "name": 'He said "hi"',  # quote escaping
                "mixed": "plain string",  # ...so this scalar is dropped
                "bad": "has {braces}",    # sanitized away
            },
            {"@id": "urn:X:incomplete", "@type": None, "name": None},
        ],
    }
    p = tmp_path / "conv.jsonld"
    p.write_text(json.dumps(doc))
    ents = jsonld.load_jsonld_document(spark, str(p))
    valid, errs = jsonld.validate_jsonld_entities(ents)
    assert errs.count() == 1 and valid.count() == 2

    t = {(r["subj"], r["pred"], r["obj"]): (r["obj_is_ref"], r["dtype"])
         for r in jsonld.jsonld_to_triples(valid).collect()}
    assert t[("urn:Service:pay%20api", "dgraph.type", "Service")] == (False, "string")
    assert t[("urn:Service:pay%20api", "owner", "urn:Team:platform")] == (True, "uid")
    assert t[("urn:Service:pay%20api", "mixed", "urn:Team:platform")] == (True, "uid")
    assert t[("urn:Service:pay%20api", "config", '{\\"a\\":1}')] == (False, "string")
    assert t[("urn:Team:platform", "name", 'He said \\"hi\\"')] == (False, "string")
    # scalar on a uid predicate dropped; brace literal sanitized away
    assert not any(k[1] == "mixed" and not v[0] for k, v in t.items())
    assert not any(k[1] == "bad" for k in t)


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
