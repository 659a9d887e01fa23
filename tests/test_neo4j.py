"""S9 Neo4j Cypher export — statement shapes mirror the legacy loader
(docs/legacy-scripts/load_neo4j.py:146-306)."""

import re

from kartograph_spark import neo4j
from kartograph_spark.graph import build_edges, build_nodes
from kartograph_spark.pipeline import build_triples


def test_cypher_export(spark, transcripts_df, alias_df, tmp_path):
    kept, _ = build_triples(spark, transcripts_df, alias_df)
    nodes, edges = build_nodes(kept), build_edges(kept)
    out = str(tmp_path / "cy")
    neo4j.write_neo4j_cypher(nodes, edges, out)

    cons = open(f"{out}/constraints.cypher").read().strip().split("\n")
    assert any("REQUIRE n.id IS UNIQUE" in c for c in cons)
    assert cons[-1] == "CREATE INDEX IF NOT EXISTS FOR (n:Entity) ON (n.name);"

    nlines = [r["value"] for r in spark.read.text(f"{out}/nodes").collect()]
    assert len(nlines) == nodes.count()
    pat = re.compile(
        r'^CREATE \(:Entity:\w+ \{id: ".+", type: ".+", name: ".*"\}\);$'
    )
    assert all(pat.match(ln) for ln in nlines)

    elines = [r["value"] for r in spark.read.text(f"{out}/edges").collect()]
    assert len(elines) == edges.count()
    epat = re.compile(
        r'^MATCH \(a \{id: ".+"\}\) MATCH \(b \{id: ".+"\}\) CREATE \(a\)-\[:\w+\]->\(b\);$'
    )
    assert all(epat.match(ln) for ln in elines)
    # relationship names sanitized to identifier chars
    assert any("-[:usesTool]->" in ln for ln in elines)


def test_ident_sanitization(spark):
    df = spark.createDataFrame(
        [("urn:A:a", "has-part.x", "urn:B:b", "c", 0)],
        "subj string, pred string, obj string, conv_id string, turn_idx long",
    )
    line = neo4j.cypher_edge_lines(df).collect()[0]["value"]
    assert "-[:has_part_x]->" in line
