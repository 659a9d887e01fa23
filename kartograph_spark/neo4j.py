"""S9 — Neo4j (legacy) sink: Cypher script export over nodes/edges frames.

The reference's legacy loader drives a live Neo4j session
(/root/reference/extraction/docs/legacy-scripts/load_neo4j.py:146-306):
uniqueness constraints per entity type + a name index (:151-167), nodes
CREATE-d with an :Entity label plus their type label (:229-244), and one
``MATCH source / MATCH target / CREATE (source)-[:PRED]->(target)``
statement per relationship (:252-300), with relationship names sanitized
to identifier characters (:306).

Spark-first shape: no driver/session — the same statements are RENDERED
as text, one per row, entirely JVM-side (format_string/regexp_replace,
whole-stage codegen) and written with ``df.write.text``; pipe the files
into ``cypher-shell`` to load.  Constraints are driver-side (one line per
distinct type — vocabulary-sized by definition).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ident(c):
    """Cypher identifier sanitization (load_neo4j.py:306): any char
    outside [A-Za-z0-9_] becomes '_'."""
    return F.regexp_replace(c, r"[^A-Za-z0-9_]", "_")


def _quote(c):
    """Escape backslashes, double quotes and newlines for a Cypher string
    literal — a raw newline in an arbitrary input name would otherwise
    split the CREATE statement across two lines of the text sink."""
    c = F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', '\\\\"')
    return F.regexp_replace(F.regexp_replace(c, "\n", r"\\n"), "\r", r"\\r")


def cypher_constraints(nodes: DataFrame) -> list[str]:
    """Per-type uniqueness constraints + the name index (load_neo4j.py:151-167)."""
    types = sorted(
        r["type"] for r in nodes.select("type").distinct().collect() if r["type"]
    )
    stmts = [
        f"CREATE CONSTRAINT IF NOT EXISTS FOR (n:{t}) REQUIRE n.id IS UNIQUE;"
        for t in types
    ]
    stmts.append("CREATE INDEX IF NOT EXISTS FOR (n:Entity) ON (n.name);")
    return stmts


def cypher_node_lines(nodes: DataFrame) -> DataFrame:
    """One CREATE statement per node: :Entity plus the type label
    (load_neo4j.py:229-244)."""
    return nodes.select(
        F.format_string(
            'CREATE (:Entity:%s {id: "%s", type: "%s", name: "%s"});',
            _ident(F.col("type")),
            _quote(F.col("urn")),
            _quote(F.col("type")),
            _quote(F.coalesce(F.col("name"), F.lit(""))),
        ).alias("value")
    )


def cypher_edge_lines(edges: DataFrame) -> DataFrame:
    """One MATCH/MATCH/CREATE statement per relationship
    (load_neo4j.py:252-300)."""
    return edges.select(
        F.format_string(
            'MATCH (a {id: "%s"}) MATCH (b {id: "%s"}) CREATE (a)-[:%s]->(b);',
            _quote(F.col("subj")),
            _quote(F.col("obj")),
            _ident(F.col("pred")),
        ).alias("value")
    )


def write_neo4j_cypher(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Write constraints.cypher (driver) + nodes/ + edges/ text parts."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "constraints.cypher"), "w") as f:
        f.write("\n".join(cypher_constraints(nodes)) + "\n")
    cypher_node_lines(nodes).write.mode("overwrite").text(
        os.path.join(out_dir, "nodes")
    )
    cypher_edge_lines(edges).write.mode("overwrite").text(
        os.path.join(out_dir, "edges")
    )
