"""JSON-LD interchange + N-Quads export (sinks/sources S4/S5/S6).

Reference formats:
- JSON-LD document ``{"@context": {...}, "@graph": [entity...]}`` with
  entities ``{"@id": urn, "@type": type, "name": ..., <props>}`` and refs
  as ``{"@id": urn}`` values
  (/root/reference/extraction/kg_extractor/output/jsonld.py:27-131,
  docs/PROCESS.md:4299-4370).
- N-Quads lines ``<subj> <pred> <obj|"literal"> .``
  (/root/reference/extraction/load_dgraph.py:273-349).

Spark-first shapes:
- ``write_jsonld_graph`` — distributed sink: one JSON line per entity
  (``df.write.json``), with the @context in a sidecar; scales to any
  graph size.  ``to_jsonld_document`` builds the reference's single-file
  document (driver-side collect — for vocabulary-sized graphs only).
- ``load_jsonld_document`` — ``spark.read.json(multiLine)`` + explode of
  the @graph array.
- ``write_nquads`` — ``to_nquads`` rendering + ``df.write.text``
  (replaces the reference's `dgraph live` subprocess).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kartograph_spark.triples import to_nquads

#: default @context (output/jsonld.py:26-41 shape)
DEFAULT_CONTEXT = {
    "@vocab": "urn:kartograph:",
    "name": "urn:kartograph:name",
}


def entity_frame(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """graph_nodes + graph_edges -> one row per entity with its outbound
    refs grouped per predicate: (urn, type, name, refs: map<pred,
    array<urn>>) — the relational shape of a JSON-LD entity."""
    grouped = (
        edges.groupBy(F.col("subj").alias("urn"), "pred")
        .agg(F.sort_array(F.collect_set("obj")).alias("targets"))
        .groupBy("urn")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("pred", "targets")))
            ).alias("refs")
        )
    )
    return nodes.join(grouped, "urn", "left").select(
        F.col("urn"), F.col("type"), F.col("name"), F.col("refs")
    )


def _entity_json(df: DataFrame) -> DataFrame:
    """One JSON-LD entity object per row, as a single string column."""
    refs_json = F.when(
        F.col("refs").isNotNull(),
        F.to_json(
            F.transform_values(
                F.col("refs"),
                lambda _p, targets: F.transform(
                    targets, lambda t: F.struct(t.alias("@id"))
                ),
            )
        ),
    )
    base = F.to_json(
        F.struct(
            F.col("urn").alias("@id"),
            F.col("type").alias("@type"),
            F.col("name").alias("name"),
        )
    )
    # splice the refs map into the entity object (string-level merge keeps
    # everything JVM-side; refs_json is a JSON object or NULL)
    return df.select(
        F.when(
            refs_json.isNotNull(),
            F.concat(
                F.regexp_replace(base, r"\}$", ","),
                F.regexp_replace(refs_json, r"^\{", ""),
            ),
        )
        .otherwise(base)
        .alias("entity_json")
    )


def write_jsonld_graph(
    nodes: DataFrame, edges: DataFrame, out_dir: str, context: dict | None = None
) -> None:
    """Distributed JSON-LD sink: JSON-lines of entity objects + @context
    sidecar (S5 at scale; the reference's single-document format is the
    driver-side ``to_jsonld_document`` below)."""
    ents = _entity_json(entity_frame(nodes, edges))
    ents.select(F.col("entity_json").alias("value")).write.mode(
        "overwrite"
    ).text(os.path.join(out_dir, "graph_jsonl"))
    with open(os.path.join(out_dir, "context.json"), "w") as f:
        json.dump({"@context": context or DEFAULT_CONTEXT}, f, indent=2)


def to_jsonld_document(
    nodes: DataFrame, edges: DataFrame, context: dict | None = None
) -> dict:
    """The reference's single-document shape (collect — small graphs)."""
    graph = []
    for r in entity_frame(nodes, edges).orderBy("urn").collect():
        ent: dict = {"@id": r["urn"], "@type": r["type"]}
        if r["name"] is not None:
            ent["name"] = r["name"]
        if r["refs"]:
            for pred in sorted(r["refs"]):
                targets = [{"@id": t} for t in r["refs"][pred]]
                ent[pred] = targets[0] if len(targets) == 1 else targets
        graph.append(ent)
    return {"@context": context or DEFAULT_CONTEXT, "@graph": graph}


def save_jsonld_document(
    nodes: DataFrame, edges: DataFrame, path: str, context: dict | None = None
) -> str:
    doc = to_jsonld_document(nodes, edges, context)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    return path


def load_jsonld_document(spark: SparkSession, path: str) -> DataFrame:
    """S4: single-document JSON-LD -> exploded entity DataFrame
    (@id/@type/name plus the raw entity struct for property access)."""
    doc = spark.read.option("multiLine", "true").json(path)
    ents = doc.select(F.explode(F.col("`@graph`")).alias("e"))
    return ents.select(
        F.col("e.`@id`").alias("urn"),
        F.col("e.`@type`").alias("type"),
        F.col("e.name").alias("name"),
        F.col("e").alias("entity"),
    )


#: reserved JSON-LD keys that are NOT open properties (models.py:159-160)
RESERVED_KEYS = {"@id", "@type", "name", "description", "@context"}


def _property_rows(base: DataFrame, pred: str, vdt: T.DataType) -> DataFrame:
    """One property value column ``v`` -> normalized triple rows."""
    v = F.col("v")
    urn = F.col("urn")
    lit = F.lit
    if isinstance(vdt, T.StructType) and "@id" in vdt.fieldNames():
        # entity reference dict — keep as ref (models.py:105-110)
        out = base.select(
            urn.alias("subj"), lit(pred).alias("pred"),
            v.getField("@id").alias("obj"),
            lit(True).alias("obj_is_ref"), lit("uid").alias("dtype"),
        )
    elif isinstance(vdt, T.StructType):
        # nested non-ref dict — JSON-stringified at load
        # (load_dgraph.py:318-322); empty objects skipped (:316-317).
        # dtype 'json' marks that the value bypasses the plain-string
        # sanitization (the reference emits these directly)
        obj = F.to_json(v)
        out = base.select(
            urn.alias("subj"), lit(pred).alias("pred"), obj.alias("obj"),
            lit(False).alias("obj_is_ref"), lit("json").alias("dtype"),
        ).filter(F.col("obj") != "{}")
    elif isinstance(vdt, T.StringType):
        # plain 'urn:' strings promoted to refs (models.py:114-117)
        is_ref = v.startswith("urn:")
        out = base.select(
            urn.alias("subj"), lit(pred).alias("pred"), v.alias("obj"),
            is_ref.alias("obj_is_ref"),
            F.when(is_ref, "uid").otherwise("string").alias("dtype"),
        )
    elif isinstance(vdt, T.BooleanType):
        out = base.select(
            urn.alias("subj"), lit(pred).alias("pred"),
            F.when(v, "true").otherwise("false").alias("obj"),
            lit(False).alias("obj_is_ref"), lit("bool").alias("dtype"),
        )
    elif isinstance(vdt, (T.DoubleType, T.FloatType, T.DecimalType)):
        out = base.select(
            urn.alias("subj"), lit(pred).alias("pred"),
            v.cast("string").alias("obj"),
            lit(False).alias("obj_is_ref"), lit("float").alias("dtype"),
        )
    else:  # integral
        out = base.select(
            urn.alias("subj"), lit(pred).alias("pred"),
            v.cast("string").alias("obj"),
            lit(False).alias("obj_is_ref"), lit("int").alias("dtype"),
        )
    return out.filter(F.col("obj").isNotNull())


def jsonld_property_triples(ents: DataFrame) -> DataFrame:
    """P3 property normalization (models.py:71-119 + load_dgraph.py:318-322)
    as a schema-driven relational transform over loaded JSON-LD entities:

    - nested lists are flattened and ``null`` items dropped,
    - ``{"@id": urn}`` dicts and plain ``urn:`` strings become ref triples,
    - other nested dicts are JSON-stringified string literals
      (empty objects skipped),
    - scalars become typed literals; ``null`` properties are dropped.

    The property set comes from the inferred schema (driver-side plan
    construction — no per-row Python), so the transform stays entirely in
    whole-stage codegen regardless of how many entities there are.
    Output: (subj, pred, obj, obj_is_ref, dtype) — the triple contract.
    """
    entity_dt = ents.schema["entity"].dataType
    parts: list[DataFrame] = []
    for f in entity_dt.fields:
        if f.name in RESERVED_KEYS:
            continue
        col = F.col("entity").getField(f.name)
        dt = f.dataType
        # flatten arbitrarily nested lists, dropping nulls at each level
        while isinstance(dt, T.ArrayType) and isinstance(
            dt.elementType, T.ArrayType
        ):
            col = F.flatten(F.filter(col, lambda x: x.isNotNull()))
            dt = T.ArrayType(dt.elementType.elementType)
        if isinstance(dt, T.ArrayType):
            base = ents.select(
                "urn",
                F.explode(F.filter(col, lambda x: x.isNotNull())).alias("v"),
            )
            vdt = dt.elementType
        else:
            base = ents.select("urn", col.alias("v"))
            vdt = dt
        parts.append(_property_rows(base, f.name, vdt))
    if not parts:
        return ents.sparkSession.createDataFrame(
            [], "subj string, pred string, obj string, obj_is_ref boolean, dtype string"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def validate_jsonld_entities(ents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """load_dgraph.py:59-84: every entity must carry @id, @type and name.
    Returns (valid entities, error rows in the validation_errors shape)."""
    ok = (
        F.col("urn").isNotNull()
        & F.col("type").isNotNull()
        & F.col("name").isNotNull()
    )
    bad = ents.filter(~ok).select(
        F.coalesce(F.col("urn"), F.lit("<missing @id>")).alias("entity_id"),
        F.lit("required").alias("field"),
        F.lit(None).cast("string").alias("target_urn"),
        F.lit("entity missing required @id/@type/name").alias("message"),
        F.lit("error").alias("severity"),
    )
    return ents.filter(ok), bad


def jsonld_to_triples(ents: DataFrame) -> DataFrame:
    """load_dgraph.py steps 3-6 (§3.2) over loaded JSON-LD entities:
    dgraph.type triple per entity (:284-290), name literal, normalized
    property triples (P3), predicate cleaning (:357-382), literal
    escaping + sanitization (:384-417), mixed-type uid>scalar resolution
    (:172-206), URN percent-encoding (:351-355).

    Output matches the engine's triple contract
    (subj, pred, obj, obj_is_ref, dtype) — feed to ``to_nquads`` /
    ``write_nquads`` for the reference's N-Quads lines.
    """
    from kartograph_spark import triples as tr

    def lit(x):
        return F.lit(x)

    head = ents.select(
        F.col("urn").alias("subj"),
        lit("dgraph.type").alias("pred"),
        F.col("type").alias("obj"),
        lit(False).alias("obj_is_ref"),
        lit("string").alias("dtype"),
    ).unionByName(
        ents.select(
            F.col("urn").alias("subj"),
            lit("name").alias("pred"),
            F.col("name").alias("obj"),
            lit(False).alias("obj_is_ref"),
            lit("string").alias("dtype"),
        )
    )
    props = jsonld_property_triples(ents)
    allt = head.unionByName(props)

    # predicate cleaning — dgraph.type rows bypass it (:284-290)
    cleaned = allt.withColumn(
        "pred",
        F.when(
            F.col("pred") == "dgraph.type", F.col("pred")
        ).otherwise(tr.clean_predicate_col(F.col("pred"))),
    )
    # plain string literals: escape + sanitize (:384-417); dgraph.type
    # objs are type names (exempt, :284-290); 'json' rows are stringified
    # dicts the reference emits directly with quotes escaped (:318-322)
    is_plain = (
        (~F.col("obj_is_ref"))
        & (F.col("dtype") == "string")
        & (F.col("pred") != "dgraph.type")
    )
    is_json = (~F.col("obj_is_ref")) & (F.col("dtype") == "json")
    cleaned = (
        cleaned.withColumn(
            "obj",
            F.when(is_plain, tr.escape_literal_col(F.col("obj")))
            .when(is_json, F.regexp_replace(F.col("obj"), '"', '\\\\"'))
            .otherwise(F.col("obj")),
        )
        .filter(~is_plain | tr.literal_kept_col(F.col("obj")))
        .withColumn(
            "dtype",
            F.when(F.col("dtype") == "json", F.lit("string")).otherwise(
                F.col("dtype")
            ),
        )
    )
    deduped = cleaned.distinct()
    resolved = tr.apply_uid_resolution(
        deduped, tr.collect_uid_predicates(deduped)
    )
    return tr.encode_final(resolved)


def write_nquads(triples: DataFrame, out_dir: str) -> None:
    """S6: N-Quads text export (load_dgraph.py:273-349 line format)."""
    to_nquads(triples).withColumnRenamed("nquad", "value").write.mode(
        "overwrite"
    ).text(out_dir)
