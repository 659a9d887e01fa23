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
    refs grouped per predicate: (urn, type, name, description, refs:
    map<pred, array<urn>>) — the relational shape of a JSON-LD entity."""
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
    desc = (
        F.col("description")
        if "description" in nodes.columns
        else F.lit(None).cast("string").alias("description")
    )
    return nodes.join(grouped, "urn", "left").select(
        F.col("urn"), F.col("type"), F.col("name"), desc, F.col("refs")
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
            F.col("description").alias("description"),
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
        if r["description"] is not None:
            ent["description"] = r["description"]
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


def _types_from(c, dt: T.DataType):
    """``@type`` -> array<string>, handling every shape the scalar/list
    contract can reach after Spark JSON schema merge: a real array column,
    a scalar string, or the raw ``["A","B"]`` token Spark falls back to
    when entities disagree on the shape (load_dgraph.py:284-289 accepts
    both scalar and list)."""
    if isinstance(dt, T.ArrayType):
        return F.filter(c.cast("array<string>"), lambda x: x.isNotNull())
    c = c.cast("string")
    return (
        F.when(c.isNull(), F.lit(None).cast("array<string>"))
        .when(F.ltrim(c).startswith("["), F.from_json(c, "array<string>"))
        .otherwise(F.array(c))
    )


def load_jsonld_document(spark: SparkSession, path: str) -> DataFrame:
    """S4: single-document JSON-LD -> exploded entity DataFrame
    (@id/@type/name plus the raw entity struct for property access).
    ``types`` carries the full (possibly list-valued) ``@type``; ``type``
    is its first element for the scalar-typed node model."""
    doc = spark.read.option("multiLine", "true").json(path)
    ents = doc.select(F.explode(F.col("`@graph`")).alias("e"))
    fields = ents.schema["e"].dataType.fieldNames()

    def fcol(name: str):
        return (
            F.col(f"e.`{name}`") if name in fields else F.lit(None).cast("string")
        )

    tdt = (
        ents.schema["e"].dataType["@type"].dataType
        if "@type" in fields
        else T.StringType()
    )
    types = _types_from(fcol("@type"), tdt)
    return ents.select(
        fcol("@id").alias("urn"),
        F.element_at(types, 1).alias("type"),
        types.alias("types"),
        fcol("name").cast("string").alias("name"),
        F.col("e").alias("entity"),
    )


def load_jsonld_entities(spark: SparkSession, path: str) -> DataFrame:
    """S4 (conversion path): JSON-LD document -> one VARIANT row per
    entity: ``(urn, type, types, name, ent: variant)``.

    VARIANT keeps each property's *runtime* type per row — exactly the
    ``isinstance`` dispatch the reference's converter runs per value
    (load_dgraph.py:297-346) — where a struct schema merge would corrupt
    mixed-type predicates (a dict in one entity + a string in another
    degrade to raw-JSON text under ``spark.read.json``).  The parse is
    native JVM (no Python), and the same frame shape comes out of
    ``load_jsonld_graph_lines`` for the distributed JSON-lines layout.
    """
    raw = spark.read.text(path, wholetext=True)
    ents = raw.select(
        F.explode(
            F.variant_get(F.parse_json("value"), '$["@graph"]', "array<variant>")
        ).alias("ent")
    )
    return _variant_entity_cols(ents)


def load_jsonld_graph_lines(spark: SparkSession, path: str) -> DataFrame:
    """Distributed variant loader for the JSON-lines graph layout written
    by ``write_jsonld_graph`` (one entity object per line): same output
    contract as ``load_jsonld_entities`` but scales to any graph size —
    the text scan parallelizes per file split and ``parse_json`` runs
    per partition."""
    raw = spark.read.text(path)
    ents = raw.filter(F.length(F.trim("value")) > 0).select(
        F.parse_json("value").alias("ent")
    )
    return _variant_entity_cols(ents)


def _variant_entity_cols(ents: DataFrame) -> DataFrame:
    types = F.coalesce(
        F.try_variant_get("ent", '$["@type"]', "array<string>"),
        F.array_compact(F.array(F.try_variant_get("ent", '$["@type"]', "string"))),
    )
    # array() of a NULL scalar is [NULL]; compact to NULL-equivalent empty,
    # then normalize empty -> NULL so "no @type" validates as missing
    types = F.when(F.size(types) > 0, types)
    return ents.select(
        F.try_variant_get("ent", '$["@id"]', "string").alias("urn"),
        F.element_at(types, 1).alias("type"),
        types.alias("types"),
        F.try_variant_get("ent", '$["name"]', "string").alias("name"),
        F.col("ent"),
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


def validate_jsonld_entities(
    ents: DataFrame,
    required_fields: tuple[str, ...] = ("@id", "@type", "name"),
    allow_missing_name: bool = False,
    strict_urn_format: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """EntityValidator transcription (entity_validator.py:89-276; defaults
    config.py:138-156): required fields, URN format, type-name format —
    each violated rule emits its own error row (an entity can carry
    several), with the reference's exact messages and severities.

    - required fields: missing -> error "Missing required field: {f}";
      missing ``name`` under ``allow_missing_name`` -> WARNING
      "Missing optional field: name" (entity_validator.py:118-152).
    - URN format (only when @id present): strict -> both the
      "must start with 'urn:'" and the "at least 3 parts" checks can fire
      (:154-202); non-strict -> a warning when it has a colon but no
      ``urn:`` prefix.
    - type name (per @type item): non-empty, leading capital,
      alphanumeric-or-underscore (:205-277).

    Returns (valid, errors): valid = entities with ZERO error-severity
    rows — warning-only entities pass through, mirroring the reference
    default ``fail_on_validation_errors=False`` gate.
    """
    eid = F.coalesce(F.col("urn"), F.lit("unknown"))
    lit = F.lit

    def err(cond, field: str, message: str, severity: str = "error"):
        return F.when(
            cond,
            F.struct(
                eid.alias("entity_id"),
                lit(field).alias("field"),
                lit(None).cast("string").alias("target_urn"),
                lit(message).alias("message"),
                lit(severity).alias("severity"),
            ),
        )

    def present(f: str):
        if f == "@id":
            return F.col("urn").isNotNull()
        if f == "@type":
            return F.col("types").isNotNull()
        if f == "name":
            return F.col("name").isNotNull()
        return F.expr(f"""try_variant_get(ent, '$["{f}"]')""").isNotNull()

    checks = []
    for f in required_fields:
        if f == "name" and allow_missing_name:
            checks.append(
                err(~present(f), f, f"Missing optional field: {f}", "warning")
            )
        else:
            checks.append(err(~present(f), f, f"Missing required field: {f}"))

    urn_present = F.col("urn").isNotNull()
    if strict_urn_format:
        checks.append(
            err(
                urn_present & ~F.col("urn").startswith("urn:"),
                "@id",
                "URN must start with 'urn:'",
            )
        )
        checks.append(
            err(
                urn_present & (F.size(F.split("urn", ":")) < 3),
                "@id",
                "URN must have format 'urn:type:identifier' (at least 3 parts)",
            )
        )
    else:
        checks.append(
            err(
                urn_present
                & ~F.col("urn").startswith("urn:")
                & F.col("urn").contains(":"),
                "@id",
                "URN should preferably start with 'urn:'",
                "warning",
            )
        )

    types_present = F.col("types").isNotNull()
    any_t = lambda cond: types_present & F.exists("types", cond)  # noqa: E731
    checks.append(
        err(any_t(lambda t: t == ""), "@type", "Type name cannot be empty")
    )
    checks.append(
        err(
            any_t(lambda t: (t != "") & ~t.rlike("^[A-Z]")),
            "@type",
            "Type name must start with capital letter",
        )
    )
    checks.append(
        err(
            any_t(
                lambda t: (t != "")
                & (
                    ~t.rlike("^[A-Za-z0-9_]+$")
                    | (F.regexp_replace(t, "_", "") == "")
                )
            ),
            "@type",
            "Type name must be alphanumeric (or contain underscores)",
        )
    )

    staged = ents.withColumn("_errs", F.array_compact(F.array(*checks)))
    bad = staged.select(F.explode("_errs").alias("e")).select("e.*")
    has_error = F.exists("_errs", lambda e: e["severity"] == lit("error"))
    valid = staged.filter(~has_error).drop("_errs")
    return valid, bad


def extract_urn_refs(ents: DataFrame) -> DataFrame:
    """(urn, ref) pairs: every ``urn:``-prefixed string value anywhere in
    each entity's JSON (reference dicts, list items, plain strings —
    extract_urn_references, entity_validator.py:10-39), self-references
    discarded.  JVM-side: regexp over the canonical JSON text.  (A key
    named ``urn:...`` would also match, which the reference's value-only
    walk ignores — no reference fixture or output ever has such keys.)"""
    return (
        ents.filter(F.col("urn").isNotNull())
        .select(
            "urn",
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.expr("to_json(ent)"), F.lit('"(urn:[^"]*)"'), F.lit(1)
                    )
                )
            ).alias("ref"),
        )
        .filter(F.col("ref") != F.col("urn"))
    )


def validate_jsonld_graph(
    ents: DataFrame,
    detect_orphans: bool = True,
    detect_broken_refs: bool = True,
) -> DataFrame:
    """Graph-level validation (validate_graph,
    entity_validator.py:259-369): orphaned entities (no outgoing
    references that resolve inside the graph -> warning) and broken
    references (referenced URNs absent from the graph -> one error per
    missing target), with the reference's exact messages/severities.

    Plan: one refs explode + one keyed join against the entity-id set —
    at corpus scale both sides are entity-table-sized, so this is a
    single vocabulary shuffle, never a corpus scan per entity."""
    refs = extract_urn_refs(ents)
    ids = ents.filter(F.col("urn").isNotNull()).select(
        F.col("urn").alias("ref")
    ).distinct()
    marked = refs.join(
        ids.withColumn("_exists", F.lit(1)), "ref", "left"
    )
    lit = F.lit
    parts = []
    if detect_broken_refs:
        parts.append(
            marked.filter(F.col("_exists").isNull()).select(
                F.col("urn").alias("entity_id"),
                lit("reference").alias("field"),
                F.col("ref").alias("target_urn"),
                F.concat(
                    lit("References non-existent entity: "), F.col("ref")
                ).alias("message"),
                lit("error").alias("severity"),
            )
        )
    if detect_orphans:
        linked = marked.filter(F.col("_exists").isNotNull()).select("urn").distinct()
        parts.append(
            ents.filter(F.col("urn").isNotNull())
            .join(linked, "urn", "left_anti")
            .select(
                F.col("urn").alias("entity_id"),
                lit("relationships").alias("field"),
                lit(None).cast("string").alias("target_urn"),
                lit(
                    "Entity has no relationships to other entities (orphaned)"
                ).alias("message"),
                lit("warning").alias("severity"),
            )
        )
    if not parts:
        return ents.sparkSession.createDataFrame(
            [],
            "entity_id string, field string, target_urn string, "
            "message string, severity string",
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def jsonld_to_triples(vents: DataFrame) -> DataFrame:
    """The reference's JSON-LD -> N-Quads conversion, transcribed from
    ``convert_to_nquads`` (load_dgraph.py:272-349) over the VARIANT
    entity frame of ``load_jsonld_entities`` / ``load_jsonld_graph_lines``:

    - one ``dgraph.type`` triple per ``@type`` item, scalar or list,
      emitted verbatim (no cleaning/escaping, :284-290);
    - every other key (including ``@type`` -> ``type``, ``name`` and
      ``description``) walks the items loop (:292-346):
      ``{"@id": ...}`` values become uid triples; list-nested non-ref
      dicts are JSON-stringified with quotes escaped, empty dicts
      skipped (:313-322); scalar-position dicts are dropped
      (``_format_literal`` returns None for dicts, :388-390); scalars
      become typed literals with string escaping + the braces/'None'
      sanitization (:384-417) — which also drops list-nested lists
      (their string form contains brackets); plain ``urn:`` strings stay
      literals (ref promotion is extraction-side normalization,
      models.py:114-117, NOT part of this conversion);
    - predicate cleaning (:357-382), uid>scalar mixed-type resolution
      (:172-206 observed-type semantics), URN percent-encoding
      (:351-355).  No dedup: the reference appends every emission.

    Per-row runtime-type dispatch via ``schema_of_variant`` — the exact
    ``isinstance`` ladder of the reference, fully JVM-side.  Output is
    the engine triple contract (subj, pred, obj, obj_is_ref, dtype);
    feed ``to_nquads`` / ``write_nquads`` for the N-Quads lines.
    """
    from kartograph_spark import triples as tr

    lit = F.lit

    # dgraph.type head rows: one per @type item, obj verbatim (:284-290)
    head = vents.select(
        F.col("urn").alias("subj"),
        lit("dgraph.type").alias("pred"),
        F.explode("types").alias("obj"),
        lit(False).alias("obj_is_ref"),
        lit("string").alias("dtype"),
    )

    # items loop (:292-346): every (key != @id, value) pair, arrays
    # exploded to items with in_array marking the list-vs-scalar position
    kv = vents.select(
        F.col("urn").alias("subj"),
        F.explode(F.try_variant_get("ent", "$", "map<string,variant>")).alias(
            "pred", "v"
        ),
    ).filter(F.col("pred") != "@id")
    vt = F.schema_of_variant("v")
    is_arr = vt.startswith("ARRAY")
    items = kv.select(
        "subj",
        "pred",
        is_arr.alias("in_array"),
        F.explode(
            F.when(is_arr, F.try_variant_get("v", "$", "array<variant>")).otherwise(
                F.array(F.col("v"))
            )
        ).alias("it"),
    )
    it_t = F.schema_of_variant("it")
    ref = F.try_variant_get("it", '$["@id"]', "string")
    it_s = F.col("it").cast("string")
    # runtime-type ladder == the reference's isinstance dispatch
    rows = items.select(
        "subj",
        "pred",
        F.when(ref.isNotNull(), ref)
        .when(
            it_t.startswith("OBJECT"),
            # list-nested dict -> JSON string (skip empty); scalar dict ->
            # NULL (dropped below, :316-322 vs :388-390 asymmetry)
            F.when(F.col("in_array") & (it_s != "{}"), it_s),
        )
        .when(it_t == "VOID", F.lit(None).cast("string"))
        .when(it_t.startswith("ARRAY"), F.lit(None).cast("string"))
        .otherwise(it_s)
        .alias("obj"),
        ref.isNotNull().alias("obj_is_ref"),
        F.when(ref.isNotNull(), "uid")
        .when(it_t.startswith("OBJECT"), "json")
        .when(it_t == "BOOLEAN", "bool")
        .when(
            it_t.startswith("DECIMAL")
            | (it_t == "DOUBLE")
            | (it_t == "FLOAT"),
            "float",
        )
        .when(it_t == "STRING", "string")
        .otherwise("int")  # BIGINT / INT / SMALLINT / TINYINT
        .alias("dtype"),
    ).filter(F.col("obj").isNotNull())

    allt = head.unionByName(rows)

    # predicate cleaning — dgraph.type head rows bypass it (:284-290)
    cleaned = allt.withColumn(
        "pred",
        F.when(F.col("pred") == "dgraph.type", F.col("pred")).otherwise(
            tr.clean_predicate_col(F.col("pred"))
        ),
    )
    # plain string literals: escape + sanitize (:401-417); dgraph.type
    # objs are emitted verbatim (:284-290); 'json' rows are stringified
    # dicts the reference emits with only quotes escaped (:318-322)
    is_plain = (
        (~F.col("obj_is_ref"))
        & (F.col("dtype") == "string")
        & (F.col("pred") != "dgraph.type")
    )
    is_json = F.col("dtype") == "json"
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
    resolved = tr.apply_uid_resolution(
        cleaned, tr.collect_uid_predicates(cleaned)
    )
    return tr.encode_final(resolved)


def write_nquads(triples: DataFrame, out_dir: str) -> None:
    """S6: N-Quads text export (load_dgraph.py:273-349 line format)."""
    to_nquads(triples).withColumnRenamed("nquad", "value").write.mode(
        "overwrite"
    ).text(out_dir)
