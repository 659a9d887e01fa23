"""Pure-pandas oracle for the KG pipeline (SURVEY.md §5 rebuild test plan).

Computes the reference extraction (§7.1 rule composition) single-threaded
on sorted rows: the Spark pipeline's output triple set must match this at
P/R >= 0.95 (target: exact equality).  The regex core is shared
(kartograph_spark.extraction.core) — that part is rule parity by
construction; everything distributed (window ordering, linking joins,
connected components, first-occurrence dedup, mixed-type resolution) is
REIMPLEMENTED here with plain pandas/dict logic, so the e2e comparison
genuinely exercises the Spark implementations.
"""

from __future__ import annotations

import pandas as pd

from kartograph_spark import rules
from kartograph_spark.extraction.core import extract_mentions_block


def _union_find(pairs: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def oracle_mentions(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Stable-ordered mention extraction (rows sorted, then shared core)."""
    df = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    cols = ["conv_id", "turn_idx", "text"]
    if "tool" in df.columns:
        cols.append("tool")
    return extract_mentions_block(df[cols])


def oracle_canonicalize(
    mentions: pd.DataFrame,
    alias_dict: pd.DataFrame,
    confidence_threshold: float = 0.85,
) -> pd.DataFrame:
    """Type normalization + linking pairs + union-find canonicalization."""
    m = mentions.copy()

    # type normalization (A3 + J6)
    counts = (
        m.groupby("entity_type").size().rename("n").reset_index()
    )
    norm = rules.build_type_norm_map(counts)
    if norm:
        new_type = m["entity_type"].map(lambda t: norm.get(t, t))
        changed = new_type != m["entity_type"]
        ident_part = m["urn"].str.replace(r"^urn:[^:]*:", "", regex=True)
        m.loc[changed, "urn"] = "urn:" + new_type[changed] + ":" + ident_part[changed]
        m["entity_type"] = new_type
        # subject anchors: same type-segment rewrite
        st = m["subj_urn"].str.extract(r"^urn:([^:]+):")[0]
        sc = st.map(lambda t: norm.get(t) if isinstance(t, str) else None)
        has = sc.notna()
        sid = m["subj_urn"].str.replace(r"^urn:[^:]*:", "", regex=True)
        m.loc[has, "subj_urn"] = "urn:" + sc[has] + ":" + sid[has]

    # alias dictionary: collision rule = min canonical_urn per alias_norm
    ad = (
        alias_dict.sort_values(["alias_norm", "canonical_urn"], kind="mergesort")
        .drop_duplicates("alias_norm", keep="first")
        .set_index("alias_norm")
    )

    pairs: list[tuple[str, str, float]] = []
    nonurn = m[m["kind"] != "urn"]
    keys = rules.alias_norm(nonurn["name"])
    hit = keys.map(ad["canonical_urn"])
    for u, c in zip(nonurn["urn"], hit):
        if isinstance(c, str) and u != c:
            pairs.append((u, c, 1.0))

    # same-blocking-key heuristic (star against min urn per group)
    keyed = pd.DataFrame(
        {
            "bkey": rules.alias_norm(m["name"]),
            "entity_type": m["entity_type"],
            "urn": m["urn"],
        }
    ).drop_duplicates()
    for (_, _), grp in keyed.groupby(["bkey", "entity_type"]):
        urns = sorted(grp["urn"].unique())
        for u in urns[1:]:
            pairs.append((u, urns[0], 0.9))

    gated = [(a, b) for a, b, c in pairs if c >= confidence_threshold]
    comp = _union_find(gated)

    # representative: dictionary canonicals win, then min urn
    dict_canon = set(alias_dict["canonical_urn"])
    groups: dict[str, list[str]] = {}
    for member, root in comp.items():
        groups.setdefault(root, []).append(member)
    rep_of: dict[str, str] = {}
    for root, members in groups.items():
        rep = min(members, key=lambda u: (0 if u in dict_canon else 1, u))
        for mem in members:
            rep_of[mem] = rep

    m["urn"] = m["urn"].map(lambda u: rep_of.get(u, u))
    m["subj_urn"] = m["subj_urn"].map(
        lambda u: rep_of.get(u, u) if isinstance(u, str) else u
    )

    # dictionary metadata overwrite for canonical entities
    meta = (
        alias_dict.groupby("canonical_urn")
        .agg(_dt=("entity_type", "min"), _dn=("canonical_name", "min"))
    )
    mt = m["urn"].map(meta["_dt"])
    mn = m["urn"].map(meta["_dn"])
    m["entity_type"] = mt.where(mt.notna(), m["entity_type"])
    m["name"] = mn.where(mn.notna(), m["name"])
    return m


def _scalar_triple_rows(
    agg: pd.DataFrame, pred: str, obj: pd.Series, dtype: str
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "subj": "urn:Conversation:" + agg["conv_id"],
            "pred": pred,
            "obj": obj,
            "obj_is_ref": False,
            "dtype": dtype,
            "conv_id": agg["conv_id"],
            "turn_idx": agg["first_turn"].astype("int64"),
            "kind_rank": -1,
            "match_idx": 0,
        }
    )


def oracle_triples(
    transcripts: pd.DataFrame,
    alias_dict: pd.DataFrame,
    confidence_threshold: float = 0.85,
) -> pd.DataFrame:
    """Full oracle: returns (subj, pred, obj, obj_is_ref, dtype, conv_id,
    turn_idx) — the expected_triples fixture (FIXTURES F3)."""
    mentions = oracle_canonicalize(
        oracle_mentions(transcripts), alias_dict, confidence_threshold
    )

    parts: list[pd.DataFrame] = []
    # edges: verb mentions hang off their attributed entity anchor,
    # everything else off the Conversation subject.  MEDIUM-confidence
    # rows (PROCESS.md:2149-2156) get a plain `mentions` edge from the
    # Conversation instead of the flagged relationship — the relationship
    # itself lives in oracle_review_flags.
    med = mentions["confidence"].eq("MEDIUM")
    edge_subj = mentions["subj_urn"].fillna(
        "urn:Conversation:" + mentions["conv_id"]
    ).mask(med, "urn:Conversation:" + mentions["conv_id"])
    edge_pred = rules.clean_predicate(mentions["pred"]).mask(med, "mentions")
    parts.append(
        pd.DataFrame(
            {
                "subj": edge_subj,
                "pred": edge_pred,
                "obj": mentions["urn"],
                "obj_is_ref": True,
                "dtype": "uid",
                "conv_id": mentions["conv_id"],
                "turn_idx": mentions["turn_idx"],
                "kind_rank": mentions["kind_rank"],
                "match_idx": mentions["match_idx"],
            }
        )
    )
    # node dgraph.type (verbatim predicate, load_dgraph.py:284-290)
    parts.append(
        pd.DataFrame(
            {
                "subj": mentions["urn"],
                "pred": rules.DGRAPH_TYPE_PRED,
                "obj": mentions["entity_type"],
                "obj_is_ref": False,
                "dtype": "string",
                "conv_id": mentions["conv_id"],
                "turn_idx": mentions["turn_idx"],
                "kind_rank": mentions["kind_rank"],
                "match_idx": mentions["match_idx"],
            }
        )
    )
    # node name literals (escape + sanitize)
    esc = rules.escape_literal(mentions["name"])
    keep = ~rules.literal_is_dropped(esc)
    nm = mentions[keep]
    parts.append(
        pd.DataFrame(
            {
                "subj": nm["urn"],
                "pred": "name",
                "obj": esc[keep],
                "obj_is_ref": False,
                "dtype": "string",
                "conv_id": nm["conv_id"],
                "turn_idx": nm["turn_idx"],
                "kind_rank": nm["kind_rank"],
                "match_idx": nm["match_idx"],
            }
        )
    )

    # conversation scalar triples
    t = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    agg = (
        t.groupby("conv_id")
        .agg(
            turn_count=("turn_idx", "size"),
            first_turn=("turn_idx", "min"),
            min_ts=("ts", "min"),
            max_ts=("ts", "max"),
            has_tool=("tool", lambda s: bool(s.notna().any())),
        )
        .reset_index()
    )
    parts.append(_scalar_triple_rows(agg, "dgraph.type", "Conversation", "string"))
    parts.append(_scalar_triple_rows(agg, "name", agg["conv_id"], "string"))
    parts.append(
        _scalar_triple_rows(
            agg, "turn_count", agg["turn_count"].astype(str), "int"
        )
    )
    parts.append(
        _scalar_triple_rows(
            agg,
            "started_at",
            agg["min_ts"].dt.strftime("%Y-%m-%dT%H:%M:%S"),
            "string",
        )
    )
    parts.append(
        _scalar_triple_rows(
            agg,
            "has_tool_calls",
            agg["has_tool"].map({True: "true", False: "false"}),
            "bool",
        )
    )
    multi = agg[agg["turn_count"] > 1].reset_index(drop=True)
    gap_secs = (
        (multi["max_ts"] - multi["min_ts"]).dt.total_seconds()
        / (multi["turn_count"] - 1)
    ).round(2)
    parts.append(
        _scalar_triple_rows(multi, "avg_gap_secs", gap_secs.astype(str), "float")
    )

    allt = pd.concat(parts, ignore_index=True)

    # first-occurrence dedup (A1/A2 + W1)
    allt = allt.sort_values(
        ["conv_id", "turn_idx", "kind_rank", "match_idx"], kind="mergesort"
    ).drop_duplicates(subset=["subj", "pred", "obj", "obj_is_ref", "dtype"])

    # mixed-type resolution: uid beats scalar (load_dgraph.py:172-206)
    uid_preds = set(allt.loc[allt["obj_is_ref"], "pred"])
    allt = allt[allt["obj_is_ref"] | ~allt["pred"].isin(uid_preds)]

    # final URN encoding
    allt = allt.copy()
    allt["subj"] = rules.encode_urn(allt["subj"])
    ref = allt["obj_is_ref"]
    allt.loc[ref, "obj"] = rules.encode_urn(allt.loc[ref, "obj"])

    return allt[
        ["subj", "pred", "obj", "obj_is_ref", "dtype", "conv_id", "turn_idx"]
    ].reset_index(drop=True)


def oracle_review_flags(
    transcripts: pd.DataFrame,
    alias_dict: pd.DataFrame,
    confidence_threshold: float = 0.85,
) -> pd.DataFrame:
    """Pandas twin of validation.review_flags over canonicalized mentions:
    the withheld MEDIUM-tier relationships (PROCESS.md:2149-2156)."""
    m = oracle_canonicalize(
        oracle_mentions(transcripts), alias_dict, confidence_threshold
    )
    m = m[m["confidence"].eq("MEDIUM")]
    return pd.DataFrame(
        {
            "conv_id": m["conv_id"],
            "turn_idx": m["turn_idx"].astype("int64"),
            "kind": m["kind"],
            "subj": m["subj_urn"].fillna("urn:Conversation:" + m["conv_id"]),
            "pred": rules.clean_predicate(m["pred"]),
            "obj": m["urn"],
            "confidence": "MEDIUM",
            "message": "indirect mention: relationship flagged for review",
        }
    ).reset_index(drop=True)


def oracle_low_log(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Pandas twin of the LOW-tier manual-review log (shared core)."""
    from kartograph_spark.extraction.core import extract_low_confidence

    df = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    return extract_low_confidence(
        df[["conv_id", "turn_idx", "text"]]
    ).reset_index(drop=True)


def triple_prf(
    actual: pd.DataFrame, expected: pd.DataFrame
) -> dict[str, float]:
    """Set precision/recall/F1 on (subj, pred, obj)."""
    a = set(map(tuple, actual[["subj", "pred", "obj"]].itertuples(index=False)))
    e = set(map(tuple, expected[["subj", "pred", "obj"]].itertuples(index=False)))
    tp = len(a & e)
    p = tp / len(a) if a else 1.0
    r = tp / len(e) if e else 1.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "actual": len(a),
        "expected": len(e),
        "tp": tp,
    }
