"""Vectorized per-batch mention extraction — pandas core.

This is the deterministic replacement for the reference's LLM extraction
step (E2, /root/reference/extraction/kg_extractor/agents/extraction.py:47-121):
the rule classes it applies are the reference's own *deterministic* rules —
the E1 URN-mention regex (EntityExtractor.ts:18-49), the E4 pattern classes
(entity_extraction.yaml:77-81) and the HIGH-confidence free-text verb
patterns (docs/PROCESS.md:2123-2199).

Everything is ``pd.Series.str.extractall`` — one regex pass per pattern
class per Arrow batch, no per-row Python.  The same function body runs
inside the Spark ``mapInPandas`` UDF and inside the pure-pandas oracle.

Output row = one candidate mention:
  (conv_id, turn_idx, kind, match_idx, kind_rank, urn, entity_type,
   ident, name, pred, surface)

Per-turn dedupe (EntityExtractor.ts:43-48 — unique by urn keeping first
occurrence) is applied here with the deterministic order
``(kind_rank, match_idx)``: E1 matches first, then pattern classes, then
verb patterns, each in within-class match order.
"""

from __future__ import annotations

import pandas as pd

from kartograph_spark import rules

#: Arrow/Spark schema of the mention rows (keep in sync with mentions.py)
MENTION_COLUMNS = [
    "conv_id",
    "turn_idx",
    "kind",
    "kind_rank",
    "match_idx",
    "urn",
    "entity_type",
    "ident",
    "name",
    "pred",
    "surface",
]


def _empty() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series(dtype="object"),
            "turn_idx": pd.Series(dtype="int64"),
            "kind": pd.Series(dtype="object"),
            "kind_rank": pd.Series(dtype="int64"),
            "match_idx": pd.Series(dtype="int64"),
            "urn": pd.Series(dtype="object"),
            "entity_type": pd.Series(dtype="object"),
            "ident": pd.Series(dtype="object"),
            "name": pd.Series(dtype="object"),
            "pred": pd.Series(dtype="object"),
            "surface": pd.Series(dtype="object"),
        }
    )


def _from_extractall(
    base: pd.DataFrame, matches: pd.DataFrame, kind: str
) -> pd.DataFrame:
    """Join extractall output (MultiIndex row/match) back to (conv_id, turn_idx)."""
    if matches.empty:
        return _empty()
    out = matches.reset_index()
    # extractall names the positional index level 'match'; the row level
    # keeps the original index name (None -> 'level_0').
    row_col = out.columns[0]
    out = out.rename(columns={row_col: "_row", "match": "match_idx"})
    out["conv_id"] = base["conv_id"].to_numpy()[out["_row"].to_numpy()]
    out["turn_idx"] = base["turn_idx"].to_numpy()[out["_row"].to_numpy()]
    out["kind"] = kind
    out["kind_rank"] = rules.KIND_RANK[kind]
    return out


def extract_mentions_block(pdf: pd.DataFrame) -> pd.DataFrame:
    """Extract all candidate mentions from a batch of turns.

    ``pdf`` columns: conv_id (str), turn_idx (int), text (str).
    Returns MENTION_COLUMNS, already per-turn-deduped keep-first.
    """
    if len(pdf) == 0:
        return _empty()
    base = pdf.reset_index(drop=True)
    text = base["text"].fillna("")
    parts: list[pd.DataFrame] = []

    # E1 — URN mentions (EntityExtractor.ts:18-41)
    m = text.str.extractall(rules.URN_MENTION_RE)
    if not m.empty:
        m.columns = ["entity_type", "ident"]
        d = _from_extractall(base, m, "urn")
        d["urn"] = "urn:" + d["entity_type"] + ":" + d["ident"]
        d["name"] = rules.display_name(d["ident"])
        d["pred"] = rules.MENTIONS_PRED
        d["surface"] = "<" + d["urn"] + ">"
        parts.append(d)

    # E4 — pattern classes (entity_extraction.yaml:77-81)
    for kind, pat, etype, pred in (
        ("email", f"({rules.EMAIL_RE})", "EmailAddress", rules.MENTIONS_PRED),
        ("url", f"({rules.URL_RE})", "CodeRepository", rules.MENTIONS_PRED),
        ("slack", rules.SLACK_RE, "SlackChannel", rules.MENTIONS_PRED),
    ):
        m = text.str.extractall(pat)
        if m.empty:
            continue
        m.columns = ["surface"]
        d = _from_extractall(base, m, kind)
        if kind == "email":
            d["ident"] = d["surface"].str.lower()
            d["name"] = d["surface"]
        elif kind == "url":
            d["ident"] = d["surface"]
            d["name"] = d["surface"]
        else:  # slack: capture group excludes '#'
            d["ident"] = d["surface"]
            d["surface"] = "#" + d["surface"]
            d["name"] = d["ident"]
        d["entity_type"] = etype
        d["urn"] = "urn:" + etype + ":" + d["ident"]
        d["pred"] = pred
        parts.append(d)

    # Free-text verb patterns (PROCESS.md:2123-2199)
    for kind, pat, pred, etype in rules.VERB_PATTERNS:
        m = text.str.extractall(pat)
        if m.empty:
            continue
        m.columns = ["surface"]
        d = _from_extractall(base, m, kind)
        d["name"] = d["surface"]
        d["ident"] = rules.slugify(d["surface"])
        d["entity_type"] = etype
        d["urn"] = "urn:" + etype + ":" + d["ident"]
        d["pred"] = pred
        parts.append(d)

    if not parts:
        return _empty()
    out = pd.concat(parts, ignore_index=True)

    # Per-turn dedupe keep first occurrence by (kind_rank, match_idx)
    # (EntityExtractor.ts:43-48).
    out = out.sort_values(
        ["conv_id", "turn_idx", "kind_rank", "match_idx"],
        kind="mergesort",
    )
    out = out.drop_duplicates(subset=["conv_id", "turn_idx", "urn"], keep="first")
    out["turn_idx"] = out["turn_idx"].astype("int64")
    out["match_idx"] = out["match_idx"].astype("int64")
    out["kind_rank"] = out["kind_rank"].astype("int64")
    return out[MENTION_COLUMNS].reset_index(drop=True)
