"""Metrics + validation report sinks in every reference format (S11/S12).

Reference formats mirrored:
- metrics JSON/CSV/Markdown:
  /root/reference/extraction/kg_extractor/output/metrics.py:113-272
  (CSV = Metric,Value rows then an "Entities by Type" section :125-186;
  Markdown = summary/performance/quality bullet sections + a
  type/count/percentage table :188-250)
- validation report JSON/Markdown/text:
  /root/reference/extraction/kg_extractor/validation/report.py:60-211
  (Markdown = summary bullets, per-severity sections grouped by message
  with first-5 entity samples, by-field count table :96-156; text = the
  banner format with first-10 samples per severity :158-190)

These are driver-side renderings of ALREADY-AGGREGATED data (the metrics
dict and the vocabulary-sized validation_errors table) — the distributed
work happened upstream; a report is O(distinct messages), never O(rows).
"""

from __future__ import annotations

import csv
import io
import os

import pandas as pd

#: column order of the validation_errors table
ERROR_COLS = ["entity_id", "field", "target_urn", "message", "severity"]


# --------------------------------------------------------------------------
# S11 — metrics
# --------------------------------------------------------------------------


def metrics_csv(metrics: dict, entities_by_type: dict[str, int] | None = None) -> str:
    """Metric,Value rows + entities-by-type section (metrics.py:125-186)."""
    out = io.StringIO()
    w = csv.writer(out)
    w.writerow(["Metric", "Value"])
    for k, v in metrics.items():
        w.writerow([k, v])
    if entities_by_type:
        w.writerow([])
        w.writerow(["Entity Type", "Count"])
        for t, n in sorted(entities_by_type.items(), key=lambda x: (-x[1], x[0])):
            w.writerow([t, n])
    return out.getvalue().replace("\r\n", "\n").replace("\r", "\n")


def metrics_markdown(
    metrics: dict, entities_by_type: dict[str, int] | None = None
) -> str:
    """Markdown report (metrics.py:188-250 shape)."""
    lines = ["# Extraction Metrics", "", "## Extraction Summary", ""]
    for key in (
        "turns", "conversations", "mentions", "merged_entities",
        "entities", "edges", "triples",
    ):
        if key in metrics:
            lines.append(f"- **{key.replace('_', ' ').title()}**: {metrics[key]:,}")
    dur = metrics.get("duration_secs")
    if dur is not None:
        lines.append(f"- **Duration**: {dur:.2f}s ({dur / 60:.1f}m)")
    lines += ["", "## Performance", ""]
    tps = metrics.get("triples_per_sec")
    if tps is not None:
        lines.append(f"- **Triples/sec**: {tps:,.1f}")
    if dur and metrics.get("turns"):
        lines.append(f"- **Turns/sec**: {metrics['turns'] / dur:,.1f}")
    lines += ["", "## Quality", ""]
    n_err = metrics.get("validation_errors", 0)
    # reference formula (metrics.py:94-99): 1 - errors/entities_extracted,
    # defaulting to 1.0 when no entities were extracted
    n_ent = metrics.get("entities", 0)
    pass_rate = 1.0 - (n_err / n_ent) if n_ent > 0 else 1.0
    lines.append(f"- **Validation Errors**: {n_err}")
    lines.append(f"- **Broken References**: {metrics.get('broken_refs', 0)}")
    lines.append(f"- **Orphans**: {metrics.get('orphans', 0)}")
    lines.append(f"- **Validation Pass Rate**: {pass_rate:.1%}")
    if entities_by_type:
        total = sum(entities_by_type.values()) or 1
        lines += ["", "## Entities by Type", "", "| Type | Count | Percentage |",
                  "|------|-------|------------|"]
        for t, n in sorted(entities_by_type.items(), key=lambda x: (-x[1], x[0])):
            lines.append(f"| `{t}` | {n} | {n / total * 100:.1f}% |")
    lines.append("")
    return "\n".join(lines)


def save_metrics_reports(
    out_dir: str, metrics: dict, entities_by_type: dict[str, int] | None = None
) -> list[str]:
    """Write metrics.csv + metrics.md next to the existing metrics.json."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, content in (
        ("metrics.csv", metrics_csv(metrics, entities_by_type)),
        ("metrics.md", metrics_markdown(metrics, entities_by_type)),
    ):
        p = os.path.join(out_dir, name)
        with open(p, "w") as f:
            f.write(content)
        paths.append(p)
    return paths


# --------------------------------------------------------------------------
# S12 — validation report
# --------------------------------------------------------------------------


def _summary_counts(errors: pd.DataFrame) -> dict:
    return {
        "total": len(errors),
        "errors": int((errors["severity"] == "error").sum()),
        "warnings": int((errors["severity"] == "warning").sum()),
        "entities": int(errors["entity_id"].nunique()),
    }


def validation_markdown(errors: pd.DataFrame) -> str:
    """report.py:96-156: summary, per-severity sections grouped by message
    (first 5 entity samples each), by-field count table."""
    s = _summary_counts(errors)
    lines = [
        "# Validation Report", "", "## Summary", "",
        f"- **Total Issues**: {s['total']}",
        f"- **Errors**: {s['errors']}",
        f"- **Warnings**: {s['warnings']}",
        f"- **Entities Affected**: {s['entities']}",
        "",
    ]
    if len(errors):
        lines += ["## Issues by Severity", ""]
        for severity in ("error", "warning"):
            sub = errors[errors["severity"] == severity]
            if not len(sub):
                continue
            lines += [f"### {severity.upper()} ({len(sub)})", ""]
            for message, grp in sorted(
                sub.groupby("message"), key=lambda kv: kv[0]
            ):
                lines.append(f"**{message}** ({len(grp)} occurrences)")
                lines.append("")
                head = grp.sort_values(["entity_id", "field"]).head(5)
                for _, r in head.iterrows():
                    lines.append(f"- `{r['entity_id']}` (field: `{r['field']}`)")
                if len(grp) > 5:
                    lines.append(f"- ... and {len(grp) - 5} more")
                lines.append("")
        by_field = errors.groupby("field").size().sort_values(ascending=False)
        lines += ["## Issues by Field", "", "| Field | Count |", "|-------|-------|"]
        for field, n in by_field.items():
            lines.append(f"| `{field}` | {n} |")
        lines.append("")
    return "\n".join(lines)


def validation_text(errors: pd.DataFrame) -> str:
    """report.py:158-190: banner format, first 10 samples per severity."""
    s = _summary_counts(errors)
    lines = [
        "=" * 60,
        "VALIDATION REPORT",
        "=" * 60,
        f"Total Issues: {s['total']}",
        f"  Errors: {s['errors']}",
        f"  Warnings: {s['warnings']}",
        f"Entities Affected: {s['entities']}",
        "=" * 60,
    ]
    for severity in ("error", "warning"):
        sub = errors[errors["severity"] == severity]
        if not len(sub):
            continue
        lines.append(f"\n{severity.upper()}S ({len(sub)}):")
        head = sub.sort_values(["entity_id", "field"]).head(10)
        for _, r in head.iterrows():
            lines.append(f"  {r['entity_id']} [{r['field']}]: {r['message']}")
        if len(sub) > 10:
            lines.append(f"  ... and {len(sub) - 10} more")
    return "\n".join(lines)


def save_validation_reports(out_dir: str, errors: pd.DataFrame) -> list[str]:
    """Write validation_report.md + .txt next to the errors table."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, content in (
        ("validation_report.md", validation_markdown(errors)),
        ("validation_report.txt", validation_text(errors)),
    ):
        p = os.path.join(out_dir, name)
        with open(p, "w") as f:
            f.write(content)
        paths.append(p)
    return paths
