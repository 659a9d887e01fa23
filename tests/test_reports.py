"""S11/S12 report formats — shapes mirror the reference's exporters
(output/metrics.py:125-250, validation/report.py:96-190)."""

import pandas as pd

from kartograph_spark import reports

METRICS = {
    "turns": 5000,
    "conversations": 200,
    "mentions": 4200,
    "merged_entities": 12,
    "entities": 310,
    "edges": 3900,
    "triples": 4800,
    "broken_refs": 0,
    "orphans": 3,
    "validation_errors": 7,
    "duration_secs": 12.5,
    "triples_per_sec": 384.0,
    "config_hash": "abc123",
}

EBT = {"Tool": 120, "Service": 90, "Team": 40}

ERRORS = pd.DataFrame(
    {
        "entity_id": ["urn:service:x", "urn:service:x", "not-a-urn", "urn:T:y"],
        "field": ["id", "type", "id", "graph"],
        "target_urn": [None, None, None, None],
        "message": [
            "invalid URN format, expected urn:Type:identifier",
            "invalid type name, expected PascalCase alphanumeric",
            "invalid URN format, expected urn:Type:identifier",
            "orphan entity: no relationships to/from the graph",
        ],
        "severity": ["error", "warning", "error", "warning"],
    }
)


def test_metrics_csv():
    out = reports.metrics_csv(METRICS, EBT)
    lines = out.strip().split("\n")
    assert lines[0] == "Metric,Value"
    assert "turns,5000" in lines
    # entities-by-type section sorted by -count
    i = lines.index("Entity Type,Count")
    assert lines[i + 1 : i + 4] == ["Tool,120", "Service,90", "Team,40"]


def test_metrics_markdown():
    md = reports.metrics_markdown(METRICS, EBT)
    assert md.startswith("# Extraction Metrics")
    for section in ("## Extraction Summary", "## Performance", "## Quality",
                    "## Entities by Type"):
        assert section in md
    assert "- **Duration**: 12.50s (0.2m)" in md
    assert "| `Tool` | 120 | 48.0% |" in md
    # reference formula (metrics.py:94-99): 1 - errors/entities = 1 - 7/310
    assert "- **Validation Pass Rate**: 97.7%" in md


def test_validation_markdown():
    md = reports.validation_markdown(ERRORS)
    assert "# Validation Report" in md
    assert "- **Total Issues**: 4" in md
    assert "- **Errors**: 2" in md
    assert "- **Warnings**: 2" in md
    assert "- **Entities Affected**: 3" in md
    assert "### ERROR (2)" in md
    assert "**invalid URN format, expected urn:Type:identifier** (2 occurrences)" in md
    assert "- `not-a-urn` (field: `id`)" in md
    assert "| `id` | 2 |" in md


def test_validation_text():
    txt = reports.validation_text(ERRORS)
    assert txt.startswith("=" * 60)
    assert "VALIDATION REPORT" in txt
    assert "Total Issues: 4" in txt
    assert "ERRORS (2):" in txt
    assert "WARNINGS (2):" in txt
    assert "  not-a-urn [id]: invalid URN format, expected urn:Type:identifier" in txt


def test_truncation():
    big = pd.concat([ERRORS] * 10, ignore_index=True)
    big["entity_id"] = [f"urn:S:e{i}" for i in range(len(big))]
    md = reports.validation_markdown(big)
    assert "- ... and 15 more" in md  # 20 occurrences, 5 shown
    txt = reports.validation_text(big)
    assert "... and 10 more" in txt  # 20 errors, 10 shown


def test_save_roundtrip(tmp_path):
    paths = reports.save_metrics_reports(str(tmp_path), METRICS, EBT)
    paths += reports.save_validation_reports(str(tmp_path), ERRORS)
    for p in paths:
        assert open(p).read()
    names = {p.split("/")[-1] for p in paths}
    assert names == {
        "metrics.csv", "metrics.md", "validation_report.md", "validation_report.txt"
    }
