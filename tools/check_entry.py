"""Local mimic of the driver's correctness harness.

Runs every __spark_entry__.queries() entry at sf0.01 (or $SF_DIR) and
compares against oracle_sql() via DuckDB: row count, sorted column names,
and an order-insensitive canonical value hash.  Queries without an oracle
get a rows-only check (must run, >= 0 rows, stable schema).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from kartograph_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canonical_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        col = pdf[c]
        if pd.api.types.is_float_dtype(col):
            pdf[c] = col.astype("float64").map(
                lambda v: "NULL" if pd.isna(v) else f"{v:.9g}"
            )
        elif pd.api.types.is_datetime64_any_dtype(col):
            pdf[c] = col.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(col):
            pdf[c] = col.astype("int64").astype(str)
        else:
            pdf[c] = col.map(lambda v: "NULL" if v is None or v is pd.NA else str(v))
    rows = sorted("\x1f".join(r) for r in pdf.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:] or None
    spark = get_spark("check-entry", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    fails = []
    #: per-query verification record, dumped to $CHECK_ENTRY_JSON when
    #: set — the committed audit trail for entries past the driver
    #: harness's 50-entry correctness window (their verification otherwise
    #: rests solely on this in-repo run)
    records: dict[str, dict] = {}
    for idx, (name, fn) in enumerate(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            fails.append(name)
            records[name] = {"index": idx, "status": "spark-error"}
            continue
        dur = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(sdf)} rows ({dur:.1f}s)")
            records[name] = {
                "index": idx,
                "status": "rows-only",
                "rows": len(sdf),
                "value_hash": canonical_hash(sdf),
            }
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            fails.append(name)
            records[name] = {"index": idx, "status": "oracle-error"}
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif canonical_hash(sdf) != canonical_hash(odf):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({dur:.1f}s)")
            if "value-hash mismatch" in problems and len(sdf) == len(odf):
                a = sdf[sorted(sdf.columns)].astype(str).sort_values(
                    list(sorted(sdf.columns))
                ).reset_index(drop=True)
                b = odf[sorted(odf.columns)].astype(str).sort_values(
                    list(sorted(odf.columns))
                ).reset_index(drop=True)
                diff = a.compare(b) if a.shape == b.shape else None
                if diff is not None and len(diff):
                    print(diff.head(5).to_string())
            fails.append(name)
            records[name] = {
                "index": idx,
                "status": "mismatch",
                "problems": problems,
            }
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({dur:.1f}s)")
            records[name] = {
                "index": idx,
                "status": "hash-match",
                "rows": len(sdf),
                "value_hash": canonical_hash(sdf),
            }
    json_out = os.environ.get("CHECK_ENTRY_JSON")
    if json_out and only:
        # a filtered run must never overwrite the committed full-run
        # audit trail with partial records carrying full-run metadata
        print(f"NOT writing {json_out}: partial run ({len(records)} queries)")
        json_out = None
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_queries": len(qs), "results": records},
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    print(f"\n{len(qs) - len(fails)}/{len(qs)} ok")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
