"""Build dist/kartograph_spark.zip for spark-submit --py-files.

Zips the package sources (no tests, no caches) with deterministic entry
order; prints the archive path and its sha256 so deploys are auditable.
"""

from __future__ import annotations

import hashlib
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "kartograph_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "kartograph_spark")
    entries = []
    for root, _dirs, files in os.walk(pkg_root):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            z.write(full, arcname)
    return out_path


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


if __name__ == "__main__":
    p = build()
    print(p)
    print("sha256:", sha256(p))
