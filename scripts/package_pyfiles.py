#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission:

    python scripts/package_pyfiles.py [out.zip]
    spark-submit --py-files ensembl_datacheck_spark.zip \
        your_driver.py  # or: -m ensembl_datacheck_spark.cli ...

Zips the package sources (no tests, no caches) with deterministic
member order and timestamps, so the artifact hash is reproducible and
can serve as the code-version component of checkpoint lineage.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "ensembl_datacheck_spark"


def build(out: Path) -> int:
    members = sorted(
        p
        for p in PKG.rglob("*")
        if p.is_file()
        and "__pycache__" not in p.parts
        and p.suffix in {".py", ".json"}
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in members:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)))
            info.date_time = (2020, 1, 1, 0, 0, 0)  # reproducible artifact
            info.external_attr = 0o644 << 16
            # an explicit ZipInfo defaults to STORED, ignoring the
            # ZipFile-level compression argument
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, p.read_bytes())
    return len(members)


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "ensembl_datacheck_spark.zip"
    n = build(out)
    print(f"wrote {out} ({n} files)")
