"""Package the engine for spark-submit --py-files.

Produces dist/pii_pipeline.zip containing the pure-Python package; the
broadcast model artifacts (KN log-prob table, langid stopword tables,
scrub regex lexicon) are embedded in the modules, so the zip is fully
self-contained — executors need nothing but this zip on sys.path.

Usage: python scripts/make_pyfiles_zip.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "pii_redaction_data_pipeline_spark"


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", "pii_pipeline.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
