#!/usr/bin/env python
"""Package the engine as a spark-submit --py-files zip.

Usage: python tools/make_pyfiles_zip.py [out.zip]

Deterministic (fixed timestamps, sorted entries) so the artifact hash
is stable for a given tree — the same property the stage manifests
rely on for lineage fingerprints.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "pubmed_and_method_spark"


def build_zip(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg_dir = os.path.join(root, PKG)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, root)))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/pubmed_and_method_spark.zip"
    print(build_zip(out))
