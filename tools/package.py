"""Build the --py-files archive for spark-submit (north_rule execution
mode): zips the ``btc_blockchain_scanner_spark`` package (source only, no
__pycache__) into ``dist/btc_blockchain_scanner_spark.zip`` so executors
can import it.

Usage: python tools/package.py  [dest_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "btc_blockchain_scanner_spark"


def build(dest_dir: str | None = None) -> str:
    dest_dir = dest_dir or os.path.join(REPO, "dist")
    os.makedirs(dest_dir, exist_ok=True)
    out = os.path.join(dest_dir, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
