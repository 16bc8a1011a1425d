"""Build the ``--py-files`` deployment artifact.

``spark-submit --py-files zparse_spark.zip validate.py ...`` is the
north rule's shipping mode: the zip rides the job to every executor, so
``import zparse_spark`` resolves cluster-wide without any cluster-side
install. Only the package goes in the zip — ``validate.py`` is the
driver script argument itself.

Usage: python scripts/package.py [out.zip]   (default: ./zparse_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "zparse_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(os.getcwd(), "zparse_spark.zip")
    print(build(out))
