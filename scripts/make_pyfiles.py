#!/usr/bin/env python3
"""Package slowspark for cluster submission:

    python scripts/make_pyfiles.py            # -> dist/slowspark.zip
    spark-submit --py-files dist/slowspark.zip \
        --master yarn --deploy-mode cluster \
        $(python -c 'import slowspark.job as j; print(j.__file__)') \
        --pages warehouse.pages --warehouse s3://.../wh
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "slowspark.zip")
    pkg = os.path.join(ROOT, "slowspark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
