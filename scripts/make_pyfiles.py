#!/usr/bin/env python
"""Package great_expectations_spark into a ``--py-files`` zip for
spark-submit deployment (north-rule deployment model: "run via
spark-submit --py-files on a multi-executor cluster").

    python scripts/make_pyfiles.py [out.zip]     # default ./ges.zip
    spark-submit --py-files ges.zip scripts/run_validation.py ...

The zip contains only the package's .py files (the engine is pure Python —
no data resources), rooted so that ``import great_expectations_spark``
resolves from the zip on every executor and on the driver.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str = "ges.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "great_expectations_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return os.path.abspath(out_path)


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "ges.zip"))
