"""Build the --py-files artifact for cluster deployment.

The north rule's deployment shape is ``spark-submit --py-files`` on a
multi-executor cluster; this produces the zip (pure-Python package, no native
deps beyond what any PySpark 4 cluster already ships: pyarrow/pandas/numpy on
the executors for the Arrow-batched operators).

  python tools/package.py [outdir]          # writes concepts_pipeline_spark.zip
  spark-submit --py-files concepts_pipeline_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      your_job.py          # or: -m concepts_pipeline_spark replay ...

The zip is import-equivalent to the repo checkout: every module is addressed
as ``concepts_pipeline_spark.*`` and nothing reads files relative to the
package directory at runtime.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "concepts_pipeline_spark"


def build(outdir: str) -> str:
    out = os.path.join(outdir, f"{PKG}.zip")
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    os.replace(tmp, out)
    return out


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else REPO
    path = build(outdir)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path} ({n} modules)")
    print(f"spark-submit --py-files {path} your_job.py")
