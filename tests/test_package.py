"""The --py-files zip must be import-equivalent to the checkout."""

from __future__ import annotations

import subprocess
import sys


def test_zip_imports_standalone(tmp_path):
    from tools.package import build

    path = build(str(tmp_path))
    # import from the zip in a clean interpreter with the repo OFF sys.path
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import concepts_pipeline_spark.lake.merge as m; "
        "import concepts_pipeline_spark.operators.dedup; "
        "import concepts_pipeline_spark.operators.curation; "
        "import concepts_pipeline_spark.streaming.runner; "
        "print(m.HIDDEN_LSN)" % path
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "_lsn"
