"""End-to-end spark-submit --py-files deployment test (north-rule run shape).

Builds the zip, then runs feed prep AND a 2-batch MoR replay as REAL
spark-submit jobs in their own JVMs, with the repo checkout absent from the
job's import path — everything must come from the --py-files artifact. This is
the executable form of the claim in tools/package.py's docstring.
"""

from __future__ import annotations

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")


def _run(args, cwd):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    out = subprocess.run(args, capture_output=True, text=True, cwd=cwd,
                         env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-3000:]
    # last JSON line of stdout is the job report
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stdout[-2000:]
    return json.loads(lines[-1])


def test_spark_submit_pyfiles_replay(tmp_path):
    from tools.package import build

    zip_path = build(str(tmp_path))
    job = os.path.join(REPO, "tools", "submit_replay.py")
    feed = str(tmp_path / "feed")

    prep = _run(
        [SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, job,
         "--prep", "--feed", feed, "--events", "20000", "--keys", "2000",
         "--batches", "2"],
        cwd=str(tmp_path),
    )
    assert prep["prep"] is True and prep["events"] == 20000

    rep = _run(
        [SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, job,
         "--feed", feed, "--batches", "2", "--strategy", "mor",
         "--out", str(tmp_path / "table")],
        cwd=str(tmp_path),
    )
    assert rep["master"] == "local[4]"
    # the generator injects ~5% duplicate redeliveries, so the physical feed
    # is slightly larger than the nominal event count
    assert rep["applied"] == rep["events"] >= 20000
    assert rep["final_rows"] > 0
    assert rep["events_per_sec"] > 0
