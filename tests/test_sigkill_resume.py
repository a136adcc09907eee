"""Process-level chaos: SIGKILL a REAL spark-submit replay mid-run (whole
process group — driver JVM included), rerun the identical job, and require
byte-exact convergence with a clean replay into a fresh table. This is the
kill-hard form of the exactly-once claim: no monkeypatched crash points, the
fences and the atomic manifest swap alone must absorb whatever instant the
kill landed on (staged-but-uncommitted files become expirable orphans)."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")


def _cmd(zip_path, job, extra):
    return [SUBMIT, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path, job] + extra


def _live_state(table_root: str) -> set:
    """Read a CoW table's live rows straight from its manifest + parquet via
    DuckDB — engine-independent verification."""
    mdir = os.path.join(table_root, "_manifests")
    v = max(f for f in os.listdir(mdir) if f.startswith("v"))
    with open(os.path.join(mdir, v)) as fh:
        m = json.load(fh)
    files = m["files"]
    if not files and m.get("files_shards"):
        files = []
        for r in m["files_shards"]:
            with open(os.path.join(table_root, r["path"])) as fh:
                files.extend(json.load(fh))
    paths = [os.path.join(table_root, f["path"]) for f in files]
    if not paths:
        return set()
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, CAST(to_json(tokens) AS VARCHAR), n_tok, source "
        "FROM read_parquet($1) WHERE _deleted IS DISTINCT FROM true",
        [paths],
    ).fetchall()
    return set(rows)


def test_sigkill_mid_replay_resumes_exactly_once(tmp_path):
    from tools.package import build

    zip_path = build(str(tmp_path))
    job = os.path.join(REPO, "tools", "submit_replay.py")
    feed = str(tmp_path / "feed")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONDONTWRITEBYTECODE"] = "1"

    out = subprocess.run(
        _cmd(zip_path, job, ["--prep", "--feed", feed, "--events", "20000",
                             "--keys", "2000", "--batches", "4"]),
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    # victim run: CoW, 4 batches into a persistent root; kill the WHOLE
    # process group the instant the table shows its second commit
    victim_root = str(tmp_path / "victim")
    args = _cmd(zip_path, job, ["--feed", feed, "--batches", "4",
                                "--strategy", "cow", "--out", victim_root])
    proc = subprocess.Popen(args, cwd=str(tmp_path), env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            preexec_fn=os.setsid)
    mdir = os.path.join(victim_root, "tokens", "_manifests")
    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError("victim finished before the kill landed")
            if os.path.isdir(mdir) and sum(
                1 for f in os.listdir(mdir) if f.startswith("v")
            ) >= 2:
                break
            time.sleep(0.2)
        else:
            raise AssertionError("victim never reached its second commit")
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    finally:
        proc.wait(timeout=60)

    # resume: the IDENTICAL job re-applies; fenced batches skip, the
    # interrupted batch re-runs, completion is clean
    out = subprocess.run(args, capture_output=True, text=True,
                         cwd=str(tmp_path), env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]

    # clean reference replay into a fresh root
    clean_root = str(tmp_path / "clean")
    out = subprocess.run(
        _cmd(zip_path, job, ["--feed", feed, "--batches", "4",
                             "--strategy", "cow", "--out", clean_root]),
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    got = _live_state(os.path.join(victim_root, "tokens"))
    want = _live_state(os.path.join(clean_root, "tokens"))
    assert got == want and len(want) > 0

    # fences: every batch exactly once, no duplicates after the resume
    with open(os.path.join(
        victim_root, "tokens", "_manifests",
        max(f for f in os.listdir(os.path.join(victim_root, "tokens", "_manifests"))
            if f.startswith("v")),
    )) as fh:
        tokens = json.load(fh)["fence_tokens"]
    assert sorted(tokens) == [f"submit:{b}" for b in range(4)]
