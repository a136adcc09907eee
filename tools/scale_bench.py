"""Scaling-efficiency evidence: the same CDC replay at two local parallelism levels.

BASELINE.json's north rule demands throughput scaling efficiency >= 0.8 from N to
4N executors; in this sandbox (no real cluster) the evidence is the same job at
local[N] and local[4N] over the identical on-disk change log (TESTDATA rule).

Usage:
  python tools/scale_bench.py                 # prep feed, run at 8 and 32 cores
  python tools/scale_bench.py --events 4000000 --cpus 8 32

Each level runs in its own subprocess (fresh JVM) so executor-thread pools and
memory are clean. Prints one JSON summary line; paste results into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FEED_DIR = os.environ.get("SCALE_FEED_DIR", "/tmp/cps-scale-feed")


def prep(num_events: int, num_keys: int, num_batches: int) -> None:
    from concepts_pipeline_spark.cdc.generator import (
        generate_change_log,
        write_change_log,
    )
    from concepts_pipeline_spark.session import get_spark

    marker = os.path.join(FEED_DIR, f".ready-{num_events}-{num_keys}-{num_batches}")
    if os.path.exists(marker):
        return
    spark = get_spark(app_name="cps-scale-prep", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    # fixed parallelism => identical files regardless of the session's core count
    df = generate_change_log(
        spark, num_events, num_keys, seed=42, num_batches=num_batches,
        parallelism=64,
    )
    write_change_log(df, FEED_DIR)
    spark.stop()
    open(marker, "w").close()


def worker(cpus: int, num_batches: int) -> None:
    import tempfile

    from pyspark.sql import functions as F

    from concepts_pipeline_spark.cdc.apply import CdcPipeline
    from concepts_pipeline_spark.cdc.generator import CHANGE_LOG_SCHEMA
    from concepts_pipeline_spark.session import get_spark

    from __spark_entry__ import TOKENS_SCHEMA

    spark = get_spark(app_name=f"cps-scale-{cpus}", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    feed = (
        spark.read.schema(CHANGE_LOG_SCHEMA)
        .parquet(f"file://{FEED_DIR}")
    )
    n_events = feed.count()
    root = tempfile.mkdtemp(prefix=f"cps-scale-{cpus}-")
    pipe = CdcPipeline(
        spark,
        target_path=f"{root}/tokens",
        target_schema=TOKENS_SCHEMA,
        key_cols=["doc_id"],
        quarantine_path=f"{root}/quarantine",
        lineage_path=f"{root}/lineage",
        num_buckets=max(cpus, 16),
        salt_buckets=8,
    )
    t0 = time.time()
    applied = 0
    for b in range(num_batches):
        batch = feed.filter(F.col("batch_id") == b).drop("batch_id")
        res = pipe.apply_batch(batch, fence_token=f"scale:{b}")
        applied += res.rows_in
    elapsed = time.time() - t0
    final_rows = pipe.final_state().count()
    print(json.dumps({
        "cpus": cpus, "events": n_events, "applied": applied,
        "elapsed_sec": round(elapsed, 2),
        "events_per_sec": round(n_events / elapsed, 1),
        "final_rows": final_rows,
    }))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--keys", type=int, default=200_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--cpus", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.batches)
        return

    prep(args.events, args.keys, args.batches)
    results = []
    for c in args.cpus:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(c), "--batches", str(args.batches)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
        print(line, flush=True)

    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        ratio = hi["cpus"] / lo["cpus"]
        speedup = hi["events_per_sec"] / lo["events_per_sec"]
        print(json.dumps({
            "metric": "CDC replay scaling efficiency",
            "cores": [lo["cpus"], hi["cpus"]],
            "events_per_sec": [lo["events_per_sec"], hi["events_per_sec"]],
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / ratio, 3),
        }))


if __name__ == "__main__":
    main()
