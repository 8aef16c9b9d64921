"""Per-query profile of the bench workload: wall seconds, Spark JOB and
STAGE counts (statusTracker over a per-query job group), and the
formatted plan — the guide-§1 measurement pass behind OPTIMIZATION_r14.md.

Same session/protocol as bench.py (scan-cache layout, 8 MB splits,
bytes-sized shuffle, warmup pass keeps memos warm). Writes one JSON line
per query to --out and, with --plans DIR, each query's
``explain("formatted")`` text to DIR/<name>.txt.

Usage: python scripts/profile_bench.py [--out FILE] [--plans DIR]
       [--queries a,b,c]   (default: bench.py's HEADLINE list)
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SCAN_CACHE", "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/profile_bench.json")
    ap.add_argument("--plans", default=None)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from bench import HEADLINE

    from crypto_streaming_lakehouse_spark.registry import REGISTRY
    from crypto_streaming_lakehouse_spark.session import get_spark

    names = (
        [n for n in args.queries.split(",") if n in REGISTRY]
        if args.queries
        else [n for n in HEADLINE if n in REGISTRY]
    )
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "12"))
    spark = get_spark(
        "profile-bench",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "4m",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        },
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    plans_dir = pathlib.Path(args.plans) if args.plans else None
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # Warmup pass (bench protocol: memos built here stay warm).
    for name in names:
        run(name)

    rows = []
    for name in names:
        sc.setJobGroup(name, name)
        dt = run(name)
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(name)
        n_stages = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        row = {
            "query": name,
            "sec": round(dt, 3),
            "jobs": len(job_ids),
            "stages": n_stages,
        }
        rows.append(row)
        if plans_dir:
            df = REGISTRY[name].fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (plans_dir / f"{name}.txt").write_text(buf.getvalue())

    rows.sort(key=lambda r: -r["sec"])
    with open(args.out, "w") as f:
        json.dump({"sf_dir": args.sf_dir, "rows": rows}, f, indent=1)
    for r in rows:
        print(f"{r['sec']:7.3f}s  {r['jobs']:3d} jobs {r['stages']:3d} stages  {r['query']}")
    spark.stop()


if __name__ == "__main__":
    main()
