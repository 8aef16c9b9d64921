"""Time EVERY registry query once (bench protocol: warm pass then one
measured pass, noop sink) — the full-surface cost map behind the
optimization round's checklist. Writes {name: {warm, measured}} JSON.

Usage: python scripts/sweep_all.py [--out FILE] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SCAN_CACHE", "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sweep_all.json")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from crypto_streaming_lakehouse_spark.registry import REGISTRY
    from crypto_streaming_lakehouse_spark.session import get_spark

    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "12"))
    spark = get_spark(
        "sweep-all",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "4m",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        },
    )

    def run(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    rows = {}
    for name in sorted(REGISTRY):
        try:
            w = run(name)
            m = run(name)
            rows[name] = {"warm": round(w, 3), "measured": round(m, 3)}
        except Exception as e:  # keep sweeping; record the failure
            rows[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
