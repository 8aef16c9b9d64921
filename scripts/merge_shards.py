"""Merge parallel from-scratch shards into one full-sweep artifact.

Counterpart of ``full_correctness.py --shard=i/n``: each shard runs a
disjoint residue class of the registry in its own process (so a
memory-giant row like q_edit_distance_join's 57 GB compare cannot take
down hours of other rows) and stamps its own meta with the git commit
it executed on. This script verifies the shards are mutually disjoint,
cover the ENTIRE live registry, and were all earned on the SAME clean
commit — then writes the combined artifact in registry order with
``mode: full-from-scratch-sharded`` and both the parallel wall
(max of shards) and the serial-equivalent wall (sum of shards).

Usage: python scripts/merge_shards.py <sf_dir> <shard_file> [...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from full_correctness import _artifact_path  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    shard_files = sys.argv[2:]
    if not shard_files:
        print("usage: merge_shards.py <sf_dir> <shard_file> [...]")
        return 2

    from crypto_streaming_lakehouse_spark.registry import REGISTRY

    rows: dict[str, dict] = {}
    shard_metas: list[dict] = []
    for path in shard_files:
        blob = json.load(open(path))
        smeta = blob.pop("_meta", None)
        if smeta is None:
            raise SystemExit(f"{path}: no _meta — incomplete shard (crashed?)")
        shard_metas.append({"file": os.path.basename(path), **smeta})
        dup = set(blob) & set(rows)
        if dup:
            raise SystemExit(f"{path}: overlaps earlier shards: {sorted(dup)[:5]}")
        rows.update(blob)

    commits = {m.get("git_commit") for m in shard_metas}
    if len(commits) != 1 or "" in commits:
        raise SystemExit(f"shards span commits {commits} — not one attestation")
    dirty = [m["file"] for m in shard_metas if m.get("git_dirty")]
    if dirty:
        raise SystemExit(f"shards ran on a dirty tree: {dirty}")
    missing = set(REGISTRY) - set(rows)
    if missing:
        raise SystemExit(f"registry not covered: {sorted(missing)[:10]}")
    extra = set(rows) - set(REGISTRY)
    if extra:
        raise SystemExit(f"rows not in live registry: {sorted(extra)[:10]}")

    out = {n: rows[n] for n in REGISTRY}  # registry order, diff-stable

    def _is_timeout(r: dict) -> bool:
        return str(r.get("err") or "").startswith("oracle_timeout")

    meta = {
        "sf_dir": sf_dir,
        "mode": f"full-from-scratch-sharded({len(shard_metas)})",
        "git_commit": commits.pop(),
        "git_dirty": False,
        "n_queries": len(out),
        "n_hash_match": sum(1 for r in out.values() if r["hash_match"]),
        "n_rows_only": sum(1 for r in out.values() if r["err"] == "no_oracle"),
        "n_oracle_timeout": sum(1 for r in out.values() if _is_timeout(r)),
        "n_fail": sum(
            1
            for r in out.values()
            if not r["hash_match"]
            and r["err"] != "no_oracle"
            and not _is_timeout(r)
        ),
        "wall_s": max(m["wall_s"] for m in shard_metas),
        "wall_s_serial_equivalent": round(
            sum(m["wall_s"] for m in shard_metas), 1
        ),
        "shards": shard_metas,
    }
    path = _artifact_path(sf_dir)
    with open(path, "w") as f:
        json.dump({"_meta": meta, **out}, f, indent=1)
    print(json.dumps({k: v for k, v in meta.items() if k != "shards"}))
    print(f"wrote {path}")
    return 0 if meta["n_fail"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
