"""Command-line entry point: ``python -m crypto_streaming_lakehouse_spark``.

Subcommands:

- ``list [--tag TAG]`` — registry inventory (name + tags), optionally
  filtered by tag.
- ``run NAME [--sf-dir DIR] [--limit N] [--format table|json|csv]`` —
  execute one registry query and print its result.
- ``explain NAME [--sf-dir DIR]`` — the formatted physical plan (what
  the plan-invariant tests audit, on demand).
- ``oracle NAME`` — print the query's DuckDB oracle SQL.

The session comes from the same factory the library uses everywhere
(session.get_spark), so CLI behavior matches test/bench behavior.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="crypto_streaming_lakehouse_spark",
        description="PySpark-native analytics engine CLI",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registry queries")
    lp.add_argument("--tag", help="only queries carrying this tag")

    for name, hlp in (("run", "execute a query"), ("explain", "show plan")):
        rp = sub.add_parser(name, help=hlp)
        rp.add_argument("name")
        rp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            rp.add_argument("--limit", type=int, default=20)
            rp.add_argument(
                "--format", choices=("table", "json", "csv"), default="table"
            )

    op = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    op.add_argument("name")

    sh = sub.add_parser(
        "snapshot-history", help="list a snapshot table's versions"
    )
    sh.add_argument("table_dir")

    sr = sub.add_parser(
        "snapshot-read", help="show rows of a snapshot table version"
    )
    sr.add_argument("table_dir")
    sr.add_argument("--version", type=int, default=None)
    sr.add_argument("--limit", type=int, default=20)
    return p


def _require(registry: dict, name: str):
    if name not in registry:
        # removeprefix, not lstrip: lstrip("q_") strips the CHARACTER
        # SET {'q','_'}, so e.g. 'q_quantile' would become 'uantile'.
        needle = name.removeprefix("q_")
        close = [n for n in registry if needle and needle in n]
        hint = f" (did you mean: {', '.join(close[:5])}?)" if close else ""
        raise SystemExit(f"unknown query {name!r}{hint}")
    return registry[name]


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from .registry import REGISTRY

    if args.cmd == "list":
        for name, d in sorted(REGISTRY.items()):
            if args.tag and args.tag not in d.tags:
                continue
            print(f"{name}  [{', '.join(d.tags)}]")
        return 0

    if args.cmd == "oracle":
        d = _require(REGISTRY, args.name)
        if d.sql is None:
            raise SystemExit(f"{args.name} has no SQL oracle (rows-only)")
        print(d.sql.strip())
        return 0

    if args.cmd == "snapshot-history":
        from .sources.snapshots import snapshot_history

        for m in snapshot_history(args.table_dir):
            # Delta manifests list only their added files; show both
            # shapes distinctly so the log form is visible.
            shape = (
                f"files={len(m['files'])}"
                if "files" in m
                else f"adds={len(m['adds'])} (delta)"
            )
            print(
                f"v{m['version']:<4d} op={m['op']:<12s} {shape}"
                + (f" txn={m['txn']}" if "txn" in m else "")
            )
        return 0

    if args.cmd == "snapshot-read":
        from .session import get_spark
        from .sources.snapshots import snapshot_read

        spark = get_spark("cli-snapshot-read")
        snapshot_read(spark, args.table_dir, version=args.version).show(
            args.limit, truncate=False
        )
        return 0

    d = _require(REGISTRY, args.name)
    from .session import get_spark

    spark = get_spark(f"cli-{args.cmd}")
    df = d.fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    # run
    if args.format == "table":
        df.show(args.limit, truncate=False)
    else:
        rows = df.limit(args.limit).collect()
        if args.format == "json":
            print(
                json.dumps(
                    [r.asDict(recursive=True) for r in rows],
                    default=str,
                    indent=1,
                )
            )
        else:  # csv
            cols = df.columns
            print(",".join(cols))
            for r in rows:
                print(",".join(str(r[c]) for c in cols))
    return 0


if __name__ == "__main__":
    sys.exit(main())
