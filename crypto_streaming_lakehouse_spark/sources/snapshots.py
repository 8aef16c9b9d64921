"""Snapshot table layer: versioned manifests over plain parquet — the
time-travel/ACID-commit slice of a lakehouse table format, with no
external runtime (Delta/Iceberg are pip-blocked in this environment;
see formats.py — data files written here stay byte-compatible with a
later CONVERT TO DELTA, since the layer is pure metadata).

Layout::

    table_dir/
      _snapshots/v00000001.json   one manifest per committed version
      data/commit-00000001/       immutable data files of that commit

A manifest lists the COMPLETE relative file set of its version (like
Delta's checkpoint view of add-files, without the log replay), plus the
schema, the operation, and the parent version. Readers resolve a
version (default: latest) and scan exactly that file list — writers
never mutate or delete data files a reader could hold, so reads are
snapshot-isolated without locks.

Commit protocol: data files land first under ``data/commit-<v>/``, then
the manifest is written to a temp name and ``os.rename``d to
``v<v>.json`` — a same-directory rename, atomic on POSIX. Concurrent
writers race on the rename target via ``os.link`` (fails with EEXIST if
the version was taken); the loser re-reads the log and retries against
the new head — optimistic concurrency, same contract as Delta's
``txn`` conflict-retry. On an object store without atomic rename the
manifest write moves behind a conditional PUT (If-None-Match: "*") —
plug one in via the ``protocol`` parameter / ``DEFAULT_COMMIT_PROTOCOL``
(one ``publish(target, payload) -> bool`` method, claim-or-lose); the
layout and retry loop are unchanged.

At 100 TB the manifest-per-version file-list model is the right shape:
manifests are O(files), readers touch one small JSON + footer pruning,
and compaction (sources/maintenance.py) is just another commit whose
manifest swaps many small files for few large ones while old versions
keep reading their original set.
"""

from __future__ import annotations

import datetime
import json
import os
import pathlib
import uuid


class SnapshotConflict(RuntimeError):
    """Another writer committed the version this writer targeted (raised
    only after the retry budget is exhausted)."""


class _TxnAlreadyCommitted(Exception):
    """Internal signal: the idempotence token was found in a live
    manifest while (re)building a commit — the write must become a
    no-op. Raised from inside the retry loop because the check has to
    run against the FRESHLY OBSERVED head: two concurrent writers with
    the same token (zombie driver replaying a micro-batch while its
    replacement commits it) can both pass a pre-commit check, and only
    the loser's retry sees the winner's manifest. Delta runs its
    SetTransaction check inside commit conflict resolution for the same
    reason."""


def _snap_dir(table_dir: str) -> pathlib.Path:
    return pathlib.Path(table_dir) / "_snapshots"


def _data_dir(table_dir: str) -> pathlib.Path:
    return pathlib.Path(table_dir) / "data"


def _manifest_path(table_dir: str, version: int) -> pathlib.Path:
    return _snap_dir(table_dir) / f"v{version:08d}.json"


def _versions(table_dir: str) -> list[int]:
    d = _snap_dir(table_dir)
    if not d.is_dir():
        return []
    return sorted(
        int(p.stem[1:])
        for p in d.glob("v*.json")
        if p.stem[1:].isdigit()
    )


def _read_manifest(table_dir: str, version: int) -> dict:
    return json.loads(_manifest_path(table_dir, version).read_text())


def snapshot_history(table_dir: str) -> list[dict]:
    """All committed manifests, oldest first."""
    return [_read_manifest(table_dir, v) for v in _versions(table_dir)]


class PosixLinkCommitProtocol:
    """Default atomic-claim primitive: temp-file write + ``os.link`` to
    the version target. link(2) fails with EEXIST if another writer took
    the version — the atomic claim; rename() would silently clobber the
    winner. Works on any POSIX filesystem."""

    def publish(self, target: pathlib.Path, payload: str) -> bool:
        """Atomically publish ``payload`` at ``target`` iff no object
        exists there. Returns True on success, False if another writer
        already claimed the target (the caller re-observes the head and
        retries). Must never partially publish."""
        tmp = target.parent / f".tmp-{uuid.uuid4().hex}.json"
        tmp.write_text(payload)
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            return False
        finally:
            tmp.unlink(missing_ok=True)


# Injection point for object stores without atomic rename/link: plug an
# S3-style conditional PUT (If-None-Match: "*") by assigning an object
# with the same ``publish`` contract — nothing in _commit changes. The
# layout and the retry loop are already conditional-PUT-shaped: one
# immutable object per version, claim-or-lose semantics.
DEFAULT_COMMIT_PROTOCOL = PosixLinkCommitProtocol()


def _commit(table_dir: str, manifest_fn, *, retries: int = 10,
            protocol=None) -> int:
    """Atomically claim the next version; returns it.

    ``manifest_fn(parent_manifest | None) -> dict`` builds the manifest
    AGAINST THE OBSERVED HEAD — it is re-invoked on every retry, so an
    append that loses the race recomputes its file list on top of the
    winner's commit instead of silently dropping it (the append-append
    auto-merge every table format must get right).

    ``protocol`` swaps the atomic-claim primitive (default:
    ``DEFAULT_COMMIT_PROTOCOL``, POSIX link; see the class docstring for
    the object-store conditional-PUT contract)."""
    protocol = protocol or DEFAULT_COMMIT_PROTOCOL
    snap = _snap_dir(table_dir)
    snap.mkdir(parents=True, exist_ok=True)
    for _ in range(retries):
        vs = _versions(table_dir)
        parent = _read_manifest(table_dir, vs[-1]) if vs else None
        version = (vs[-1] if vs else 0) + 1
        manifest = {
            **manifest_fn(parent),
            "version": version,
            "parent": vs[-1] if vs else None,
        }
        target = _manifest_path(table_dir, version)
        if protocol.publish(target, json.dumps(manifest, indent=1)):
            return version
        continue  # lost the race: re-observe the head, rebuild, retry
    raise SnapshotConflict(
        f"lost the commit race {retries} times in {table_dir}"
    )


def _resolve(table_dir: str, version: int) -> tuple[list[str], dict]:
    """File set + merged stats of ``version``, following delta-manifest
    parents back to the nearest FULL manifest (the checkpoint). Walk
    depth is bounded by the checkpoint interval, so reads stay O(1)
    manifests amortized — Delta's log-replay-to-checkpoint, inverted
    (we checkpoint by default and delta-append on request)."""
    chain: list[dict] = []
    m = _read_manifest(table_dir, version)
    while "files" not in m:
        chain.append(m)
        if m.get("parent") is None:
            raise ValueError(
                f"delta manifest v{m['version']} in {table_dir} has no "
                "parent — corrupt log"
            )
        m = _read_manifest(table_dir, m["parent"])
    files = list(m["files"])
    stats = dict(m.get("stats", {}))
    for d in reversed(chain):
        files += d["adds"]
        stats.update(d.get("stats", {}))
    return files, stats


class SchemaEvolutionError(ValueError):
    """An append's schema is incompatible with the table's schema under
    the requested ``schema_mode``."""


def _schema_fields(schema_json: str) -> dict[str, str]:
    """{field name: type json} of a manifest schema, order-insensitive."""
    fields = json.loads(schema_json)["fields"]
    return {f["name"]: json.dumps(f["type"], sort_keys=True) for f in fields}


def _merged_schema(parent_json: str, new_json: str, *, merge: bool) -> str:
    """Validate an append's schema against the parent manifest's and
    return the manifest schema for the new version.

    ``strict`` (merge=False): field name→type sets must match exactly
    (nullability and column order are NOT part of table identity — the
    read path applies the manifest schema explicitly, and parquet
    column resolution is by name). ``merge`` (merge=True): the append
    may ADD columns (recorded nullable — older files simply lack them
    and read as NULL, Delta's mergeSchema contract); common columns
    must keep their exact type — type WIDENING is refused because the
    already-written parquet files cannot be rewritten to the new type
    without a compaction commit."""
    pf = _schema_fields(parent_json)
    nf = _schema_fields(new_json)
    clash = {k for k in pf.keys() & nf.keys() if pf[k] != nf[k]}
    if clash:
        raise SchemaEvolutionError(
            f"column type changed for {sorted(clash)} — rewrite via "
            "mode='overwrite' (or compact) instead"
        )
    missing = pf.keys() - nf.keys()
    extra = nf.keys() - pf.keys()
    if not merge and (missing or extra):
        raise SchemaEvolutionError(
            f"append schema differs from table schema (missing "
            f"{sorted(missing)}, new {sorted(extra)}); pass "
            "schema_mode='merge' to evolve the table"
        )
    if not extra:
        return parent_json
    parent = json.loads(parent_json)
    new_fields = {f["name"]: f for f in json.loads(new_json)["fields"]}
    for name in sorted(extra):
        f = dict(new_fields[name])
        f["nullable"] = True  # older files lack the column → NULL
        parent["fields"].append(f)
    return json.dumps(parent)


def snapshot_write(
    df,
    table_dir: str,
    *,
    mode: str = "append",
    txn: str | None = None,
    manifest: str = "full",
    checkpoint_every: int = 10,
    schema_mode: str = "strict",
    protocol=None,
) -> int | None:
    """Commit ``df`` as a new table version; returns the version number.

    ``append`` keeps the parent version's files and adds the new ones;
    ``overwrite`` replaces the logical content (old files stay on disk —
    still referenced by older manifests for time travel; vacuuming
    unreferenced files after a retention window is maintenance, same as
    any table format).

    ``txn``: an idempotence token (Delta's txn appId/version pattern).
    If any live manifest already records it, the write is a no-op
    returning None — this is what makes a REPLAYED streaming micro-batch
    commit exactly once (see snapshot_stream_sink). Tokens live as long
    as their manifests: vacuum retention must exceed the longest
    possible replay window, the same contract Delta documents.

    ``manifest="delta"`` (appends only): write ONLY the commit's added
    files + stats with a parent pointer instead of the complete file
    list — commit metadata cost drops from O(live files) to O(added
    files), the fix for the measured ~600 B/file full-manifest rewrite
    bound (SCALE.md) at streaming commit rates on 10⁵-file tables.
    Every ``checkpoint_every``-th version automatically writes a full
    manifest so reader resolution walks a bounded parent chain; readers
    (snapshot_read, vacuum, compact) resolve both forms transparently.

    ``schema_mode`` (appends; overwrite replaces the schema freely):
    ``"strict"`` (default) refuses any field-set or type difference
    against the table's current schema — the guard that used to be
    missing, letting mismatched appends commit and read back wrong;
    ``"merge"`` allows ADDING columns (recorded nullable; older files
    read them as NULL via the manifest-schema read path), refusing type
    changes. Each version's manifest keeps ITS OWN schema, so time
    travel returns each version with the schema it had.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if manifest not in ("full", "delta"):
        raise ValueError(f"manifest must be full|delta, got {manifest!r}")
    if schema_mode not in ("strict", "merge"):
        raise ValueError(f"schema_mode must be strict|merge, got {schema_mode!r}")
    # Validate before the data write: checkpoint_every=0 would raise
    # ZeroDivisionError inside the commit retry loop (after the parquet
    # files are on disk, orphaning them for vacuum), and a negative value
    # would silently disable checkpointing so delta chains grow unboundedly.
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    # Cheap pre-check so an obviously-replayed batch skips the data
    # write entirely; the AUTHORITATIVE check re-runs against the fresh
    # head inside build() on every commit retry (see _TxnAlreadyCommitted).
    if txn is not None and any(
        m.get("txn") == txn for m in snapshot_history(table_dir)
    ):
        return None
    # Schema pre-check against the CURRENT head before the data write
    # (same fail-fast rationale as checkpoint_every above: a clash found
    # inside the commit loop would orphan the already-written files).
    # The authoritative check re-runs against the fresh head in build().
    vs0 = _versions(table_dir)
    if mode == "append" and vs0:
        _merged_schema(
            _read_manifest(table_dir, vs0[-1])["schema"],
            df.schema.json(),
            merge=schema_mode == "merge",
        )
    commit_id = uuid.uuid4().hex[:12]
    out = _data_dir(table_dir) / f"commit-{commit_id}"
    df.write.format("parquet").mode("error").save(str(out))
    new_files = sorted(
        str(p.relative_to(table_dir))
        for p in out.rglob("*.parquet")
        if p.is_file()
    )
    new_stats = {
        f: _file_stats(str(pathlib.Path(table_dir) / f)) for f in new_files
    }
    schema_json = df.schema.json()

    def build(parent: dict | None) -> dict:
        if txn is not None and any(
            m.get("txn") == txn for m in snapshot_history(table_dir)
        ):
            raise _TxnAlreadyCommitted(txn)
        version = (parent["version"] + 1) if parent else 1
        # Authoritative schema check/merge against the OBSERVED head
        # (re-runs on every retry — a racing writer may have evolved
        # the schema between our pre-check and this commit attempt).
        if mode == "append" and parent is not None:
            version_schema = _merged_schema(
                parent["schema"],
                schema_json,
                merge=schema_mode == "merge",
            )
        else:
            version_schema = schema_json
        if (
            manifest == "delta"
            and mode == "append"
            and parent is not None
            and version % checkpoint_every != 0
        ):
            m = {
                "op": "append",
                "adds": new_files,
                "stats": new_stats,
                "schema": version_schema,
            }
        else:
            if mode == "append" and parent is not None:
                prev, rstats = _resolve(table_dir, parent["version"])
            else:
                prev, rstats = [], {}
            prev_stats = {f: s for f, s in rstats.items() if f in prev}
            m = {
                "op": mode,
                "files": prev + new_files,
                "stats": {**prev_stats, **new_stats},
                "schema": version_schema,
            }
        if txn is not None:
            m["txn"] = txn
        return m

    try:
        return _commit(table_dir, build, protocol=protocol)
    except _TxnAlreadyCommitted:
        # A same-token writer won the race mid-retry: this write is a
        # duplicate replay. The already-written data files are left for
        # vacuum to sweep (they are unreferenced by any manifest).
        return None


def snapshot_stream_sink(table_dir: str, *, query_name: str = "default"):
    """``foreachBatch`` function committing each micro-batch as a
    snapshot append — exactly-once end to end: the checkpoint replays a
    failed batch, and the replayed commit is deduplicated by its
    ``(query_name, batch_id)`` txn token, so a batch that committed but
    crashed before the checkpoint advanced does not double-append.

    Usage::

        (df.writeStream
           .foreachBatch(snapshot_stream_sink(table, query_name="gold"))
           .option("checkpointLocation", ckpt)
           .trigger(availableNow=True).start())
    """

    def sink(batch_df, batch_id: int) -> None:
        snapshot_write(
            batch_df, table_dir, txn=f"{query_name}:{batch_id}"
        )

    return sink


def _file_stats(abs_path: str) -> dict:
    """Per-file column min/max from the parquet FOOTER (no data read):
    {col: [min, max]} for primitive columns with footer statistics.
    JSON-portable types only (numbers/strings/bools); anything else is
    skipped, which only loses pruning opportunity, never correctness."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    lo: dict = {}
    hi: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            st = c.statistics
            if st is None or not st.has_min_max:
                continue
            name = c.path_in_schema
            try:
                mn, mx = st.min, st.max
            except Exception:
                # pyarrow cannot extract stats for every logical type
                # (e.g. DECIMAL raises ArrowNotImplementedError); a
                # commit must never fail over a pruning-only artifact.
                continue
            if isinstance(mn, bytes):
                continue
            if isinstance(mn, (datetime.datetime, datetime.date)):
                # ISO-8601 ordering matches temporal ordering, so the
                # lexicographic min/max fold below stays correct.
                mn, mx = mn.isoformat(), mx.isoformat()
            elif not isinstance(mn, (int, float, str, bool)):
                # Anything else (e.g. Decimal) would be folded
                # LEXICOGRAPHICALLY if stringified ('9.5' > '10.2'),
                # recording wrong bounds that make snapshot_read prune
                # intersecting files. Skipping only loses pruning
                # opportunity, never correctness.
                continue
            lo[name] = mn if name not in lo else min(lo[name], mn)
            hi[name] = mx if name not in hi else max(hi[name], mx)
    return {k: [lo[k], hi[k]] for k in lo}


def snapshot_read(
    spark,
    table_dir: str,
    *,
    version: int | None = None,
    prune: tuple[str, object, object] | None = None,
):
    """DataFrame over exactly the file set of ``version`` (default:
    latest). Older versions stay readable forever — time travel.

    ``prune=(col, lo, hi)``: data skipping — files whose manifest
    min/max range for ``col`` cannot intersect [lo, hi] are dropped
    BEFORE Spark ever lists or opens them (the manifest-statistics
    pruning Delta/Iceberg do; parquet row-group skipping still applies
    inside the surviving files). Pruning is a superset guarantee only —
    callers still apply the actual filter; files without recorded stats
    are always kept."""
    vs = _versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no snapshots in {table_dir}")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise FileNotFoundError(
            f"version {version} not in {table_dir} (have {vs})"
        )
    m = _read_manifest(table_dir, version)
    files, stats = _resolve(table_dir, version)
    if prune is not None:
        col, lo, hi = prune
        files = [
            f
            for f in files
            if (s := stats.get(f, {}).get(col)) is None
            or not (s[0] > hi or s[1] < lo)
        ]
    paths = [str(pathlib.Path(table_dir) / f) for f in files]
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(m["schema"]))
    if not paths:
        return spark.createDataFrame([], schema)
    # Read with the MANIFEST's schema, not footer inference: after a
    # merge-mode schema evolution the version's file set mixes widths,
    # and name-based parquet resolution fills absent columns with NULL
    # — each version reads back with exactly the schema it committed.
    return spark.read.schema(schema).parquet(*paths)


def snapshot_compact(
    spark,
    table_dir: str,
    *,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
) -> int:
    """OPTIMIZE as a snapshot commit: rewrite the CURRENT version's
    content into ~target_mb files (optionally range-clustered on
    ``sort_by`` — see maintenance.compact_parquet for why that tightens
    file-skipping bounds) and commit the compacted file set as a new
    version. Solves maintenance.py's caveat that plain-parquet
    compaction needs a caller-side atomic swap: here the swap IS the
    manifest commit, readers of older versions keep their original
    files, and a concurrent append that wins the race simply makes the
    compaction retry against the new head's content... which would
    silently drop that append's rows from the compacted rewrite (the
    rewrite read the OLD content), so unlike append this op does NOT
    auto-merge: if the head moved since the rewrite started, it raises
    SnapshotConflict for the caller to re-run — Delta's OPTIMIZE makes
    the same choice (concurrent-modification abort), because merging
    would require re-reading data inside the commit path.
    """
    import math

    vs = _versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no snapshots in {table_dir}")
    base_version = vs[-1]
    df = snapshot_read(spark, table_dir, version=base_version)
    m = _read_manifest(table_dir, base_version)
    base_files, _ = _resolve(table_dir, base_version)
    total_bytes = sum(
        (pathlib.Path(table_dir) / f).stat().st_size for f in base_files
    )
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        df = df.repartition(n_out)
    commit_id = uuid.uuid4().hex[:12]
    out = _data_dir(table_dir) / f"commit-{commit_id}"
    df.write.format("parquet").mode("error").save(str(out))
    new_files = sorted(
        str(p.relative_to(table_dir))
        for p in out.rglob("*.parquet")
        if p.is_file()
    )

    def build(parent: dict | None) -> dict:
        if parent is None or parent["version"] != base_version:
            raise SnapshotConflict(
                f"head moved during compaction of {table_dir} "
                f"(compacted v{base_version}, head is now "
                f"v{parent['version'] if parent else 0}) — re-run"
            )
        return {
            "op": f"compact:{base_version}",
            "files": new_files,
            "stats": {
                f: _file_stats(str(pathlib.Path(table_dir) / f))
                for f in new_files
            },
            "schema": m["schema"],
        }

    return _commit(table_dir, build)


def snapshot_rollback(table_dir: str, version: int) -> int:
    """Commit a NEW version whose content is ``version``'s file set
    (history is append-only — rollback never rewrites the log). Always
    a FULL manifest, so the rolled-back state is its own checkpoint."""
    m = _read_manifest(table_dir, version)
    files, stats = _resolve(table_dir, version)
    return _commit(
        table_dir,
        lambda parent: {
            "op": f"rollback:{version}",
            "files": files,
            "stats": stats,
            "schema": m["schema"],
        },
    )


def snapshot_vacuum(table_dir: str, *, keep_last: int = 7) -> dict:
    """Retention cleanup: drop manifests older than the newest
    ``keep_last`` versions, then delete data files no kept manifest
    references. Time travel shrinks to the retention window — the
    VACUUM trade every table format makes; run it only when no live
    reader can hold a pinned version older than the window (same
    operational contract as Delta's VACUUM retention check).

    Returns counts for observability. Deletion order matters for crash
    safety: manifests first (a crash after that leaves orphan data
    files, which the next vacuum sweeps), never the reverse (which
    could leave a manifest referencing deleted files)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = _versions(table_dir)
    keep = set(vs[-keep_last:])
    referenced: set[str] = set()
    for v in sorted(keep):
        files, _ = _resolve(table_dir, v)
        referenced.update(files)
        # A kept DELTA manifest resolves through its parent chain: those
        # manifests must survive too, or the kept version becomes
        # unreadable (the same reason Delta retains the checkpoint a
        # retained commit replays from).
        m = _read_manifest(table_dir, v)
        while "files" not in m:
            keep.add(m["parent"])
            m = _read_manifest(table_dir, m["parent"])
            keep.add(m["version"])
    drop = [v for v in vs if v not in keep]
    for v in drop:
        _manifest_path(table_dir, v).unlink()
    removed_files = 0
    data = _data_dir(table_dir)
    if data.is_dir():
        for p in sorted(data.rglob("*.parquet")):
            if str(p.relative_to(table_dir)) not in referenced:
                p.unlink()
                removed_files += 1
        # Sweep dead commit dirs so listings stay O(live commits). A
        # dir whose parquet set is entirely gone still holds Spark's
        # _SUCCESS marker (and any .crc sidecars) — those are metadata
        # of the now-dead commit, so remove them and the dir itself.
        for d in sorted(data.iterdir()):
            if not d.is_dir():
                continue
            if not any(d.rglob("*.parquet")):
                for leftover in sorted(
                    d.rglob("*"), key=lambda p: -len(p.parts)
                ):
                    leftover.unlink() if leftover.is_file() else (
                        leftover.rmdir()
                    )
                d.rmdir()
    return {
        "manifests_removed": len(drop),
        "files_removed": removed_files,
        "versions_kept": sorted(keep),
    }
