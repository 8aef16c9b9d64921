"""Z-order layout: per-file footer statistics must be selective on BOTH
clustering dimensions (the property that makes parquet row-group /
file skipping work), unlike a single-column sort which leaves the second
dimension spanning its whole domain in every file."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from crypto_streaming_lakehouse_spark.sources.tables import load_table
from crypto_streaming_lakehouse_spark.sources.zorder import (
    bucketize,
    write_zordered,
    z_value,
)

SF = "/root/testdata/sf0.001"


def _file_spans(path: str, col: str) -> list[float]:
    """Normalized (min, max) span of ``col`` per parquet file."""
    import glob

    spans, g_lo, g_hi = [], None, None
    per_file = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.read_metadata(f)
        lo = min(
            md.row_group(i).column(
                next(
                    j
                    for j in range(md.row_group(i).num_columns)
                    if md.row_group(i).column(j).path_in_schema == col
                )
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(
                next(
                    j
                    for j in range(md.row_group(i).num_columns)
                    if md.row_group(i).column(j).path_in_schema == col
                )
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        per_file.append((lo, hi))
        g_lo = lo if g_lo is None else min(g_lo, lo)
        g_hi = hi if g_hi is None else max(g_hi, hi)
    rng = (g_hi - g_lo) or 1
    for lo, hi in per_file:
        spans.append((hi - lo) / rng)
    return spans


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t_us"), "value"
    )
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"),
        F.max("user_id") + 1,
        F.min("t_us"),
        F.max("t_us") + 1,
    ).first()
    base = tmp_path_factory.mktemp("zorder")
    zpath = str(base / "z")
    spath = str(base / "sorted_u")
    write_zordered(
        ev,
        zpath,
        za=bucketize(F.col("user_id"), lo_u, hi_u),
        zb=bucketize(F.col("t_us"), lo_t, hi_t),
        files=8,
    )
    # contrast layout: single-column range sort on user_id only
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    return ev, zpath, spath


def test_zorder_roundtrip_exact(spark, layouts):
    ev, zpath, _ = layouts
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    # value-exact: same event_id multiset
    assert (
        back.select(F.sum(F.hash("event_id", "user_id"))).first()[0]
        == ev.select(F.sum(F.hash("event_id", "user_id"))).first()[0]
    )


def test_zorder_files_are_rectangles(spark, layouts):
    _, zpath, spath = layouts
    zu = _file_spans(zpath, "user_id")
    zt = _file_spans(zpath, "t_us")
    su = _file_spans(spath, "user_id")
    st = _file_spans(spath, "t_us")
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    # Single-column sort: tight on the sorted dim, useless on the other.
    assert mean(su) < 0.35
    assert mean(st) > 0.8
    # Z-order: BOTH dims substantially narrower than the full domain —
    # every file is a bounded rectangle, so min/max skipping works for
    # predicates on either column.
    assert mean(zu) < 0.6
    assert mean(zt) < 0.6
    # And the second dimension is far better clustered than under the
    # single-column layout.
    assert mean(zt) < mean(st) - 0.2
