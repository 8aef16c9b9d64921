"""Python DataSource API (Spark 4): the JSONL connector round-trips a
fixture table through write → read with one partition per file, and the
reader honors declared schemas (the custom-connector contract any bespoke
feed format would use)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from crypto_streaming_lakehouse_spark.sources.jsonl import register_jsonl
from crypto_streaming_lakehouse_spark.sources.tables import load_table

from .conftest import SF_DIR


def _rowset(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_jsonl_roundtrip(spark, tmp_path):
    register_jsonl(spark)
    src = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    out = str(tmp_path / "events_jsonl")
    src.repartition(4).write.format("jsonl").option("path", out).mode(
        "append"
    ).save()

    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(files) == 4  # one file per partition (task-parallel write)

    back = (
        spark.read.format("jsonl")
        .schema("event_id long, event_type string, user_id long, value double")
        .option("path", out)
        .load()
    )
    # one reader partition per file — the split planning the API exists for
    assert back.rdd.getNumPartitions() == 4
    cols = ["event_id", "event_type", "user_id", "value"]
    assert _rowset(back, cols) == _rowset(src, cols)


def test_jsonl_reader_schema_projection_and_missing_fields(spark, tmp_path):
    register_jsonl(spark)
    path = str(tmp_path / "mixed")
    os.makedirs(path)
    with open(os.path.join(path, "a.jsonl"), "w") as fh:
        fh.write(json.dumps({"id": 1, "name": "x", "extra": 9}) + "\n")
        fh.write(json.dumps({"id": 2}) + "\n")  # missing field → NULL
        fh.write("\n")  # blank lines skipped
    got = (
        spark.read.format("jsonl")
        .schema("id long, name string")
        .option("path", path)
        .load()
    )
    rows = sorted((r["id"], r["name"]) for r in got.collect())
    assert rows == [(1, "x"), (2, None)]


def test_jsonl_filters_apply_after_read(spark, tmp_path):
    register_jsonl(spark)
    src = load_table(spark, SF_DIR, "events").select("event_id", "event_type")
    out = str(tmp_path / "ev")
    src.write.format("jsonl").option("path", out).mode("append").save()
    back = (
        spark.read.format("jsonl")
        .schema("event_id long, event_type string")
        .option("path", out)
        .load()
        .where(F.col("event_type") == "click")
    )
    want = src.where(F.col("event_type") == "click")
    assert back.count() == want.count()


def test_csv_and_text_formats_roundtrip(spark, tmp_path):
    """Format breadth beyond parquet/jsonl: CSV with header+schema and
    line-oriented text both round-trip through Spark's native readers —
    the cheap interchange formats an ingest edge actually receives."""
    src = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    csv_dir = str(tmp_path / "ev_csv")
    src.write.option("header", True).csv(csv_dir)
    back = (
        spark.read.option("header", True)
        .schema("event_id long, event_type string, value double")
        .csv(csv_dir)
    )
    cols = ["event_id", "event_type", "value"]
    assert _rowset(back, cols) == _rowset(src, cols)

    txt_dir = str(tmp_path / "ev_txt")
    src.select(
        F.concat_ws("|", "event_id", "event_type").alias("value")
    ).write.text(txt_dir)
    parsed = (
        spark.read.text(txt_dir)
        .select(F.split("value", r"\|").alias("p"))
        .select(
            F.col("p").getItem(0).cast("long").alias("event_id"),
            F.col("p").getItem(1).alias("event_type"),
        )
    )
    assert _rowset(parsed, ["event_id", "event_type"]) == _rowset(
        src, ["event_id", "event_type"]
    )


def test_jsonl_stream_incremental_offsets(spark, tmp_path):
    """Streaming read of the jsonl connector: first availableNow run
    consumes the existing files; a file appended later is picked up by a
    restart from the same checkpoint WITHOUT re-reading the old ones —
    the offset-in-checkpoint contract of a real streaming source."""
    import json

    src = tmp_path / "stream_src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows):
        p = src / name
        with open(p, "w", encoding="utf-8") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    write_file("a.jsonl", [{"k": "x", "v": 1}, {"k": "y", "v": 2}])
    write_file("b.jsonl", [{"k": "z", "v": 3}])

    register_jsonl(spark)
    schema = "k string, v long"

    def run_once():
        q = (
            spark.readStream.format("jsonl")
            .schema(schema)
            .option("path", str(src))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_once()
    first = {(r["k"], r["v"]) for r in spark.read.parquet(out).collect()}
    assert first == {("x", 1), ("y", 2), ("z", 3)}

    # Late arrival: only the new file's rows are appended on restart.
    write_file("c.jsonl", [{"k": "w", "v": 4}])
    run_once()
    final = [(r["k"], r["v"]) for r in spark.read.parquet(out).collect()]
    assert sorted(final) == [("w", 4), ("x", 1), ("y", 2), ("z", 3)]


def test_orc_format_roundtrip(spark, tmp_path):
    """ORC round-trip with predicate pushdown: the other columnar
    interchange format Spark ships natively. Writes sorted-by-type so
    ORC's per-stripe min/max indexes line up with the pushed filter."""
    src = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    orc_dir = str(tmp_path / "ev_orc")
    src.sortWithinPartitions("event_type").write.orc(orc_dir)
    back = spark.read.orc(orc_dir)
    cols = ["event_id", "event_type", "value"]
    assert _rowset(back, cols) == _rowset(src, cols)

    # filter pushdown reaches the ORC scan
    filtered = back.where(F.col("event_type") == "click")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "event_type" in plan
    assert filtered.count() == src.where(F.col("event_type") == "click").count()
