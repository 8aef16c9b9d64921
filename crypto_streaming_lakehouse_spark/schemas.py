"""Declared layer schemas (SURVEY.md §1.2).

Parity: /root/reference/spark/jobs/bronze_to_silver_trades.py:30-50 (bronze +
JSON payload), /root/reference/spark/jobs/kafka_to_bronze_trades.py:59-69
(bronze projection), /root/reference/spark/jobs/silver_to_gold_bars.py:52-66
(gold). Streaming file sources REQUIRE a declared schema; batch readers use
them to skip inference scans.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Bronze: one row per raw Kafka record, lineage columns + raw JSON payload.
BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("ts_kafka", T.TimestampType()),
        T.StructField("ts_type", T.IntegerType()),
        T.StructField("key", T.StringType()),
        T.StructField("value_raw", T.StringType()),
    ]
)

#: JSON trade payload carried in ``value_raw``.
TRADE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("exchange", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("size", T.DoubleType()),
        T.StructField("side", T.StringType()),
        T.StructField("order_type", T.StringType()),
        T.StructField("ts_event", T.LongType()),  # epoch ms
        T.StructField("ts_ingest", T.LongType()),  # epoch ms
    ]
)

#: Silver: bronze lineage + parsed payload + event-time columns.
SILVER_SCHEMA = T.StructType(
    list(BRONZE_SCHEMA.fields[:4])  # topic, partition, offset, ts_kafka
    + [
        T.StructField("key", T.StringType()),
        T.StructField("value_raw", T.StringType()),
        T.StructField("exchange", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("size", T.DoubleType()),
        T.StructField("side", T.StringType()),
        T.StructField("order_type", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("ingest_time", T.TimestampType()),
        T.StructField("event_date", T.DateType()),
    ]
)

#: Columns forming trade identity for dedup (feed has no trade id).
DEDUP_KEY = ["symbol", "event_time", "price", "size", "side"]

#: Gold: one row per (symbol, 1-minute window).
GOLD_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("bar_start", T.TimestampType()),
        T.StructField("bar_end", T.TimestampType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("vwap", T.DoubleType()),
        T.StructField("trades", T.LongType()),
        T.StructField("bar_date", T.DateType()),
    ]
)
