"""Connector-edge tests: S5 JDBC executed for real (Derby embedded,
ships inside Spark's jars/), and K1/K2/S1 Kafka assembly — reader and
writer option wiring asserted WITHOUT broker or kafka-sql jars, so the
only untested part of the Kafka path is the broker itself.

Reference analogues: Test03.java:37-49 (JDBC base_dic lookup),
FlinkSourceUtil.java:18-44 / FlinkSinkUtil.java:22-50 (Kafka I/O).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming.readwriter import DataStreamWriter

from realtime_data_warehouse_spark.sources.batch import jdbc_lookup
from realtime_data_warehouse_spark.sources.streams import kafka_string_source
from realtime_data_warehouse_spark.streaming.sinks import (
    kafka_dynamic_sink,
    kafka_sink,
)

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_lookup_derby_roundtrip(spark, tmp_path):
    """S5 — an actual spark.read.jdbc execution: write the base_dic
    lookup through the Derby embedded driver bundled with Spark, read
    it back via jdbc_lookup, and join it the way the reference joins
    base_dic (Test03.java:37-49). No external DB needed: Derby runs
    in-process against a file under tmp_path."""
    url = f"jdbc:derby:{tmp_path}/dicdb;create=true"
    dic = spark.createDataFrame(
        [("1001", "good"), ("1002", "mid"), ("1003", "bad")],
        "dic_code string, dic_name string",
    )
    dic.write.jdbc(url, "base_dic", mode="overwrite", properties=DERBY)

    got = jdbc_lookup(spark, url, "base_dic", properties=DERBY)
    assert [f.name for f in got.schema.fields] == ["DIC_CODE", "DIC_NAME"] or [
        f.name for f in got.schema.fields
    ] == ["dic_code", "dic_name"]
    rows = {tuple(r) for r in got.collect()}
    assert rows == {("1001", "good"), ("1002", "mid"), ("1003", "bad")}

    # and it broadcasts into a join like any other lookup DataFrame
    facts = spark.createDataFrame(
        [("c1", "1001"), ("c2", "1003")], "cid string, appraise string"
    )
    dic_n = got.toDF("dic_code", "dic_name")
    joined = facts.join(F.broadcast(dic_n), facts.appraise == dic_n.dic_code)
    assert {(r.cid, r.dic_name) for r in joined.collect()} == {
        ("c1", "good"),
        ("c2", "bad"),
    }


def test_jdbc_lookup_pushdown_via_dbtable_subquery(spark, tmp_path):
    """S5 — the JDBC source accepts a pushdown subquery as dbtable
    (how a 100 TB deployment avoids pulling a whole config DB)."""
    url = f"jdbc:derby:{tmp_path}/subq;create=true"
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(20)], "id int, name string"
    ).write.jdbc(url, "cfg", mode="overwrite", properties=DERBY)
    # Spark's JDBC writer quotes identifiers, so Derby stores them
    # case-sensitive lowercase — the pushdown subquery must quote too.
    got = jdbc_lookup(
        spark, url, '(SELECT "id", "name" FROM cfg WHERE "id" < 5) t', properties=DERBY
    )
    assert got.count() == 5


class _RecordingReader:
    """Stands in for spark.readStream: records format/options, serves
    a kafka-shaped static DF from load() so the downstream projection
    logic runs for real."""

    def __init__(self, spark):
        self._spark = spark
        self.fmt = None
        self.opts: dict[str, str] = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        return self._spark.createDataFrame(
            [("k1", b"payload")], "key string, value binary"
        )


def test_kafka_source_assembly(spark):
    """S1 — kafka_string_source wires subscribe/offsets/group onto the
    reader and projects value→string, asserted without kafka jars via
    a recording reader stub (the builder itself is what we own;
    everything after .load() runs on a real DataFrame)."""

    class _Stub:
        readStream = _RecordingReader(spark)

    stub = _Stub()
    out = kafka_string_source(stub, "broker:9092", "topic_log", group_id="g1")
    rec = stub.readStream
    assert rec.fmt == "kafka"
    assert rec.opts["kafka.bootstrap.servers"] == "broker:9092"
    assert rec.opts["subscribe"] == "topic_log"
    assert rec.opts["startingOffsets"] == "earliest"
    assert rec.opts["kafka.group.id"] == "g1"
    assert out.schema.simpleString() == "struct<value:string>"
    assert out.collect()[0].value == "payload"


@pytest.fixture()
def record_writer(monkeypatch):
    """Patch DataStreamWriter.format/option to record per-writer what
    the sink builders configure (the JVM calls still happen — kafka
    format isn't validated until start(), which we never call)."""
    recorded: dict[int, dict] = {}
    orig_format = DataStreamWriter.format
    orig_option = DataStreamWriter.option

    def format_(self, fmt):
        recorded.setdefault(id(self), {"options": {}})["format"] = fmt
        return orig_format(self, fmt)

    def option_(self, k, v):
        recorded.setdefault(id(self), {"options": {}})["options"][k] = v
        return orig_option(self, k, v)

    monkeypatch.setattr(DataStreamWriter, "format", format_)
    monkeypatch.setattr(DataStreamWriter, "option", option_)
    return recorded


def _rate(spark):
    return spark.readStream.format("rate").option("rowsPerSecond", "1").load()


def test_kafka_sink_assembly(spark, tmp_path, record_writer):
    """K1 — fixed-topic writer: format=kafka, brokers, topic and
    checkpointLocation all wired; value cast to string."""
    sdf = _rate(spark).select(F.col("value").cast("string").alias("value"))
    writer = kafka_sink(sdf, "broker:9092", "dwd_out", str(tmp_path / "ck"))
    assert isinstance(writer, DataStreamWriter)
    rec = record_writer[id(writer)]
    assert rec["format"] == "kafka"
    assert rec["options"]["kafka.bootstrap.servers"] == "broker:9092"
    assert rec["options"]["topic"] == "dwd_out"
    assert rec["options"]["checkpointLocation"] == str(tmp_path / "ck")


def test_kafka_dynamic_sink_assembly(spark, tmp_path, record_writer):
    """K2 — per-record routing: no fixed topic option; the stream
    itself carries (topic, value) columns, which is how Spark's Kafka
    sink does per-row topic selection natively."""
    sdf = _rate(spark).select(
        F.lit("t_a").alias("sink_table"), F.col("value").cast("string")
    )
    writer = kafka_dynamic_sink(sdf, "broker:9092", str(tmp_path / "ck"))
    rec = record_writer[id(writer)]
    assert rec["format"] == "kafka"
    assert "topic" not in rec["options"], "dynamic sink must not pin a topic"
    assert rec["options"]["kafka.bootstrap.servers"] == "broker:9092"
    assert rec["options"]["checkpointLocation"] == str(tmp_path / "ck")
