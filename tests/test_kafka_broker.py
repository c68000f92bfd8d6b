"""Real-broker Kafka integration: drives kafka_stream → decode_kv →
kafka_sink end-to-end against an actual broker — the full semantic of
the reference system (KafkaDirectStream.scala:57-109) as one
Structured-Streaming roundtrip.

Environment-gated: no broker (and no spark-sql-kafka connector jar)
ships in this sandbox, so the test skips unless
``SPARK_GRAFT_KAFKA_BOOTSTRAP`` points at a reachable broker AND the
session was launched with the connector, e.g.::

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 ...
    SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_broker.py

A testcontainers/redpanda single-node broker is sufficient. Everything
the test exercises below the source/sink boundary (offset formats,
decode projection, foreachBatch, checkpoint recovery) is covered
broker-free in tests/test_streaming.py via file/rate source doubles.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="no Kafka broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP=<host:port> "
    "(and launch Spark with the spark-sql-kafka connector package)",
)


def test_kafka_roundtrip_exactly_once(spark, tmp_path):
    from direct_kafka_stream_spark.sources.kafka import (
        decode_kv,
        kafka_sink,
        kafka_stream,
    )

    run = uuid.uuid4().hex[:8]
    topic_in, topic_out = f"graft_in_{run}", f"graft_out_{run}"
    payloads = {f'{{"n": {i}}}' for i in range(100)}

    # Seed the input topic with Spark's batch Kafka writer.
    (
        spark.createDataFrame(
            [(str(i), f'{{"n": {i}}}') for i in range(100)],
            "key string, value string",
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic_in)
        .save()
    )

    src = kafka_stream(spark, BOOTSTRAP, topic_in, starting_offsets="earliest")
    q = kafka_sink(
        decode_kv(src), BOOTSTRAP, topic_out, str(tmp_path / "ck"), "roundtrip"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic_out)
        .option("startingOffsets", "earliest")
        .load()
    )
    got = [bytes(r.value).decode() for r in back.select("value").collect()]
    assert set(got) >= payloads, "every seeded payload must arrive"
    assert len(got) == len(payloads), "checkpointed sink must not duplicate"
