"""Scale-pattern tests: bucketed co-located joins, salting, offset
format migration — the mechanisms that keep the 100 TB plans
shuffle-minimal (SURVEY.md §4, BASELINE.md contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from direct_kafka_stream_spark import QUERIES
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.sources.kafka import (
    format_starting_offsets,
    parse_reference_offsets,
)

from tests.conftest import SF_DIR


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Pre-bucketing both join sides on the key makes the sort-merge
    join co-located: no Exchange in the plan. This is the zero-shuffle
    story for the lineitem⋈orders fact edge at 100 TB."""
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain(spark):
    """Salting must be a pure physical rewrite — values identical to
    the unsalted join."""
    salted = QUERIES["q_join_salted"].spark(spark, SF_DIR)
    plain = QUERIES["q_join_inner"].spark(spark, SF_DIR)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_offset_format_roundtrip():
    """Typed offsets → Kafka JSON; legacy reference CSV → typed offsets
    (migration shim for the reference's ZooKeeper format,
    reference README.md:146)."""
    legacy = "dilip:0:38100000,dilip:1:38200000,abhishek:0:5"
    typed = parse_reference_offsets(legacy)
    assert typed == {"dilip": {0: 38100000, 1: 38200000}, "abhishek": {0: 5}}
    js = format_starting_offsets(typed)
    assert js == '{"abhishek": {"0": 5}, "dilip": {"0": 38100000, "1": 38200000}}'
    assert format_starting_offsets("latest") == "latest"


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """Hive-style partitioned layout + a partition-key filter: the scan
    must prune to one partition directory (PartitionFilters in the
    plan), reading none of the others — the mechanism that turns a
    100 TB table scan into a 100 GB one."""
    out = str(tmp_path / "events_by_type")
    load_table(spark, SF_DIR, "events").write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]

    batch = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type") == "click"
    )
    assert df.count() == batch.count() > 0


def test_kafka_decode_kv_shape(spark):
    """R3/R4 parity without a broker: a Kafka-shaped frame (binary
    key/value + topic/partition/offset) through decode_kv must yield
    string key/value and, given a schema, typed columns parsed from
    the JSON payload (the reference's StringDecoder + map(_._2),
    KafkaDirectStream.scala:9,43,65-68 — plus the schema-on-read step
    its README says happened downstream)."""
    from pyspark.sql import functions as F

    from direct_kafka_stream_spark.sources.kafka import decode_kv

    raw = spark.createDataFrame(
        [
            (b"k1", b'{"user": 7, "amount": 1.5}', "dilip", 0, 100),
            (b"k2", b'{"user": 8, "amount": 2.5}', "abhishek", 1, 200),
        ],
        "key binary, value binary, topic string, partition int, offset long",
    ).withColumn("timestamp", F.current_timestamp())

    decoded = decode_kv(raw, value_schema="user long, amount double")
    rows = {r.key: r for r in decoded.collect()}
    assert rows["k1"].value == '{"user": 7, "amount": 1.5}'
    assert rows["k1"].parsed.user == 7 and rows["k2"].parsed.amount == 2.5
    assert rows["k2"].topic == "abhishek" and rows["k2"].offset == 200
