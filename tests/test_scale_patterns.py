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


def test_dynamic_partition_pruning_via_dim_filter(spark, tmp_path):
    """Dynamic partition pruning: the fact carries NO literal partition
    filter — the prune keys come from a joined dimension filtered on a
    NON-join column, so only runtime evaluation of the dim can name
    the partitions (a filter on the join key itself would be folded
    into a static prune by constraint propagation — Catalyst does that
    for free, verified while writing this test). At 100 TB DPP is what
    keeps star joins from scanning every fact partition when only the
    dim knows the selection."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "events_part")
    load_table(spark, SF_DIR, "events").write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(out)

    confs = {
        # tiny test tables fail DPP's is-it-worth-it heuristics; force
        # the decision so the MECHANISM is pinned
        "spark.sql.optimizer.dynamicPartitionPruning.useStats": "false",
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio": "10.0",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.read.parquet(out)
        dim = spark.createDataFrame(
            [("click", 1), ("view", 0), ("purchase", 0), ("signup", 0), ("error", 0)],
            "event_type string, keep int",
        ).filter(F.col("keep") == 1)
        j = fact.join(dim, "event_type")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "dynamicpruning" in plan.lower(), "expected DPP subquery in scan"
        want = (
            load_table(spark, SF_DIR, "events")
            .filter(F.col("event_type") == "click")
            .count()
        )
        assert j.count() == want > 0
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observation_metrics_on_batch_query(spark):
    """df.observe(): row-level counters collected DURING execution (no
    second pass) — the batch sibling of streaming progress metrics.
    The pattern for production data-quality gates: count nulls/invalid
    rows in the same job that transforms them."""
    from pyspark.sql import Observation, functions as F

    obs = Observation("quality")
    li = load_table(spark, SF_DIR, "lineitem")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_discount") > 0.08, 1).otherwise(0)).alias("n_high_disc"),
    )
    n_out = observed.filter(F.col("l_quantity") > 25).count()
    m = obs.get
    assert m["n_rows"] == li.count()
    assert 0 <= m["n_high_disc"] <= m["n_rows"]
    assert n_out > 0


def test_range_partitioned_sorted_write_layout(spark, tmp_path):
    """The sorted-layout write pattern: repartitionByRange(key) +
    sortWithinPartitions(key) produces files whose key ranges do not
    overlap — the layout that lets parquet row-group min/max stats
    prune a 100 TB scan down to the files containing the predicate
    range. Verified by reading back per-file min/max."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "orders_sorted")
    (
        load_table(spark, SF_DIR, "orders")
        .repartitionByRange(4, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    per_file = (
        spark.read.parquet(out)
        .select("o_orderkey", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling — the runtime answer to hot keys that
    salting solves statically: a shuffle join where one key carries
    most of the rows must get its oversized partition split (the plan
    records skew=true) instead of funneling onto one task. Thresholds
    are lowered to fixture scale; broadcast is disabled so the join
    actually shuffles."""
    from pyspark.sql import functions as F

    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 4 != 0, F.lit(0))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 97).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        # global (not same-key) aggregate downstream: a groupBy on the
        # join key would require the join's co-partitioning and make
        # AQE decline the split without forceOptimizeSkewedJoin
        joined = left.join(right, "k").agg(F.sum("payload").alias("s"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
