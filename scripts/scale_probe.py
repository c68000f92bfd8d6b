#!/usr/bin/env python3
"""Scale probe: synthetically inflate the sf0.1 fixtures N× (default
10× → ~6M lineitem rows) with key-shifted copies and run the heavy
query shapes — evidence that plans and runtimes scale linearly rather
than degrading (shuffle explosions, driver collects, quadratic joins
would all surface here).

Usage: python scripts/scale_probe.py [N]
Prints one JSON line: {"inflate": N, "rows": {...}, "seconds": {...}}.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from direct_kafka_stream_spark import get_session, load_table
from direct_kafka_stream_spark.exprs import dsum

SF_DIR = "/root/testdata/sf0.1"
SHIFT = 10_000_000_000


def inflate(df: DataFrame, n: int, key_cols: tuple[str, ...]) -> DataFrame:
    copies = []
    for i in range(n):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
        copies.append(c)
    return reduce(lambda a, b: a.unionByName(b), copies)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_session("scale-probe")

    li = inflate(load_table(spark, SF_DIR, "lineitem"), n, ("l_orderkey",))
    o = inflate(load_table(spark, SF_DIR, "orders"), n, ("o_orderkey",))
    c = load_table(spark, SF_DIR, "customer")
    nat = load_table(spark, SF_DIR, "nation")
    reg = load_table(spark, SF_DIR, "region")

    rows, secs = {}, {}

    def run(name, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        secs[name] = round(time.perf_counter() - t0, 2)

    rows["lineitem"] = li.count()

    # TPC-H Q1 shape: the pure aggregation throughput test
    run(
        "agg_group",
        li.groupBy("l_returnflag", "l_linestatus").agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        ),
    )

    # Q5-shape star join at inflated fact size
    run(
        "multiway",
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")),
    )

    # window (SCD-ish) over the inflated orders
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run(
        "window_lead",
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lead("o_orderdate").over(w).alias("nxt"),
        ),
    )

    # SRP-LSH index build over an inflated embedding corpus — the ANN
    # scale path must stay a zero-shuffle linear scan + tiny bucket agg
    from direct_kafka_stream_spark.operators.llm import _srp_bucket_col

    par = spark.sparkContext.defaultParallelism
    emb = inflate(load_table(spark, SF_DIR, "embeddings"), n, ("vec_id",)).repartition(
        par, "vec_id"
    )
    rows["embeddings"] = emb.count()
    run(
        "srp_index",
        emb.select("vec_id", _srp_bucket_col().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors")),
    )

    # Decontamination over an inflated document corpus — the eval-gram
    # broadcast stays fixed-size while the training side scales
    from direct_kafka_stream_spark.operators.llm2 import decontaminate

    docs = inflate(load_table(spark, SF_DIR, "documents"), n, ("doc_id",)).repartition(
        par, "doc_id"
    )
    rows["documents"] = docs.count()
    run("decontaminate", decontaminate(docs))

    # Round-3 shapes: hashed-linear quality scoring (one scan + one
    # doc-keyed agg, no join) over the inflated corpus
    from direct_kafka_stream_spark.operators.features import quality_scores

    run("quality_classifier", quality_scores(docs))

    # Round-4 shapes over an inflated event stream: the sweep-line
    # concurrency window must stay day-partitioned (bounded at 86400
    # rows/partition by the per-second pre-aggregation) and the DAU/MAU
    # explode fan-out must stay a plain day-keyed aggregation — both
    # would degrade into single-partition windows / nested-loop joins
    # if their rewrites regressed.
    from direct_kafka_stream_spark.operators.analytics5 import (
        concurrent_peak_report,
    )

    ev = inflate(
        load_table(spark, SF_DIR, "events"), n, ("event_id", "user_id")
    ).repartition(par, "event_id")
    rows["events"] = ev.count()
    run("concurrent_peak", concurrent_peak_report(ev))

    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    run(
        "dau_mau_coverage",
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 29))
            ).alias("day"),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("mau")),
    )

    # Bloom semi-join reduction at inflated fact size — the probe
    # predicate must keep the post-filter shuffle ~selectivity-sized
    # while the bloom build/broadcast stays fixed-size
    from direct_kafka_stream_spark.operators.analytics33 import (
        _BLOOM_CUTOFF,
        bloom_reduce_join,
    )

    dim = o.filter(F.col("o_orderdate") >= _BLOOM_CUTOFF).select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    run(
        "join_bloom",
        bloom_reduce_join(
            li.select("l_orderkey", "l_extendedprice", "l_discount"), dim
        ),
    )

    # TextRank at inflated corpus size — doc-keyed supersteps must
    # scale with documents, never build cross-document edges
    from direct_kafka_stream_spark.operators.analytics34 import textrank_on

    run("textrank_docs", textrank_on(docs))

    print(json.dumps({"inflate": n, "rows": rows, "seconds": secs}))


if __name__ == "__main__":
    main()
