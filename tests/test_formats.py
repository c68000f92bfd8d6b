"""Source/sink format parity (SURVEY.md §2.F): the same rows written
to ORC, CSV, and JSON and read back must equal the parquet original —
typed schema-on-read for the text formats, native columnar for ORC.
Avro is exercised only if the spark-avro package is present (it is not
bundled in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from direct_kafka_stream_spark.io import load_table

from tests.conftest import SF_DIR

_SCHEMA = "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp"


def _slice(spark):
    return (
        load_table(spark, SF_DIR, "orders")
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
        )
        .orderBy("o_orderkey")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_orc_roundtrip(spark, tmp_path):
    src = _slice(spark)
    src.write.mode("overwrite").orc(str(tmp_path / "orc"))
    back = spark.read.orc(str(tmp_path / "orc"))
    assert _rows(back) == _rows(src)


def test_csv_roundtrip_typed(spark, tmp_path):
    src = _slice(spark)
    (
        src.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(str(tmp_path / "csv"))
    )
    back = (
        spark.read.schema(_SCHEMA)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(str(tmp_path / "csv"))
    )
    assert _rows(back) == _rows(src)


def test_json_roundtrip_typed(spark, tmp_path):
    src = _slice(spark)
    (
        src.write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .json(str(tmp_path / "json"))
    )
    back = (
        spark.read.schema(_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .json(str(tmp_path / "json"))
    )
    assert _rows(back) == _rows(src)


def test_avro_roundtrip_if_available(spark, tmp_path):
    src = _slice(spark)
    try:
        src.write.mode("overwrite").format("avro").save(str(tmp_path / "avro"))
    except Exception:
        pytest.skip("spark-avro package not bundled in this container")
    back = spark.read.format("avro").load(str(tmp_path / "avro"))
    assert _rows(back) == _rows(src)


def test_text_source_roundtrip(spark, tmp_path):
    """Line-oriented text source/sink: one row per line on read, plus
    wholetext mode reading each file as a single document — the raw
    ingestion shape for unstructured corpora."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(~F.col("text").contains("\n"))
        .select("text")
        .limit(100)
    )
    out = str(tmp_path / "txt")
    docs.write.mode("overwrite").text(out)
    back = spark.read.text(out)
    assert _rows(back.select(F.col("value").alias("text"))) == _rows(docs)
    whole = spark.read.option("wholetext", "true").text(out)
    # every file collapses to one row; total content is preserved
    n_files = whole.count()
    assert n_files <= back.count()
    total = sum(len(r.value.split("\n")) for r in whole.collect())
    assert total == back.count()
