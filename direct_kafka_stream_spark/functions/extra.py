"""Second function sweep: regex, boolean/string aggregation,
distribution window functions, map explode, array set algebra, inline
VALUES — rounding out the scalar/aggregate surface beyond
functions/scalar.py and functions/collections.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

from direct_kafka_stream_spark.io import load_table, spread_scan
from direct_kafka_stream_spark.registry import query


@query(
    "q_str_regex",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           regexp_matches(p_name, '[a-z]+ [a-z]+')     AS two_words,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word
    FROM part
    """,
    tags=("functions", "regex"),
)
def q_str_regex(spark: SparkSession, d: str):
    """Regex surface. Dialect note: Spark regexp_replace is global by
    default, DuckDB needs the 'g' flag; both use RE2-ish syntax for
    the classes used here."""
    p = load_table(spark, d, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.col("p_name").rlike("[a-z]+ [a-z]+").alias("two_words"),
        F.regexp_count(F.col("p_name"), F.lit("[aeiou]")).alias("n_vowels"),
        F.regexp_extract("p_name", "([a-z]+) ([a-z]+)", 2).alias("second_word"),
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity < 55)  AS all_small,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           COUNT(*) FILTER (WHERE l_tax > 0.05) AS n_taxed
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q_agg_bool(spark: SparkSession, d: str):
    li = load_table(spark, d, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") < 55).alias("all_small"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count(F.when(F.col("l_tax") > 0.05, 1)).alias("n_taxed"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n_name,
           string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
           COUNT(*) AS n
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("agg",),
)
def q_string_agg(spark: SparkSession, d: str):
    """Ordered string aggregation — collect_list is unordered in a
    distributed engine, so determinism comes from sort_array before
    the join (same contract as the oracle's ORDER BY inside
    string_agg)."""
    s = load_table(spark, d, "supplier")
    n = load_table(spark, d, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias("suppliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_win_dist",
    oracle="""
    SELECT event_id, user_id, value,
           round(CUME_DIST() OVER w, 6) AS cd,
           NTH_VALUE(value, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS second_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def q_win_dist(spark: SparkSession, d: str):
    """Distribution window functions: cume_dist over a total order,
    nth_value with a pinned full-partition frame."""
    e = load_table(spark, d, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("value", 2).over(full).alias("second_value"),
    )


@query(
    "q_map_explode",
    oracle="""
    SELECT event_id, k, CAST(json_extract(props, '$.' || k) AS INTEGER) AS v
    FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
    """,
    tags=("functions", "map"),
)
def q_map_explode(spark: SparkSession, d: str):
    """Map → rows: explode a MapType column into (key, value) pairs
    (the JSON payload's schema-on-read, fully dynamic — no schema
    declared for the keys)."""
    e = load_table(spark, d, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select("event_id", F.explode(m).alias("k", "v"))


@query(
    "q_array_setops",
    oracle="""
    SELECT vec_id,
           COALESCE(array_to_string(list_sort(list_distinct(list_concat(
               [vec_id % 10, vec_id % 7, vec_id % 3],
               [vec_id % 5, vec_id % 10]))), ','), '') AS u,
           COALESCE(array_to_string(list_sort(list_distinct(list_intersect(
               [vec_id % 10, vec_id % 7, vec_id % 3],
               [vec_id % 5, vec_id % 10]))), ','), '') AS i,
           COALESCE(array_to_string(list_sort(list_distinct(list_filter(
               [vec_id % 10, vec_id % 7, vec_id % 3],
               x -> NOT list_contains([vec_id % 5, vec_id % 10], x)))), ','), '')
               AS x
    FROM embeddings
    """,
    tags=("functions", "array"),
)
def q_array_setops(spark: SparkSession, d: str):
    """Array set algebra (union/intersect/except), normalized with
    sort+distinct on both engines so set semantics — not element
    order — is what's compared; final columns are CSV-joined scalar
    strings (driver canon can't sort array cells)."""
    e = load_table(spark, d, "embeddings")
    a = F.array(F.col("vec_id") % 10, F.col("vec_id") % 7, F.col("vec_id") % 3)
    b = F.array(F.col("vec_id") % 5, F.col("vec_id") % 10)

    def joined(c):
        return F.array_join(F.transform(c, lambda x: x.cast("string")), ",")

    return e.select(
        "vec_id",
        joined(F.sort_array(F.array_distinct(F.array_union(a, b)))).alias("u"),
        joined(F.sort_array(F.array_distinct(F.array_intersect(a, b)))).alias("i"),
        joined(F.sort_array(F.array_distinct(F.array_except(a, b)))).alias("x"),
    )


_VALUES_SQL = """
    SELECT v.label, COUNT(*) AS n
    FROM lineitem
    JOIN (VALUES ('A', 'returned'), ('R', 'returned'), ('N', 'kept'))
         AS v(flag, label)
      ON l_returnflag = v.flag
    GROUP BY v.label
"""


@query("q_values_join", oracle=_VALUES_SQL, tags=("join",))
def q_values_join(spark: SparkSession, d: str):
    """Inline VALUES relation joined to a fact table — tiny literal
    dims belong in the query, broadcast for free (shared SQL dialect)."""
    load_table(spark, d, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_VALUES_SQL)


@query(
    "q_csv_roundtrip",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus FROM orders",
    tags=("format", "csv"),
)
def q_csv_roundtrip(spark: SparkSession, d: str):
    """CSV codec round-trip inside the plan: rows → to_csv lines →
    from_csv back to typed columns (the schema-on-read path a CSV
    landing zone would run, minus the FS). Restricted to long/string
    columns so serialization is lossless; the oracle is the identity
    projection. Both codecs are JVM-side Catalyst expressions — one
    codegen stage, no shuffle."""
    o = load_table(spark, d, "orders")
    line = F.to_csv(F.struct("o_orderkey", "o_custkey", "o_orderstatus"))
    return (
        o.select(line.alias("line"))
        .select(
            F.from_csv(
                "line", "o_orderkey long, o_custkey long, o_orderstatus string"
            ).alias("r")
        )
        .select("r.*")
    )


@query(
    "q_json_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(json_extract(j, '$.event_id') AS BIGINT) AS parsed_id
    FROM (
        SELECT event_id, user_id, event_type,
               to_json(struct_pack(event_id := event_id,
                                   user_id := user_id,
                                   event_type := event_type)) AS j
        FROM events
    )
    """,
    tags=("format", "json"),
)
def q_json_roundtrip(spark: SparkSession, d: str):
    """JSON codec round-trip: struct → to_json document → extraction
    path pulls a typed field back out (the events.props pattern run in
    reverse). Field order in the serialized document follows struct
    declaration order in both engines; extraction result is cast to
    BIGINT on both sides."""
    e = spread_scan(load_table(spark, d, "events"), "event_id")
    j = F.to_json(F.struct("event_id", "user_id", "event_type"))
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.get_json_object(j, "$.event_id").cast("long").alias("parsed_id"),
    )


@query(
    "q_union_byname",
    oracle="""
    SELECT o_orderkey, 'price' AS src, o_totalprice, NULL AS o_orderstatus
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL BY NAME
    SELECT o_orderkey, o_orderstatus, 'status' AS src,
           NULL AS o_totalprice
    FROM orders WHERE o_orderkey % 2 = 1
    """,
    tags=("setop",),
)
def q_union_byname(spark: SparkSession, d: str):
    """Schema-evolution union: two relations with different column
    sets/orders combined BY NAME, absent columns null-filled — how a
    pipeline unions last month's parquet (old schema) with today's
    (new columns) without positional breakage."""
    o = load_table(spark, d, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.lit("price").alias("src"), "o_totalprice"
    )
    b = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", F.lit("status").alias("src")
    )
    return a.unionByName(b, allowMissingColumns=True)


@query(
    "q_xml_roundtrip",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus FROM orders",
    tags=("format", "xml"),
)
def q_xml_roundtrip(spark: SparkSession, d: str):
    """XML codec round-trip inside the plan (Spark 4 to_xml/from_xml
    Catalyst expressions): rows → XML documents → schema-on-read back
    to typed columns — the landing-zone path for the XML feeds that
    still dominate finance/healthcare interchange. Long/string columns
    only, so serialization is lossless and the oracle is the identity
    projection (DuckDB never sees XML — the round-trip IS the
    engine-side property under test, same contract as
    q_csv_roundtrip). One codegen stage, no shuffle."""
    o = spread_scan(load_table(spark, d, "orders"), "o_orderkey")
    doc = F.to_xml(
        F.struct("o_orderkey", "o_custkey", "o_orderstatus"),
        {"rowTag": "order"},
    )
    return (
        o.select(doc.alias("doc"))
        .select(
            F.from_xml(
                "doc",
                "o_orderkey long, o_custkey long, o_orderstatus string",
                {"rowTag": "order"},
            ).alias("r")
        )
        .select("r.*")
    )
