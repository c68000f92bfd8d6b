"""TPC-H-shaped composite queries, third breadth pass (Q4, Q7, Q8,
Q9, Q11–Q16 selections, Q19, Q21 shapes adapted to the fixture
schema — no partsupp table, no l_shipmode/l_commitdate columns, so
each query keeps the classic plan shape while substituting available
columns).

Reference anchor: all user processing in the reference attaches at the
map/foreachRDD hook (KDS:43-51); these queries are the batch operator
algebra mandated by the extension surface (SURVEY.md §2.B).

Exactness: every money sum goes through the decimal-exact ``dsum``;
ratios divide two bit-identical doubles with identical expression
structure on both engines, then round to 6 dp; ``year()`` is cast to
INT on the DuckDB side (it returns BIGINT there, INT in Spark).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from direct_kafka_stream_spark.exprs import davg_sql, dsum, dsum_sql
from direct_kafka_stream_spark.io import load_table, spread_scan
from direct_kafka_stream_spark.registry import query

_VOL = "l_extendedprice * (1 - l_discount)"


def _vol() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_Q4_SQL = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
"""


@query("q_tpch_q4", oracle=_Q4_SQL, tags=("tpch", "subquery"))
def q_tpch_q4(spark: SparkSession, d: str):
    """TPC-H Q4 shape (order priority checking): orders in a window
    with at least one line shipped after the order date, counted by
    priority. The correlated EXISTS decorrelates to a left-semi join
    on l_orderkey — the fact side is pruned to two columns before the
    shuffle, so at 100 TB the semi join moves ~16 bytes/row, not the
    whole lineitem."""
    load_table(spark, d, "orders").createOrReplaceTempView("orders")
    load_table(spark, d, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q4_SQL)


_Q7_NATIONS = ("NATION_1", "NATION_2", "NATION_3")


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {dsum_sql('vol')} AS revenue
    FROM (
        SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               {_VOL} AS vol
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation n1   ON c.c_nationkey = n1.n_nationkey
        JOIN nation n2   ON s.s_nationkey = n2.n_nationkey
        WHERE n1.n_name IN {_Q7_NATIONS!r}
          AND n2.n_name IN {_Q7_NATIONS!r}
          AND n1.n_name <> n2.n_name
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                               AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join"),
)
def q_tpch_q7(spark: SparkSession, d: str):
    """TPC-H Q7 shape (volume shipping): bilateral trade volume
    between nation pairs by year. Two independent joins against the
    25-row nation dim both broadcast; the nation-name filters reach
    the dim scans, so only matching customers/suppliers survive into
    the fact join — at 100 TB the selective dims shrink the orders
    probe by ~22/25 before any fact shuffle."""
    li = load_table(spark, d, "lineitem")
    o = load_table(spark, d, "orders")
    c = load_table(spark, d, "customer")
    s = load_table(spark, d, "supplier")
    n = load_table(spark, d, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(*_Q7_NATIONS))
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(*_Q7_NATIONS))
    return (
        li.filter(
            F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(_vol()).alias("revenue"))
    )


_Q8_SHARE_NATIONS = ("NATION_5", "NATION_15")


@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           ROUND({dsum_sql('nat_vol')} / {dsum_sql('vol')}, 6) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               {_VOL} AS vol,
               CASE WHEN n2.n_name IN {_Q8_SHARE_NATIONS!r}
                    THEN {_VOL} ELSE 0.0 END AS nat_vol
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("tpch", "join"),
)
def q_tpch_q8(spark: SparkSession, d: str):
    """TPC-H Q8 shape (national market share): the supplier nations'
    share of PROMO-part volume sold into ASIA, by order year. A 7-table
    star: bounded dims (nation/region) carry explicit broadcast hints,
    SF-scaled ones (part/customer path) broadcast by threshold/AQE at
    this scale and shuffle at 100 TB; the two fact-side shuffles
    (lineitem⋈orders) carry only pruned columns. Share = conditional
    decimal sum / decimal sum, divided once in double — identical
    structure both engines, then rounded."""
    li = load_table(spark, d, "lineitem")
    o = load_table(spark, d, "orders")
    c = load_table(spark, d, "customer")
    s = load_table(spark, d, "supplier")
    n = load_table(spark, d, "nation")
    r = load_table(spark, d, "region")
    p = load_table(spark, d, "part").filter(F.col("p_type") == "PROMO")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    asia = r.filter(F.col("r_name") == "ASIA")
    vol = _vol()
    nat_vol = F.when(F.col("supp_nation").isin(*_Q8_SHARE_NATIONS), vol).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(asia), F.col("c_rk") == asia.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(dsum(nat_vol) / dsum(vol), 6).alias("mkt_share"),
        )
    )


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT nation, o_year, {dsum_sql('amount')} AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               {_VOL} - p.p_retailprice * l.l_quantity * 0.05 AS amount
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%e%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("tpch", "join"),
)
def q_tpch_q9(spark: SparkSession, d: str):
    """TPC-H Q9 shape (product-type profit): net margin per supplier
    nation per year (retail price × 5% standing in for the missing
    partsupp supplycost). Only the bounded nation dim carries an
    explicit broadcast HINT; part and supplier grow with SF, so their
    join strategy is left to the threshold + AQE (they broadcast at
    bench scale, shuffle at 100 TB — forcing the hint would OOM the
    build side there). The amount expression is left-assoc multiply
    both engines → bit-identical doubles into the exact decimal
    sum."""
    li = load_table(spark, d, "lineitem")
    s = load_table(spark, d, "supplier")
    p = load_table(spark, d, "part").filter(F.col("p_name").like("%e%"))
    o = load_table(spark, d, "orders")
    n = load_table(spark, d, "nation")
    amount = _vol() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.05)
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
    )


_Q11_SQL = f"""
    WITH supval AS (
        SELECT l_suppkey, {dsum_sql(_VOL)} AS val
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, val FROM supval
    WHERE val > (SELECT {dsum_sql(_VOL)} * 0.011 FROM lineitem)
"""


@query("q_tpch_q11", oracle=_Q11_SQL, tags=("tpch", "subquery"))
def q_tpch_q11(spark: SparkSession, d: str):
    """TPC-H Q11 shape (important stock): suppliers whose revenue
    exceeds a fixed fraction of the global total. The scalar subquery
    is an independent single-row aggregate that broadcasts into the
    per-supplier HAVING — two passes over lineitem but the second
    reads only two columns; the threshold compare happens on exact
    decimal-derived doubles so both engines agree at the boundary."""
    load_table(spark, d, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q11_SQL)


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    tags=("tpch", "join"),
)
def q_tpch_q12(spark: SparkSession, d: str):
    """TPC-H Q12 shape (shipping modes → line status): late-shipped
    lines pivoted into high/low-priority counts per status. The
    conditional-count pattern is one scan + one shuffle; both branch
    sums are map-side combinable ints."""
    o = load_table(spark, d, "orders")
    li = load_table(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "join"),
)
def q_tpch_q13(spark: SparkSession, d: str):
    """TPC-H Q13 (customer distribution): histogram of per-customer
    order counts, zero-order customers included via the outer join.
    Double aggregation where the second group-by input is one row per
    customer — AQE coalesces the tiny second shuffle. The join-side
    filter lives in the join condition (not WHERE) to preserve
    LEFT semantics."""
    c = load_table(spark, d, "customer")
    o = load_table(spark, d, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT ROUND(100.0 * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN " + _VOL + " ELSE 0.0 END")}
                 / {dsum_sql(_VOL)}, 6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-07-01'
    """,
    tags=("tpch", "join"),
)
def q_tpch_q14(spark: SparkSession, d: str):
    """TPC-H Q14 (promotion effect): PROMO share of revenue in a
    six-month window, as a single global row. Part broadcasts; the
    window filter is pushed to the lineitem scan (min/max row-group
    pruning at scale); 100.0*num/den is evaluated with the same
    associativity on both engines before the final round."""
    li = load_table(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    p = load_table(spark, d, "part")
    vol = _vol()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.lit(100.0) * dsum(promo) / dsum(vol), 6).alias("promo_revenue")
        )
    )


_Q15_SQL = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {dsum_sql(_VOL)} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
"""


@query("q_tpch_q15", oracle=_Q15_SQL, tags=("tpch", "subquery"))
def q_tpch_q15(spark: SparkSession, d: str):
    """TPC-H Q15 (top supplier): supplier(s) with max quarterly
    revenue via a CTE referenced twice (per-supplier agg + its max).
    Spark evaluates the CTE once per reference; both references are
    post-aggregation (≤ #suppliers rows) so the re-evaluation cost is
    nil next to the fact scan. Equality on decimal-exact revenue makes
    the tie-set identical across engines."""
    load_table(spark, d, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, d, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_Q15_SQL)


_Q16_SQL = """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 500
      )
    GROUP BY p_brand, p_type, p_size
"""


@query("q_tpch_q16", oracle=_Q16_SQL, tags=("tpch", "subquery"))
def q_tpch_q16(spark: SparkSession, d: str):
    """TPC-H Q16 shape (supplier relationship): distinct suppliers
    per brand/type/size excluding a NOT IN denylist (lineitem stands
    in for the missing partsupp). NOT IN over a non-null key plans as
    a broadcast null-aware anti join; COUNT(DISTINCT) expands to a
    two-phase partial/final aggregate, so the distinct shuffle carries
    (group, suppkey) pairs only."""
    load_table(spark, d, "part").createOrReplaceTempView("part")
    load_table(spark, d, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, d, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_Q16_SQL)


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines, {dsum_sql(_VOL)} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join"),
)
def q_tpch_q19(spark: SparkSession, d: str):
    """TPC-H Q19 (discounted revenue): disjunction of conjunctive
    brand/size/quantity branches across the join. Catalyst extracts
    the common l_quantity bounds (1..40) and p-side predicates
    (brand∈{1,2,3}) from the OR and pushes them below the join, so the
    broadcast build side holds only candidate parts — the classic
    Q19 optimizer test, for free."""
    li = load_table(spark, d, "lineitem")
    p = load_table(spark, d, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(_vol()).alias("revenue"),
        )
    )


_Q21_SQL = """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
"""


@query("q_tpch_q21", oracle=_Q21_SQL, tags=("tpch", "subquery"))
def q_tpch_q21(spark: SparkSession, d: str):
    """TPC-H Q21 shape (suppliers who kept waiting): per supplier, the
    late lines in finished multi-supplier orders where every other
    supplier shipped earlier (l_shipdate standing in for the missing
    commit/receipt dates). EXISTS → left-semi, NOT EXISTS → left-anti,
    both keyed on l_orderkey: three passes over lineitem but each
    pruned to ≤3 columns, and the semi/anti probes shuffle on the
    same key as the main join so AQE can chain them without a
    re-partition."""
    load_table(spark, d, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, d, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, d, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q21_SQL)


@query(
    "q_tpch_q6",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch",),
)
def q_tpch_q6(spark: SparkSession, d: str):
    """TPC-H Q6 (forecasting revenue change): the canonical
    scan-filter-aggregate — zero joins, zero shuffles past the partial
    aggregate. All three predicates push into the parquet scan
    (min/max row-group pruning on l_shipdate at scale); the plan is
    one codegen stage ending in a single-row exchange."""
    li = load_table(spark, d, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q2_SQL = """
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               l_extendedprice / l_quantity AS unit_price
        FROM lineitem
    ),
    mincost AS (
        SELECT l_partkey, MIN(unit_price) AS min_price
        FROM unit GROUP BY l_partkey
    )
    SELECT u.l_partkey, u.l_suppkey, s.s_name, u.unit_price
    FROM unit u
    JOIN mincost m ON u.l_partkey = m.l_partkey
                   AND u.unit_price = m.min_price
    JOIN supplier s ON s.s_suppkey = u.l_suppkey
"""


@query("q_tpch_q2", oracle=_Q2_SQL, tags=("tpch", "subquery"))
def q_tpch_q2(spark: SparkSession, d: str):
    """TPC-H Q2 shape (minimum-cost supplier): for every part, the
    supplier(s) offering its minimum observed unit price (lineitem
    standing in for the missing partsupp). The classic
    min-per-group-join-back decorrelation: one aggregate over the fact
    + an equi-join back on (partkey, price) — price equality is safe
    because both sides compute the identical double from identical
    inputs. Ties (two suppliers at the min) are all kept, same as the
    original Q2."""
    load_table(spark, d, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, d, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_Q2_SQL)


_Q20_SQL = f"""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        GROUP BY l_suppkey
        HAVING {dsum_sql('l_quantity')} > 100
    )
"""


@query("q_tpch_q20", oracle=_Q20_SQL, tags=("tpch", "subquery"))
def q_tpch_q20(spark: SparkSession, d: str):
    """TPC-H Q20 shape (potential part promotion): suppliers who
    shipped a large volume of 'small'-named parts — nested IN
    subqueries (part filter inside, grouped HAVING outside) that
    Catalyst flattens into two semi joins. The part-side IN prunes
    lineitem before the per-supplier aggregate; the decimal-exact
    HAVING threshold agrees across engines at the boundary."""
    load_table(spark, d, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, d, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, d, "part").createOrReplaceTempView("part")
    return spark.sql(_Q20_SQL)


_Q5_SQL = f"""
    SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
"""


@query("q_tpch_q5", oracle=_Q5_SQL, tags=("tpch", "join"))
def q_tpch_q5(spark: SparkSession, d: str):
    """TPC-H Q5 (local supplier volume): the classic 6-table star with
    the extra c_nationkey = s_nationkey equality that makes it a true
    snowflake cycle. Plan at scale: the o_orderdate filter pushes into
    the orders scan (partition pruning on a date-partitioned lake),
    orders⋈lineitem and customer⋈orders shuffle on their keys, while
    nation and region — fixed 25/5-row tables at ANY scale factor — are
    explicit broadcasts; supplier grows with SF so its join is left to
    AQE. The nationkey equality is applied as a post-join filter-cum-key
    so Catalyst folds it into the supplier join condition rather than a
    separate shuffle."""
    cust = load_table(spark, d, "customer")
    ords = load_table(spark, d, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, d, "lineitem")
    supp = load_table(spark, d, "supplier")
    nat = load_table(spark, d, "nation")
    reg = load_table(spark, d, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(_vol()).alias("revenue"))
    )


_Q17_SQL = f"""
    WITH pq AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum_sql('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11' AND p.p_type = 'ECONOMY'
      AND CAST(l.l_quantity AS BIGINT) * 5 * pq.cnt < pq.sum_qty
"""


@query("q_tpch_q17", oracle=_Q17_SQL, tags=("tpch", "subquery"))
def q_tpch_q17(spark: SparkSession, d: str):
    """TPC-H Q17 (small-quantity-order revenue): lines whose quantity
    is below 20% of the part's average. The correlated scalar subquery
    is written pre-decorrelated — a per-part aggregate joined back on
    l_partkey, exactly the plan Catalyst would produce — and the
    threshold ``l_quantity < 0.2 * avg(qty)`` is restated as pure
    int64 arithmetic ``qty * 5 * cnt < sum_qty`` (l_quantity is
    integer-valued in TPC-H), so the boundary row set is bit-identical
    across engines with no float average involved. At 100 TB both the
    aggregate and the probe shuffle on l_partkey — one exchange feeds
    both sides — and the brand/type-filtered part table shrinks ~1000×
    to an AQE runtime broadcast."""
    li = load_table(spark, d, "lineitem")
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    pt = load_table(spark, d, "part").filter(
        (F.col("p_brand") == "Brand#11") & (F.col("p_type") == "ECONOMY")
    )
    return (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .join(pq, "l_partkey")
        .filter(F.col("l_quantity").cast("long") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


_Q22_SQL = f"""
    WITH pos AS (
        SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS cents_sum,
               COUNT(*) AS n_pos
        FROM customer WHERE c_acctbal > 0.0
    ),
    cand AS (
        SELECT right(c_name, 1) AS cntrycode, c_acctbal
        FROM customer c CROSS JOIN pos
        WHERE right(c_name, 1) IN ('1', '3', '5', '7')
          AND CAST(ROUND(c_acctbal * 100) AS BIGINT) * n_pos > cents_sum
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    )
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {dsum_sql('c_acctbal')} AS totacctbal
    FROM cand
    GROUP BY cntrycode
"""


@query("q_tpch_q22", oracle=_Q22_SQL, tags=("tpch", "subquery"))
def q_tpch_q22(spark: SparkSession, d: str):
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no recent orders, grouped by "country code". Fixture
    adaptations that keep every plan feature: the country code is the
    trailing digit of c_name (no c_phone column); "no orders at all"
    becomes "no orders since 2000-01-01" (the fixture has only 2
    order-less customers — the date scope keeps the anti join
    non-trivial); and the AVG threshold is exact-integer — balances in
    cents, ``cents * n_pos > cents_sum`` — so no float average decides
    boundary membership. Plan: single-row global aggregate broadcast
    into the filter, date-filtered orders anti-joined on o_custkey
    (the only fact-sized shuffle), then a tiny regrouping. Identical
    SQL runs on both engines."""
    load_table(spark, d, "customer").createOrReplaceTempView("customer")
    load_table(spark, d, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q22_SQL)


_Q1_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
               AS sum_charge,
           ROUND({davg_sql('l_quantity')}, 6) AS avg_qty,
           ROUND({davg_sql('l_extendedprice')}, 6) AS avg_price,
           ROUND({davg_sql('l_discount')}, 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@query("q_tpch_q1", oracle=_Q1_SQL, tags=("tpch", "agg"))
def q_tpch_q1(spark: SparkSession, d: str):
    """TPC-H Q1 (pricing summary report) — completes the 22-query
    suite. The canonical scan→partial-agg→final-agg: the shipdate
    predicate pushes into the parquet scan (row-group min/max pruning
    at scale), the map-side combine collapses each input partition to
    at most 6 (returnflag, linestatus) rows, so the exchange carries
    ~6 rows per partition regardless of fact size — the textbook
    aggregate that survives 100 TB untouched. Money sums are
    decimal-exact (``dsum``); averages divide the exact decimal sum by
    the group count and round to 6 dp with identical expression
    structure on both engines. Same SQL string runs on Spark and the
    DuckDB oracle. Reference anchor: the aggregate-over-stream hook at
    KDS:43-51."""
    spread_scan(load_table(spark, d, "lineitem"), "l_orderkey").createOrReplaceTempView("lineitem")
    return spark.sql(_Q1_SQL)
