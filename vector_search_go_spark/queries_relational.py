"""Relational query pack over the TPC-H-ish tables.

The reference has no relational algebra (SURVEY.md section 2, "categories
with NO reference implementation") — this pack is the engine's
BASELINE-required analytics surface, built entirely on Spark SQL /
DataFrame operators: Catalyst picks broadcast vs sort-merge joins,
pushes filters into the parquet scan, and prunes columns. No custom
rules (SURVEY.md section 4).

Oracle-parity rules used throughout (see tools/check_correctness.py):
  - every computed column aliased identically on both sides;
  - double SUMs go through exact DECIMAL casts (testdata is 2dp), cast
    back to DOUBLE at the end — bit-identical regardless of add order;
  - AVG = CAST(decimal-sum AS DOUBLE) / COUNT so the division is one
    identical IEEE op;
  - no transcendentals (exp/ln/pow) in oracle-checked outputs — libm
    results differ by ulps across engines; sqrt is IEEE-exact, ok;
  - rollup/cube grouping nulls replaced via COALESCE sentinels;
  - deterministic ORDER BY tiebreaks anywhere a LIMIT binds.

Scale notes are on each query: which side broadcasts, where the
shuffles are, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_go_spark.io import table
from vector_search_go_spark.oracle.vector_sql import sql_fold_sum
from vector_search_go_spark.registry import register


def _dec_sum(col: str | F.Column, prec: str = "18,2"):
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec})")).cast("double")


# --------------------------------------------------------------------------
# Aggregation family
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + groupBy agg. Map-side partial
    aggregation keeps the shuffle tiny (6 groups) at any scale; the
    shipdate filter is pushed into the parquet scan."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    tax = F.lit(1) + F.col("l_tax").cast("decimal(4,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum("l_quantity").alias("sum_qty"),
        _dec_sum("l_extendedprice").alias("sum_base_price"),
        F.sum(price * disc).cast("double").alias("sum_disc_price"),
        F.sum(price * disc * tax).cast("double").alias("sum_charge"),
        (_dec_sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        (_dec_sum("l_extendedprice") / F.count(F.lit(1))).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand + two-phase agg under the hood)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; COALESCE sentinels avoid null-vs-null
    hashing ambiguity between engines."""
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum("o_totalprice").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
    )


@register(
    "agg_cube",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
       COALESCE(l_linestatus, 'ALL') AS lstatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), _dec_sum("l_quantity").alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
            "qty",
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (year(o_orderdate)))
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(CAST(year(o_orderdate) AS STRING), 'ALL') AS yr,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (year(o_orderdate)))
        """
    )


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered dim -> fact joins -> agg -> top-k.
    Customer (filtered) broadcasts; orders/lineitem join shuffles on
    orderkey — the natural co-partition key for both fact tables."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    return (
        li.join(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
            li.l_orderkey == o.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * disc).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        # parquet NTZ timestamp -> session-tz timestamp, matching the
        # oracle's TIMESTAMP type (values identical under UTC)
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    )


@register(
    "q5_region_revenue",
    oracle="""
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON r.r_regionkey = n.n_regionkey
JOIN customer c ON n.n_nationkey = c.c_nationkey
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
GROUP BY n.n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. region/nation/supplier are tiny
    dims at every scale -> broadcast; the only big shuffle is
    orders x lineitem on orderkey."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(price * disc).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + multi-predicate filter + global agg —
    the pushdown showcase (all three predicates reach the parquet scan)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking (fact filter +
    3 joins + agg + top-k)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(price * disc).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). The filter on orders is applied before
    the join, shrinking the build side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_nationkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers who never ordered."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


@register(
    "join_broadcast_dim",
    oracle="""
SELECT n.n_name, r.r_name, count(*) AS n_customers,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x broadcast-dim star join: zero shuffle on the fact side
    until the (tiny) final aggregation."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dec_sum("c_acctbal").alias("total_acctbal"),
        )
    )


@register(
    "join_outer",
    oracle="""
SELECT n.n_nationkey, n.n_name, COALESCE(s.cnt, 0) AS n_suppliers
FROM nation n
LEFT JOIN (SELECT s_nationkey, count(*) AS cnt FROM supplier GROUP BY s_nationkey) s
       ON n.n_nationkey = s.s_nationkey
""",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join with pre-aggregated right side (aggregate below
    the join = the scale-correct order)."""
    n = table(spark, sf_dir, "nation")
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return n.join(s, n.n_nationkey == s.s_nationkey, "left").select(
        "n_nationkey", "n_name", F.coalesce("cnt", F.lit(0)).alias("n_suppliers")
    )


# --------------------------------------------------------------------------
# Window family
# --------------------------------------------------------------------------


@register(
    "window_rank_orders",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
""",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — WindowGroupLimit applies the k-filter
    before the shuffle on Spark >= 3.5."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_running_sum",
    oracle="""
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)
         AS seq
FROM events
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user sum over the event stream (decimal accumulator so
    frame-evaluation order can't drift the hash)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(frame)
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT user_id, event_id, event_type,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --------------------------------------------------------------------------
# Sort / limit / set ops / dedup
# --------------------------------------------------------------------------


@register(
    "sort_limit_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 25
""",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Catalyst turns sort+limit into TakeOrderedAndProject
    (per-partition heap + driver merge — no full sort at any scale)."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(25)
    )


@register(
    "set_ops_nations",
    oracle="""
SELECT n_nationkey, 'both' AS src FROM (
  SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey FROM supplier)
UNION ALL
SELECT n_nationkey, 'customer_only' AS src FROM (
  SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
  EXCEPT
  SELECT DISTINCT s_nationkey FROM supplier)
""",
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one result."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    ).distinct()
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    ).distinct()
    both = c.intersect(s).withColumn("src", F.lit("both"))
    conly = c.exceptAll(s).withColumn("src", F.lit("customer_only"))
    return both.unionAll(conly)


@register(
    "dedup_distinct_rows",
    oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""",
)
def dedup_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact row dedup (dropDuplicates == hash-aggregate distinct)."""
    return table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).dropDuplicates()


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_u,
       lower(p_type) AS type_l,
       CAST(length(p_name) AS INT) AS name_len,
       substr(p_name, 1, 5) AS name_pfx,
       concat(p_brand, ':', p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_us,
       trim(p_name) AS name_trim,
       CAST(strpos(p_type, 'a') AS INT) AS a_pos,
       reverse(p_brand) AS brand_rev
FROM part
""",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.trim("p_name").alias("name_trim"),
        F.instr(F.col("p_type"), "a").alias("a_pos"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(day(o_orderdate) AS INT) AS dom,
       CAST(dayofweek(o_orderdate) AS INT) + 1 AS dow,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95
FROM orders
""",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DuckDB dayofweek: Sunday=0 -> +1 aligns with Spark's Sunday=1.
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .cast("timestamp")
        .alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )


@register(
    "scalar_math_funcs",
    oracle="""
SELECT o_orderkey,
       abs(o_totalprice) AS abs_price,
       CAST(floor(o_totalprice) AS DOUBLE) AS floor_price,
       CAST(ceil(o_totalprice) AS DOUBLE) AS ceil_price,
       sqrt(o_totalprice) AS sqrt_price,
       CAST(o_orderkey % 7 AS BIGINT) AS key_mod7,
       CAST(greatest(o_totalprice, 100000.0) AS DOUBLE) AS hi,
       CAST(least(o_totalprice, 100000.0) AS DOUBLE) AS lo,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS bucket
FROM orders
""",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.abs("o_totalprice").alias("abs_price"),
        F.floor("o_totalprice").cast("double").alias("floor_price"),
        F.ceil("o_totalprice").cast("double").alias("ceil_price"),
        F.sqrt("o_totalprice").alias("sqrt_price"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("hi"),
        F.least("o_totalprice", F.lit(100000.0)).alias("lo"),
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
       CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
FROM events
""",
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction on events.props (FIXTURES.md B3)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select("event_id", k.alias("k_val"), (k % 10).alias("k_bucket"))


@register(
    "scalar_array_funcs",
    oracle=f"""
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       {sql_fold_sum("list_transform(embedding[1:3], _x -> CAST(_x AS DOUBLE))")}
         AS head3_sum,
       CAST(embedding[1] AS DOUBLE) AS first_elem,
       CAST(len(list_filter(embedding, _x -> _x > 0)) AS INT) AS n_pos,
       {sql_fold_sum("list_transform(embedding, _x -> CAST(_x AS DOUBLE) * 2)")}
         AS doubled_sum
FROM embeddings WHERE vec_id < 50
""",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (slice/transform/filter/aggregate).

    Array-valued intermediates are reduced to scalar sums so the driver's
    canonicalizer (which cannot sort/hash array cells) gets scalar columns;
    the higher-order functions themselves are still in the plan."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    emb = F.col("embedding")
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, b: a + b)  # noqa: E731
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        fold(F.transform(F.slice(emb, 1, 3), lambda x: x.cast("double"))).alias(
            "head3_sum"
        ),
        F.element_at(emb, 1).cast("double").alias("first_elem"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        fold(F.transform(emb, lambda x: x.cast("double") * 2)).alias("doubled_sum"),
    )


@register(
    "pivot_event_types",
    oracle="""
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY user_id
""",
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (conditional aggregation) — one shuffle on user_id."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "time_bucket_events",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d %H') AS hour_bucket,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY strftime(ts, '%Y-%m-%d %H'), event_type
""",
)
def time_bucket_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregation (the batch shape of the
    streaming query in vector_search_go_spark.streaming)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd HH").alias("hour_bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum("value").alias("total_value"),
        )
    )


@register(
    "scalar_struct_map_funcs",
    oracle="""
SELECT p_partkey,
       struct_extract(struct_pack(brand := p_brand, sz := p_size), 'brand') AS s_brand,
       CAST(struct_extract(struct_pack(brand := p_brand, sz := p_size), 'sz') AS INT) AS s_size,
       (map(['brand', 'type'], [p_brand, p_type])['brand'])[1] AS m_brand,
       CAST(cardinality(map(['brand', 'type'], [p_brand, p_type])) AS INT) AS m_len
FROM part
""",
)
def scalar_struct_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map construction + field access (scalars out, so the hash
    comparison stays engine-portable)."""
    p = table(spark, sf_dir, "part")
    st = F.struct(F.col("p_brand").alias("brand"), F.col("p_size").alias("sz"))
    mp = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        st["brand"].alias("s_brand"),
        st["sz"].cast("int").alias("s_size"),
        F.element_at(mp, "brand").alias("m_brand"),
        F.size(mp).alias("m_len"),
    )


@register(
    "approx_aggregates",
    oracle="""
SELECT l_returnflag, count(*) AS n,
       TRUE AS parts_ok, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based approximate aggregates (HyperLogLog++ distinct
    counts, t-digest-ish percentiles) — the constant-memory answers a
    100 TB interactive layer serves. This registered entry runs
    ``approx_aggregates_plan(verdict=True)``; the PRODUCTION path is
    ``verdict=False`` — sketches only, no exact countDistinct or
    rank-validation join in the plan (VERDICT r4 item 6; plan-audited
    as op:approx_aggregates_default in PLANS.md).

    Sketch states differ across engines, so raw estimates can't be
    oracle-hashed; instead the verdict output carries DRIVER-CHECKABLE
    band verdicts computed against exact values inside Spark:
    ``parts_ok`` = HLL distinct within 5% of exact countDistinct (rsd
    is 2%), ``pXX_ok`` = the RANK of the approximate percentile value
    within 0.01 of the requested quantile (percentile_approx's actual
    contract is rank error <= 1/accuracy = 1e-4 — 100x margin). The
    oracle emits literal TRUE per group, so a hash match IS the
    tolerance-band check (VERDICT r3 item 5). Estimate-level accuracy
    additionally gated in tests/test_relational_extras.py."""
    return approx_aggregates_plan(spark, sf_dir, verdict=True)


def approx_aggregates_plan(
    spark: SparkSession, sf_dir: str, verdict: bool = False
) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    if not verdict:
        # the scale path: one aggregation pass, sketches only
        return li.groupBy("l_returnflag").agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            q.getItem(0).alias("p50"),
            q.getItem(1).alias("p95"),
            q.getItem(2).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
    ap = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        q.getItem(0).alias("p50"),
        q.getItem(1).alias("p95"),
        q.getItem(2).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )
    # rank of each approximate percentile value within its group
    ranked = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(ap), on="l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            *[
                (
                    F.sum((F.col("l_extendedprice") <= F.col(c)).cast("long"))
                    / F.count(F.lit(1))
                ).alias(f"rank_{c}")
                for c in ("p50", "p95", "p99")
            ]
        )
    )
    band = F.broadcast(ap).join(ranked, on="l_returnflag")
    ok = lambda c, tgt: (  # noqa: E731
        F.abs(F.col(f"rank_{c}") - F.lit(tgt)) <= 0.01
    ).alias(f"{c}_ok")
    return band.select(
        "l_returnflag",
        "n",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.05
        ).alias("parts_ok"),
        ok("p50", 0.5),
        ok("p95", 0.95),
        ok("p99", 0.99),
    )


@register(
    "scalar_conditional_funcs",
    oracle="""
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal = 0 THEN 'zero'
            ELSE 'credit' END AS bal_class,
       if(c_nationkey % 2 = 0, 'even', 'odd') AS nation_parity,
       CAST(c_acctbal > 5000 AS BOOLEAN) AS is_rich,
       CAST(trunc(c_acctbal) AS DOUBLE) AS bal_truncated
FROM customer
""",
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null-handling scalars: coalesce, nullif, case, if,
    boolean casts, numeric truncation."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_masked"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") == 0, "zero")
        .otherwise("credit")
        .alias("bal_class"),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias(
            "nation_parity"
        ),
        (F.col("c_acctbal") > 5000).alias("is_rich"),
        F.col("c_acctbal").cast("int").cast("double").alias("bal_truncated"),
    )


@register(
    "correlated_subquery_agg",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice > (
  SELECT 2 * (CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
""",
)
def correlated_subquery_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into an
    aggregate + join — no per-row re-scan)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > (
          SELECT 2 * (CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "join_skew_salted",
    oracle="""
SELECT s.s_nationkey, count(*) AS n_items,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join (operators.skew.salted_join): the small
    side is replicated n_salt times, the big side salts its key from
    its own rows, and the equi-join on (key, salt) spreads any hot
    suppkey over n_salt reducers instead of one straggler task. The
    result is row-for-row identical to the plain join (the oracle IS
    the plain join), which is the whole point: salting changes the
    shuffle layout, never the answer. DECIMAL sum keeps the aggregate
    order-independent so the comparison is bit-exact."""
    from vector_search_go_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    return (
        salted_join(li, s, on="l_suppkey", n_salt=8)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dec_sum("l_extendedprice").alias("total_price"),
        )
    )


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join over bucketed tables (io.write_bucketed): both
    sides are persisted bucketed+sorted on the join key with the same
    bucket count, so the sort-merge join reads buckets directly — no
    Exchange on either side (plan property pinned in
    tests/test_bucketing.py with broadcast disabled). At 100 TB this is
    the difference between re-shuffling the fact table on every join
    and paying the partition layout once at write time."""
    from vector_search_go_spark.io import write_bucketed

    write_bucketed(
        table(spark, sf_dir, "orders"), "orders_colo", "o_orderkey", 8, "o_orderkey"
    )
    write_bucketed(
        table(spark, sf_dir, "lineitem"),
        "lineitem_colo",
        "l_orderkey",
        8,
        "l_orderkey",
    )
    o = spark.table("orders_colo")
    li = spark.table("lineitem_colo")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dec_sum("l_extendedprice").alias("total_price"),
        )
    )
