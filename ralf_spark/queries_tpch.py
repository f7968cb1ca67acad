"""TPC-H query shapes Q2/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q20/Q21/Q22.

Completes the 22-query TPC-H relational surface (Q1/Q3/Q4/Q5/Q6/Q7/Q10/
Q14/Q18/Q19 live in ``ralf_spark.queries``). The driver fixtures are
TPC-H-ish, not TPC-H: there is no ``partsupp`` table and lineitem lacks
``l_commitdate``/``l_receiptdate``/``l_shipmode``; customer lacks
``c_phone``. Queries whose canonical text needs those columns are adapted
— the *plan shape* the query exercises (correlated min, scalar-subquery
threshold, exists/not-exists pair, left-join distribution, nested
semi-joins) is preserved and each adaptation is documented on the query.

Registered into the same ``QUERIES`` registry via the ``@query``
decorator; this module is imported for its side effects at the bottom of
``ralf_spark.queries``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ralf_spark.queries import _t, query


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@query(
    "q2_min_cost_supplier",
    """
    WITH link AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eligible AS (
      SELECT link.l_partkey, link.l_suppkey, link.unit_cost,
             s.s_name, s.s_acctbal, n.n_name
      FROM link
        JOIN supplier s ON s.s_suppkey = link.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ), ranked AS (
      SELECT e.*,
             row_number() OVER (PARTITION BY e.l_partkey
                                ORDER BY e.unit_cost, e.l_suppkey) AS rk
      FROM eligible e
      WHERE e.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_type = 'STANDARD' AND p_size <= 15)
    )
    SELECT p.p_partkey, p.p_name, rk.s_name, rk.n_name, rk.s_acctbal,
           floor(rk.unit_cost * 10000) / 10000.0 AS unit_cost
    FROM ranked rk JOIN part p ON p.p_partkey = rk.l_partkey
    WHERE rk.rk = 1
    ORDER BY rk.s_acctbal DESC, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted): cheapest regional supplier per part.

    No ``partsupp`` in the fixtures, so the part↔supplier offer list is
    derived from lineitem history (min observed unit price per
    (part, supplier)) — the correlated-MIN-subquery shape Q2 exercises is
    intact, decorrelated the way Catalyst would: aggregate → join →
    per-part rank. The rank replaces a float-equality join against the
    min (same winner, no cross-engine double-equality risk). Part filter
    is semi-joined *below* the window so only candidate parts rank.
    region/nation are bounded dims (broadcast-safe); the link aggregate
    shuffles on (partkey, suppkey) once.
    """
    li = _t(spark, sf_dir, "lineitem").df
    s = _t(spark, sf_dir, "supplier").df
    n = _t(spark, sf_dir, "nation").df
    r = _t(spark, sf_dir, "region").df.where(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").df.where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    link = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eligible = (
        link.join(s, link.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "l_suppkey", "unit_cost", "s_name",
                "s_acctbal", "n_name")
    )
    candidates = eligible.join(
        p.select("p_partkey"), eligible.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = candidates.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") == 1
    )
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .select(
            "p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
            # floor-truncate, not round: round(x, 4) straddles decimal
            # halfway points differently across engines on binary doubles
            # (observed: 26.24125 → 26.2412 Spark / 26.2413 DuckDB);
            # floor(x*1e4)/1e4 is pure IEEE mult+floor, identical in both.
            (F.floor(F.col("unit_cost") * 10000) / 10000.0).alias(
                "unit_cost"
            ),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(100)
    )


@query(
    "q8_market_share",
    """
    WITH all_sales AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                          ELSE 0 END) / sum(volume), 4) AS mkt_share
    FROM all_sales GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share inside a consuming region — the
    widest join tree in the suite (part, lineitem, supplier, orders,
    customer, nation×2, region). The two fact-fact joins shuffle on
    orderkey; nation/region carry bounded-dim broadcast hints; part and
    customer are filtered but sf-scaled, so the threshold + AQE decide
    their join strategy. Conditional-sum ratio = share per year."""
    p = _t(spark, sf_dir, "part").df.where(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem").df
    s = _t(spark, sf_dir, "supplier").df
    o = _t(spark, sf_dir, "orders").df.where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = _t(spark, sf_dir, "customer").df
    n1 = _t(spark, sf_dir, "nation").df.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = _t(spark, sf_dir, "nation").df.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = _t(spark, sf_dir, "region").df.where(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sales = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
            0.0
        )
    ) / F.sum("volume")
    return (
        sales.groupBy("o_year")
        .agg(F.round(share, 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS profit
    FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted): profit on a product line by supplier
    nation and year. No ``partsupp`` → no ``ps_supplycost`` term, so
    profit is gross revenue (the plan shape — substring part filter
    driving a 5-table join into a 2-key rollup — is what Q9 tests).
    The LIKE filter cannot push below the scan as a range, but column
    pruning still applies; unfiltered supplier/orders join on their keys.
    """
    li = _t(spark, sf_dir, "lineitem").df
    p = _t(spark, sf_dir, "part").df.where(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier").df
    o = _t(spark, sf_dir, "orders").df
    n = _t(spark, sf_dir, "nation").df
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_parts",
    """
    WITH natl AS (
      SELECT l.l_partkey, l.l_extendedprice AS val
      FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    )
    SELECT l_partkey, round(sum(val), 2) AS part_value
    FROM natl
    GROUP BY l_partkey
    HAVING sum(val) > (SELECT sum(val) * 0.001 FROM natl)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted): parts representing a significant share
    of one nation's traded value, with the threshold a scalar subquery
    over the same relation. ``partsupp`` value (supplycost×availqty) is
    replaced by lineitem traded value for that nation's suppliers.
    Scalar total = re-aggregation of the per-part sums (one extra
    1-row exchange, no second scan), broadcast back under the HAVING —
    exactly how Catalyst decorrelates the scalar subquery."""
    li = _t(spark, sf_dir, "lineitem").df
    s = _t(spark, sf_dir, "supplier").df
    n = _t(spark, sf_dir, "nation").df.where(F.col("n_name") == "NATION_3")
    natl = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_partkey", F.col("l_extendedprice").alias("val"))
    )
    per_part = natl.groupBy("l_partkey").agg(F.sum("val").alias("raw_value"))
    total = per_part.agg(
        (F.sum("raw_value") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("raw_value") > F.col("threshold"))
        .select(
            "l_partkey", F.round("raw_value", 2).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@query(
    "q12_shipping_lateness",
    """
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
                THEN 'late'
                WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                THEN 'slow'
                ELSE 'ontime' END AS ship_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY ship_bucket ORDER BY ship_bucket
    """,
)
def q12_shipping_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted): priority mix per shipping-delay class.
    The fixtures have no ``l_shipmode``/``l_commitdate``/``l_receiptdate``,
    so the grouping key is a derived lateness bucket (shipdate vs
    orderdate + 60/120 days) — the conditional-sum pivot over a
    join-derived key, which is what Q12 exercises, is unchanged. Orders'
    date filter pushes to its scan; one shuffle on the 3-value bucket."""
    o = _t(spark, sf_dir, "orders").df.where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").df
    joined = o.join(li, o.o_orderkey == li.l_orderkey)
    bucket = (
        F.when(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS"),
            "late",
        )
        .when(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            "slow",
        )
        .otherwise("ontime")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@query(
    "q13_customer_distribution",
    """
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over a filtered LEFT join — the
    canonical "customers with zero orders stay in" double aggregation.
    The comment NOT LIKE filter becomes a priority filter (fixtures have
    no o_comment); it must live in the join condition, not a WHERE, to
    preserve customers whose orders are all filtered away. Two shuffles:
    custkey (join+count), then the tiny c_count histogram."""
    c = _t(spark, sf_dir, "customer").df
    o = _t(spark, sf_dir, "orders").df.where(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) achieving the maximum quarterly revenue
    — a derived view consumed twice (per-supplier revenue, and its max as
    a scalar). The max is re-aggregated from the revenue relation and
    broadcast back (no second lineitem scan); equality is on the
    2dp-rounded revenue, computed identically on both sides."""
    li = _t(spark, sf_dir, "lineitem").df.where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    s = _t(spark, sf_dir, "supplier").df
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("best_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_part_supplier_variety",
    """
    WITH link AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT link.l_suppkey) AS supplier_cnt
    FROM link JOIN part p ON p.p_partkey = link.l_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 20, 25, 30, 40)
      AND link.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted): supplier variety per part attribute
    class, excluding a complained-about supplier set. The ``partsupp``
    link is derived from distinct lineitem (partkey, suppkey) pairs; the
    complaint filter (no s_comment in fixtures) becomes negative account
    balance. NOT IN → broadcast anti-join (the excluded set is tiny);
    distinct-count shuffles on the part-attribute key."""
    li = _t(spark, sf_dir, "lineitem").df
    p = _t(spark, sf_dir, "part").df.where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 25, 30, 40)
    )
    bad = _t(spark, sf_dir, "supplier").df.where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    link = li.select("l_partkey", "l_suppkey").distinct()
    return (
        link.join(
            F.broadcast(bad), link.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(p, link.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH avg_qty AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
      JOIN part p    ON p.p_partkey = l.l_partkey
      JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND p.p_type = 'SMALL'
      AND l.l_quantity < a.threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — a correlated
    per-part AVG subquery (p_container → p_type; fixtures have no
    container). Decorrelated as a window over the part-filtered join
    rather than a global per-part aggregate + re-join: after the
    selective brand/type filter only those parts' lineitems flow, the
    window partitions on partkey (same shuffle key as the join, reused),
    and each part's full lineitem history is present so the window AVG
    equals the correlated AVG. l_quantity is integral → the threshold is
    exact in both engines; no float-tolerance needed."""
    li = _t(spark, sf_dir, "lineitem").df
    p = _t(spark, sf_dir, "part").df.where(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "SMALL")
    )
    joined = li.join(p, li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    flt = joined.withColumn(
        "threshold", F.lit(0.2) * F.avg("l_quantity").over(w)
    ).where(F.col("l_quantity") < F.col("threshold"))
    return flt.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


@query(
    "q20_potential_promotion",
    """
    WITH qualifying AS (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'blue%')
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > 30
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_19'
      AND s.s_suppkey IN (SELECT l_suppkey FROM qualifying)
    ORDER BY s.s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers in one nation with excess
    volume of a product line — a nested IN→IN chain that must become
    semi-joins, never row-multiplying inner joins. availqty (partsupp)
    is replaced by shipped-quantity-per-(supplier, part) over a year
    exceeding a threshold; the part-name prefix filter and nation filter
    are as in the canonical query. Integral quantities → exact HAVING."""
    li = _t(spark, sf_dir, "lineitem").df.where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    p = _t(spark, sf_dir, "part").df.where(
        F.col("p_name").like("blue%")
    ).select("p_partkey")
    s = _t(spark, sf_dir, "supplier").df
    n = _t(spark, sf_dir, "nation").df.where(F.col("n_name") == "NATION_19")
    qualifying = (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 30)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
      JOIN supplier s ON s.s_suppkey = l1.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_18'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who alone held up multi-supplier orders — the
    EXISTS + NOT EXISTS pair. "Late" is shipdate > orderdate + 90 days
    (fixtures lack receipt/commit dates). EXISTS → left-semi on
    (orderkey, suppkey≠), NOT EXISTS → left-anti against the late set;
    both shuffle on orderkey only, and the anti side reuses the already-
    computed late relation instead of re-scanning lineitem."""
    li = _t(spark, sf_dir, "lineitem").df
    o = _t(spark, sf_dir, "orders").df.where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier").df
    n = _t(spark, sf_dir, "nation").df.where(F.col("n_name") == "NATION_18")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = late.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    l1 = (
        late.join(s, late.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
    )
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    return (
        waited.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "q22_global_sales_opportunity",
    """
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN (1, 5, 9, 13, 17, 21, 24)
    )
    SELECT e.c_nationkey AS nationkey,
           count(*) AS numcust,
           round(sum(e.c_acctbal), 2) AS totacctbal
    FROM eligible e
    WHERE e.c_acctbal > (SELECT avg(c_acctbal) FROM eligible
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY e.c_nationkey
    ORDER BY nationkey
    """,
)
def q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape (adapted): wealthy-but-inactive customers per
    geography. Phone-prefix country codes (no c_phone in fixtures) become
    a nationkey IN-list; "no orders at all" would be empty on the
    fixtures' dense order coverage, so inactivity = no urgent orders —
    the scalar-AVG threshold + anti-join structure is the canonical one.
    The scalar avg broadcasts; the anti-join shuffles on custkey."""
    c = _t(spark, sf_dir, "customer").df.where(
        F.col("c_nationkey").isin(1, 5, 9, 13, 17, 21, 24)
    )
    o = _t(spark, sf_dir, "orders").df.where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    thresh = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


# Registry finalization: re-applies the driver-prefix ordering when THIS
# module was the import entry point (circular-entry tolerance; no-op when
# ralf_spark.queries was imported first and has already finalized).
from ralf_spark.queries import finalize_registry as _finalize  # noqa: E402

_finalize()
