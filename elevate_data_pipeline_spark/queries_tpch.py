"""Extended TPC-H-style queries over the synthetic star schema.

The testdata lacks ``partsupp`` and lineitem's commit/receipt dates and
ship-mode/instruction columns, so q2/q11/q12/q20/q21 are not
expressible as written (q19 is adapted to brand/size/quantity brackets); this module covers the remaining join-heavy
shapes — two-sided nation self-joins (q7/q8), group-then-regroup (q13),
promo share ratios (q14), scalar-subquery max (q15), and a correlated
scalar subquery decorrelated into a grouped join (q17) — each with an
exact DuckDB oracle (decimal-cast sums, single IEEE double division;
see queries.py module docstring for the exactness rules).

Filters are adapted to the synthetic value domains (``NATION_*`` names,
single-word ``p_type``, 1995-2001 dates) — semantics match the TPC-H
shapes, constants don't.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import query
from .sources.catalog import Catalog


def _rev():
    """Exact decimal revenue: price * (1 - discount), factor-cast."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


@query(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INTEGER)
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H q7 shape: bilateral trade volume between two nations by ship
    year. Both nation sides and supplier/customer are broadcast; only
    lineitem|><|orders shuffles. Reference has no multi-way joins beyond
    the config-driven fold (SURVEY.md §2.3 J1/J2); this extends that
    surface with a self-join on the dimension."""
    cat = Catalog(spark, sf_dir)
    n = cat.table("nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    s = cat.table("supplier")
    c = cat.table("customer")
    l = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = cat.table("orders")
    return (
        l.join(F.broadcast(s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))),
               F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))),
              F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    f"""
    WITH flat AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             {_REV_SQL} AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H q8 shape: NATION_5's share of ECONOMY-part revenue sold into
    the AMERICA market, by order year. Ratio of two exact decimal sums,
    one double division. All dimensions broadcast."""
    cat = Catalog(spark, sf_dir)
    p = cat.table("part").filter(F.col("p_type") == "ECONOMY")
    s = cat.table("supplier")
    n1 = cat.table("nation")
    n2 = cat.table("nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = cat.table("region").filter(F.col("r_name") == "AMERICA")
    c = cat.table("customer")
    o = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = cat.table("lineitem")
    vol = _rev()
    promo = F.when(F.col("nation") == "NATION_5", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                c.join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
                .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
                .select("c_custkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(s.join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(promo).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
        )
    )


@query(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           c.c_acctbal AS c_acctbal, n.n_name AS n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H q10: top-20 customers by revenue lost to returns in a
    quarter. Tie-broken on c_custkey so the top-20 set is deterministic
    across engines."""
    cat = Catalog(spark, sf_dir)
    c = cat.table("customer")
    n = cat.table("nation")
    o = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = cat.table("lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) po
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H q13: distribution of per-customer order counts (non-urgent
    only), including zero-order customers via the left join. Group-then-
    regroup: the second aggregation keys on the first's output."""
    cat = Catalog(spark, sf_dir)
    c = cat.table("customer")
    o = cat.table("orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q14_promo_effect",
    f"""
    SELECT 100.0 * (
             CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
             / CAST(sum({_REV_SQL}) AS DOUBLE)
           ) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-12-01 00:00:00'
    """,
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H q14: PROMO-part share of one quarter's revenue. Conditional
    decimal sum over a broadcast part join; 100.0 * (a/b) written with
    the identical expression tree on both engines."""
    cat = Catalog(spark, sf_dir)
    p = cat.table("part").select("p_partkey", "p_type")
    l = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-12-01").cast("timestamp"))
    )
    vol = _rev()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * (F.sum(promo).cast("double") / F.sum(vol).cast("double"))).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum({_REV_SQL}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_revenue AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H q15: supplier(s) with max quarterly revenue. The scalar
    subquery max becomes agg-to-scalar + broadcast equality join on the
    per-supplier revenue frame — ties kept like the equality predicate.
    ``localCheckpoint`` materializes the (small) aggregate once so the
    max branch doesn't rescan lineitem; unlike a rank-1 global window
    this never moves the full supplier frame to one partition (at 100 TB
    the supplier aggregate is millions of rows — window-rank there is
    the single-partition trap; max-to-scalar is a 1-row reduce)."""
    cat = Catalog(spark, sf_dir)
    l = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    top = (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .drop("_mx")
    )
    s = cat.table("supplier")
    return (
        F.broadcast(top)
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H q17: revenue from below-20%-of-average-quantity lineitems of
    one brand. The correlated scalar subquery (per-part avg quantity) is
    decorrelated into groupBy(l_partkey) + join — and the brand filter is
    applied BEFORE the average via a broadcast semi-reduction, so the
    per-part aggregate runs on ~5% of lineitem instead of all of it
    (correct because the subquery correlates on partkey only, and only
    Brand#3 partkeys survive the outer join). Avg is an exact decimal
    sum over a bigint count; the 0.2 * avg threshold is the identical
    double expression on both engines."""
    cat = Catalog(spark, sf_dir)
    p = cat.table("part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    l = cat.table("lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    brand_li = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    avgs = brand_li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        brand_li.join(F.broadcast(avgs), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q9_product_profit",
    f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum({_REV_SQL}
                    - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))
                ) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INTEGER)
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H q9 shape: profit on red parts by supplier nation and order
    year. The testdata has no partsupp, so unit cost is p_retailprice
    (same join/agg shape, different cost source). Revenue and cost stay
    decimal until the final cast; part/supplier/nation broadcast."""
    cat = Catalog(spark, sf_dir)
    p = cat.table("part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = cat.table("supplier").select("s_suppkey", "s_nationkey")
    n = cat.table("nation")
    o = cat.table("orders").select("o_orderkey", "o_orderdate")
    l = cat.table("lineitem")
    profit = _rev() - F.col("p_retailprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "q22_idle_rich_customers",
    """
    SELECT n.n_name AS n_name,
           count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
            FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
              AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          )
    GROUP BY n.n_name
    """,
)
def q22_idle_rich_customers(spark, sf_dir):
    """TPC-H q22 shape: above-average-balance customers with no urgent
    1997 orders, by nation. The scalar avg subquery is a 1-row broadcast
    cross join (exact decimal sum, one double division); NOT EXISTS is a
    left_anti join against the filtered orders projection. Adapted from
    the phone-prefix filter (no phone column in testdata) to an
    order-priority window."""
    cat = Catalog(spark, sf_dir)
    c = cat.table("customer")
    n = cat.table("nation")
    avg_df = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    urgent97 = (
        cat.table("orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent97, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q19_bracket_revenue",
    f"""
    SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_bracket_revenue(spark, sf_dir):
    """TPC-H q19 shape: revenue over an OR of three (brand, size,
    quantity) brackets. Adapted to the synthetic columns (no
    p_container/l_shipmode in testdata — SURVEY.md §2.3 notes the
    reference has no theta joins at all, so this is new surface). The
    plan trick: the disjunction's part-side envelope (brand IN the three
    brands, size <= 15) and lineitem-side envelope (quantity <= 30) are
    factored out and pushed into the parquet scans, so the broadcast
    hash join runs on ~1/8 of each input; the exact three-way
    disjunction then filters join output rows."""
    cat = Catalog(spark, sf_dir)
    p = (
        cat.table("part")
        .filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#4")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    l = (
        cat.table("lineitem")
        .filter((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )
