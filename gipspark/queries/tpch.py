"""Registry family: tpch (split from the single-file registry; query names and behavior unchanged)."""

from __future__ import annotations

from gipspark.queries._base import (  # noqa: F401
    DEC,
    F,
    Window,
    load,
    register,
)

@register(
    "q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as {DEC})) as double) AS sum_qty,
       cast(sum(cast(l_extendedprice as {DEC})) as double) AS sum_price,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_price"),
            F.count("*").alias("n_rows"),
        )
    )



@register(
    "q3_top_orders",
    # revenue in exact integer "cent·basis-point" units: price and
    # discount are 2dp doubles, so round(x*100) is an exact integer in
    # both engines; the product & sum stay integral (no decimal-cast of
    # computed doubles — Spark rounds those via shortest-string repr,
    # DuckDB via binary value, and they disagree at midpoints)
    """
SELECT o.o_orderkey,
       cast(sum(cast(round(l.l_extendedprice * 100) as bigint) * (100 - cast(round(l.l_discount * 100) as bigint))) as double) / 10000.0 AS revenue,
       cast(o.o_orderdate as date) AS odate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, odate
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
""",
)
def q3(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("odate"))
        .agg((F.sum(cents).cast("double") / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "revenue", "odate")
    )



@register(
    "q5_local_supplier_volume",
    # same exact-integer revenue units as q3; the c_nationkey =
    # s_nationkey predicate is TPC-H Q5's "local supplier" condition
    """
SELECT n.n_name,
       count(*) AS n_items,
       cast(sum(cast(round(l.l_extendedprice * 100) as bigint) * (100 - cast(round(l.l_discount * 100) as bigint))) as double) / 10000.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join, facts joined fact↔fact on their
    keys, dims broadcast. The plan Catalyst should pick (and
    explain_audit asserts): lineitem⋈orders⋈customer as shuffled joins
    on the big sides, supplier/nation/region folded in as broadcasts —
    the region filter prunes before any fact shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    dim = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
            F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
        )
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            dim,
            (F.col("l_suppkey") == dim.s_suppkey)
            & (F.col("c_nationkey") == dim.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(cents).cast("double") / F.lit(10000.0)).alias("revenue"),
        )
    )



@register(
    "q7_volume_shipping",
    # TPC-H Q7 shape: revenue flow between a nation pair, split by
    # direction and ship year; same exact-cents revenue units as q3/q5.
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       cast(year(l.l_shipdate) as int) AS l_year,
       cast(count(*) as bigint) AS n_items,
       cast(sum(cast(round(l.l_extendedprice * 100) as bigint) * (100 - cast(round(l.l_discount * 100) as bigint))) as double) / 10000.0 AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): bilateral revenue between a
    nation pair, split by flow direction and ship year — the
    disjunctive two-dim-filter join pattern Q5 doesn't cover (the OR
    across two broadcast dims means neither filter can prune a fact
    side alone; Catalyst pushes the disjunction into the two nation
    broadcasts and the facts shuffle once). Revenue in the repo's
    exact-cents bigint units, the /10000.0 the only double."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(
        F.count("*").cast("long").alias("n_items"),
        (F.sum(cents).cast("double") / 10000.0).alias("revenue"),
    )



@register(
    "q17_small_quantity_revenue",
    # TPC-H Q17 shape: revenue locked in small-quantity lineitems,
    # where "small" is 20% of the part's own average quantity. The
    # gate is cross-multiplied to integer ticks — 5·q·cnt < sum — so
    # the avg never materializes as a double.
    """
WITH pa AS (
  SELECT l_partkey,
         cast(sum(cast(round(l_quantity * 100) as bigint)) as bigint) AS sum_qt,
         cast(count(*) as bigint) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       cast(count(*) as bigint) AS n_items,
       cast(sum(cast(round(l.l_extendedprice * 100) as bigint)) as double) / 100.0 AS locked_revenue
FROM lineitem l
JOIN pa ON pa.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE 5 * cast(round(l.l_quantity * 100) as bigint) * pa.cnt < pa.sum_qt
GROUP BY p.p_brand
""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity revenue): lineitems whose
    quantity is under 20% of their part's own average — the
    aggregate-then-rejoin (decorrelated scalar subquery) pattern: the
    per-part average comes from a first hash-agg over the fact table
    that joins back onto the same fact. The threshold is
    cross-multiplied into integer ticks (5·q·cnt < Σq) so the average
    is never a double and the gate is exact; revenue uses the repo's
    cents-bigint units.

    Scale shape: two passes over lineitem sharing the l_partkey
    shuffle key (agg, then join) — Catalyst reuses the exchange;
    part is a broadcast dim."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    qt = F.round(F.col("l_quantity") * 100).cast("bigint")
    pa = li.groupBy("l_partkey").agg(
        F.sum(qt).cast("long").alias("sum_qt"), F.count("*").cast("long").alias("cnt")
    )
    j = (
        li.join(pa, "l_partkey")
        .filter(5 * qt * F.col("cnt") < F.col("sum_qt"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    return j.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_items"),
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).cast("double")
            / 100.0
        ).alias("locked_revenue"),
    )



@register(
    "q9_product_profit",
    # TPC-H Q9 shape (no partsupp table in the driver set: supply cost
    # is synthesized as retail price × quantity, same join tree):
    # profit per supplier nation per order year, all in exact 1e-4
    # ticks until the final /10000.0.
    """
SELECT n.n_name AS nation, cast(year(o.o_orderdate) as int) AS o_year,
       cast(count(*) as bigint) AS n_items,
       cast(sum(cast(round(l.l_extendedprice * 100) as bigint) * (100 - cast(round(l.l_discount * 100) as bigint))
                - cast(round(p.p_retailprice * 100) as bigint) * cast(round(l.l_quantity * 100) as bigint)) as double)
         / 10000.0 AS profit
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%re%'
GROUP BY nation, o_year
""",
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): the five-table join tree
    with a LIKE filter on the part dim and a derived measure combining
    columns from THREE tables (revenue from lineitem, cost from part ×
    lineitem) — the shape that exercises join reordering plus
    multi-table expression evaluation. Profit stays in exact 1e-4
    ticks (cents × percent) until one final division; the part LIKE
    filter prunes inside the broadcast dim before any fact shuffle."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%re%"))
    n = load(spark, sf_dir, "nation")
    rev = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    cost = F.round(F.col("p_retailprice") * 100).cast("bigint") * F.round(
        F.col("l_quantity") * 100
    ).cast("bigint")
    j = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return j.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.count("*").cast("long").alias("n_items"),
        (F.sum(rev - cost).cast("double") / 10000.0).alias("profit"),
    )



# ---------------------------------------------------------------------------
# round-4 batch A: TPC-H-shape relational widening (q4/q10/q12/q14/q19)
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    """
SELECT o_orderpriority, cast(count(*) as bigint) AS n_orders
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): quarter's orders with
    at least one lineitem shipped after the order date, counted by
    priority — the correlated-EXISTS-as-semi-join pattern. Spark plans
    the compound-condition semi join as one hash semi join on
    l_orderkey with the date comparison as a join residual; the fact
    table is filtered by the quarter BEFORE the join (pushed scan
    filter), so only one quarter of orders ever shuffles."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    hit = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )



@register(
    "q10_returned_items",
    """
WITH rev AS (
  SELECT c.c_custkey, c.c_name, n.n_name AS nation,
         sum(cast(round(l.l_extendedprice * 100) as bigint)
             * (100 - cast(round(l.l_discount * 100) as bigint))) AS rev_cents
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-04-01'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, nation
)
SELECT c_custkey, c_name, nation, cast(rev_cents as bigint) AS rev_cents,
       cast(rev_cents as double) / 10000.0 AS revenue
FROM rev ORDER BY rev_cents DESC, c_custkey LIMIT 20
""",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns in a quarter. Ordering happens on the EXACT
    cents bigint (never the display double), so the top-20 cut is
    deterministic across engines; the limit plans as
    TakeOrderedAndProject (per-partition top-k, no global sort). Fact
    side shuffles once; customer and nation broadcast."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("rev_cents"))
    )
    return (
        rev.orderBy(F.col("rev_cents").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "nation",
            F.col("rev_cents").cast("long").alias("rev_cents"),
            (F.col("rev_cents").cast("double") / 10000.0).alias("revenue"),
        )
    )



@register(
    "q12_ship_delay_priority",
    """
SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN 'fast'
            WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 90 THEN 'normal'
            ELSE 'slow' END AS delay_class,
       cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) as bigint) AS high_line_count,
       cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) as bigint) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY delay_class ORDER BY delay_class
""",
)
def q12_ship_delay_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipping modes / priority), reshaped onto this
    schema's columns: lineitems bucketed by ship delay (days between
    order and ship date — the schema has no shipmode column) and
    counted by urgent-vs-other priority, the two-way conditional-count
    pattern Q12 exists to test. Exact integer day arithmetic; one fact
    shuffle on the join key with AQE free to pick the build side."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    cls = (
        F.when(delay <= 30, F.lit("fast"))
        .when(delay <= 90, F.lit("normal"))
        .otherwise(F.lit("slow"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(cls.alias("delay_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("delay_class")
    )



@register(
    "q14_promo_revenue",
    """
WITH j AS (
  SELECT p.p_type,
         cast(round(l.l_extendedprice * 100) as bigint)
         * (100 - cast(round(l.l_discount * 100) as bigint)) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= DATE '1996-03-01' AND l.l_shipdate < DATE '1996-04-01'
)
SELECT cast(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) as bigint) AS promo_cents,
       cast(sum(cents) as bigint) AS total_cents,
       100.0 * cast(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) as double)
             / cast(sum(cents) as double) AS promo_pct
FROM j
""",
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): share of one month's revenue
    from PROMO-type parts. The part dim broadcasts; the month filter is
    a pushed scan predicate so only ~1/70th of lineitem leaves the
    scan. Moments are exact cents; the percentage is the single double,
    computed in the same textual order as the oracle."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    p = load(spark, sf_dir, "part")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_type", cents.alias("cents")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("cents")).otherwise(F.lit(0)))
    total = F.sum("cents")
    return j.agg(
        promo.cast("long").alias("promo_cents"),
        total.cast("long").alias("total_cents"),
        (F.lit(100.0) * promo.cast("double") / total.cast("double")).alias("promo_pct"),
    )



@register(
    "q19_discounted_revenue",
    """
SELECT cast(count(*) as bigint) AS n_items,
       cast(sum(cast(round(l.l_extendedprice * 100) as bigint)
                * (100 - cast(round(l.l_discount * 100) as bigint))) as bigint) AS rev_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20 AND l.l_quantity BETWEEN 10 AND 40)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 30 AND l.l_quantity BETWEEN 20 AND 50)
""",
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue): a disjunction of
    (brand, size-range, quantity-range) triples spanning BOTH join
    sides — the predicate Catalyst cannot fully push to either scan
    alone. Spark extracts the common join key as the hash condition and
    evaluates the OR as a join residual; the part dim broadcasts so the
    fact side still never shuffles. Exact-cents output."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    pred = (
        ((b == "Brand#1") & sz.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#2") & sz.between(5, 20) & q.between(10, 40))
        | ((b == "Brand#13") & sz.between(1, 30) & q.between(20, 50))
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(pred)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(cents).cast("long").alias("rev_cents"),
        )
    )



# ---------------------------------------------------------------------------
# round-4 batch B: TPC-H completion sweep (q2/q6/q8/q11/q13/q15/q16/q18/
# q20/q21/q22 shapes) — with q1/3/4/5/7/9/10/12/14/17/19 this closes the
# full 22-query relational surface. The testdata schema has no partsupp,
# c_phone, or l_receiptdate, so the four partsupp-family queries treat
# lineitem as the part-supplier offer catalog and q21/q22 use ship-delay /
# nation-key in place of receiptdate / phone prefix; every reshape keeps
# the plan shape the original query exists to exercise.
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    """
SELECT cast(count(*) as bigint) AS n_items,
       cast(sum(cast(round(l_extendedprice * 100) as bigint)
                * cast(round(l_discount * 100) as bigint)) as bigint) AS disc_rev
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape (forecast revenue change): scan-only conjunctive
    filter + single global agg, the canonical predicate-pushdown probe.
    All three predicates reach the parquet scan (PushedFilters on
    l_shipdate/l_discount/l_quantity); the agg is a partial+final pair
    with no shuffle beyond the 1-row exchange. Revenue in exact
    cents×pct integer units."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    disc = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        F.col("l_discount") * 100
    ).cast("bigint")
    return li.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(disc).cast("long").alias("disc_rev"),
    )



@register(
    "q13_customer_distribution",
    """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders, cast(count(*) as bigint) AS n_customers
FROM per_cust GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
""",
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join so zero-order customers survive with count 0, then a second
    agg over the first's output — the double-aggregation histogram
    pattern. First shuffle is on c_custkey (count(o_orderkey) skips the
    nulls the outer join manufactures); the histogram re-agg moves only
    |customers| rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )



@register(
    "q18_large_volume",
    """
WITH big AS (
  SELECT l_orderkey, sum(cast(l_quantity as bigint)) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(cast(l_quantity as bigint)) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_date, cast(b.total_qty as bigint) AS total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY total_qty DESC, o.o_orderkey LIMIT 20
""",
)
def q18_large_volume(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): HAVING-filtered fact
    aggregation drives the join — the big groupBy runs FIRST so only
    the ~1% of orders over the quantity threshold ever join orders/
    customer (both effectively dim-sized after that cut). l_quantity is
    integral-valued double; cast to bigint so the threshold and sums
    are exact. Top-20 plans as TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )



@register(
    "q15_top_supplier",
    """
WITH rev AS (
  SELECT l_suppkey,
         sum(cast(round(l_extendedprice * 100) as bigint)
             * (100 - cast(round(l_discount * 100) as bigint))) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, cast(r.rev_cents as bigint) AS rev_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev_cents = (SELECT max(rev_cents) FROM rev)
ORDER BY s.s_suppkey
""",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): argmax against a self-derived
    scalar — the view-reuse query. The quarter's per-supplier revenue
    aggregates once; the max is a 1-row agg of that SAME result
    broadcast back as a cross join, so the fact table is scanned once,
    not twice (Spark reuses the exchange). Exact-cents revenue makes
    the max/equality tie-proof."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    s = load(spark, sf_dir, "supplier")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("rev_cents"))
    mx = rev.agg(F.max("rev_cents").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("rev_cents").cast("long").alias("rev_cents"))
        .orderBy("s_suppkey")
    )



@register(
    "q2_min_cost_supplier",
    """
WITH offers AS (
  SELECT l.l_partkey, l.l_suppkey,
         min(cast(round(l.l_extendedprice * 100) as bigint)) AS offer_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY l.l_partkey, l.l_suppkey
), ranked AS (
  SELECT o.l_partkey, o.l_suppkey, o.offer_cents,
         row_number() OVER (PARTITION BY o.l_partkey
                            ORDER BY o.offer_cents, o.l_suppkey) AS rk
  FROM offers o
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
       cast(k.offer_cents as bigint) AS offer_cents
FROM ranked k
JOIN part p ON p.p_partkey = k.l_partkey
JOIN supplier s ON s.s_suppkey = k.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE k.rk = 1 AND p.p_size BETWEEN 10 AND 15 AND p.p_type = 'LARGE'
ORDER BY p.p_partkey
""",
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): cheapest regional offer
    per part — the correlated-min pattern, resolved here as one window
    rank instead of a rescan-the-subquery plan. The schema has no
    partsupp, so lineitem plays the offer catalog (min observed price
    per part×supplier). All dims broadcast; the only fact shuffle is
    the offers groupBy, and the window reuses that partitioning
    (partitionBy l_partkey ⊂ groupBy keys → no second exchange).
    Deterministic tie-break on (offer_cents, l_suppkey)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "LARGE")
    )
    offers = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("offer_cents"))
    )
    w = Window.partitionBy("l_partkey").orderBy("offer_cents", "l_suppkey")
    best = offers.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        best.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("offer_cents").cast("long").alias("offer_cents"),
        )
        .orderBy("p_partkey")
    )



@register(
    "q8_market_share",
    """
WITH rev AS (
  SELECT extract(year FROM o.o_orderdate) AS yr,
         cast(round(l.l_extendedprice * 100) as bigint)
         * (100 - cast(round(l.l_discount * 100) as bigint)) AS cents,
         s.s_nationkey AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE cn.n_regionkey = 2 AND p.p_type = 'ECONOMY'
)
SELECT cast(yr as int) AS o_year,
       cast(sum(CASE WHEN supp_nation = 7 THEN cents ELSE 0 END) as bigint) AS nation_cents,
       cast(sum(cents) as bigint) AS total_cents,
       cast(sum(CASE WHEN supp_nation = 7 THEN cents ELSE 0 END) as double)
         / cast(sum(cents) as double) AS mkt_share
FROM rev GROUP BY yr ORDER BY o_year
""",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): one nation's share of a
    region's yearly spend on one part type — the 6-table snowflake with
    a conditional-sum ratio. Everything but lineitem×orders broadcasts;
    the customer-region and part-type cuts apply before the yearly agg
    so the grouped input is already the market slice. Share is the one
    double division, computed identically both sides from exact-cents
    sums."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cn = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.year("o_orderdate").alias("yr"),
            cents.alias("cents"),
            F.col("s_nationkey").alias("supp_nation"),
        )
    )
    nat = F.sum(F.when(F.col("supp_nation") == 7, F.col("cents")).otherwise(F.lit(0)))
    tot = F.sum("cents")
    return (
        rev.groupBy(F.col("yr").cast("int").alias("o_year"))
        .agg(
            nat.cast("long").alias("nation_cents"),
            tot.cast("long").alias("total_cents"),
            (nat.cast("double") / tot.cast("double")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )



@register(
    "q11_important_stock",
    """
WITH val AS (
  SELECT l.l_partkey,
         sum(cast(round(l.l_extendedprice * 100) as bigint)
             * cast(l.l_quantity as bigint)) AS value_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_regionkey = 2
  GROUP BY l.l_partkey
)
SELECT l_partkey AS p_partkey, cast(value_cents as bigint) AS value_cents
FROM val
WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM val)
ORDER BY value_cents DESC, p_partkey
""",
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): parts whose
    regional inventory value exceeds a fraction of the regional total —
    the HAVING-against-global-scalar pattern. The threshold compare is
    value×1000 > total in pure int64 (no fractional boundary to drift
    on); the per-part agg computes once and the 1-row total broadcasts
    back over it, so the fact scan is single-pass."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    value = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.col(
        "l_quantity"
    ).cast("bigint")
    val = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("value_cents"))
    )
    total = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_cents").cast("long").alias("value_cents"),
        )
        .orderBy(F.col("value_cents").desc(), F.col("p_partkey"))
    )



@register(
    "q16_supplier_part_counts",
    """
SELECT p.p_brand, p.p_type, p.p_size,
       cast(count(DISTINCT l.l_suppkey) as bigint) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND s.s_acctbal >= 0
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape (part-supplier relationship counts): distinct
    suppliers per (brand, type, size) bucket with exclusion predicates
    on both dims — the count-distinct-after-snowflake pattern. Spark
    plans countDistinct as the two-level expand+agg, partials map-side;
    both dims broadcast and the negative-acctbal supplier cut stands in
    for Q16's complaints NOT-IN (no comment column in this schema)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0)
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )



@register(
    "q20_promo_part_suppliers",
    """
WITH shipped AS (
  SELECT l.l_suppkey, sum(cast(l.l_quantity as bigint)) AS promo_qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'PROMO'
    AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, n.n_name AS nation, cast(sh.promo_qty as bigint) AS promo_qty
FROM shipped sh
JOIN supplier s ON s.s_suppkey = sh.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE sh.promo_qty > 100 AND n.n_regionkey = 3
ORDER BY s.s_suppkey
""",
)
def q20_promo_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers who moved
    more than a threshold of a part class in a year, restricted to one
    region — the nested-semi-join query, planned here as agg-then-join
    (equivalent and one fact pass). Part/supplier/nation broadcast;
    the year filter is a pushed scan predicate; quantity sums are exact
    int64."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    shipped = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("promo_qty"))
        .filter(F.col("promo_qty") > 100)
    )
    return (
        shipped.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("promo_qty").cast("long").alias("promo_qty"),
        )
        .orderBy("s_suppkey")
    )



@register(
    "q21_late_sole_shippers",
    """
WITH per AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 60
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
), stats AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
  FROM per GROUP BY l_orderkey
)
SELECT s.s_name, cast(count(*) as bigint) AS numwait
FROM per p
JOIN stats st ON p.l_orderkey = st.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.late = 1 AND st.n_supp > 1 AND st.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s_name LIMIT 20
""",
)
def q21_late_sole_shippers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the sole
    late supplier in a multi-supplier finalized order. The original's
    EXISTS/NOT-EXISTS double correlation is rewritten as one
    (order, supplier) agg plus an order-level count — set-identical
    output, but two hash aggs instead of two correlated rescans of
    lineitem, which is the shape that survives a 10^12-row fact.
    Late = shipped >60 days after order date (schema has no
    receiptdate). Both aggs share the l_orderkey shuffle."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    late = F.max(
        F.when(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, 1).otherwise(0)
    ).alias("late")
    per = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(late)
    )
    stats = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    return (
        per.filter(F.col("late") == 1)
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )



@register(
    "q22_dormant_customers",
    """
WITH pos AS (
  SELECT cast(sum(cast(round(c_acctbal * 100) as bigint)) as bigint) AS sum_cents,
         cast(count(*) as bigint) AS n
  FROM customer WHERE c_acctbal > 0
), dormant AS (
  SELECT c.c_nationkey, c.c_acctbal
  FROM customer c, pos
  WHERE cast(round(c.c_acctbal * 100) as bigint) * pos.n > pos.sum_cents
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '2000-01-01')
)
SELECT c_nationkey, cast(count(*) as bigint) AS n_cust,
       cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS total_bal
FROM dormant GROUP BY c_nationkey ORDER BY c_nationkey
""",
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): above-average-
    balance customers with no recent orders (none since 2000 — every
    customer in this data has SOME order), grouped by nation (the
    schema has no phone prefix). The above-average test is
    integer-exact — cents×n > Σcents sidesteps the double-average
    boundary entirely — and the dormancy test is a left-anti join
    against date-filtered orders (never a per-row NOT EXISTS rescan;
    the date cut is a pushed scan predicate). Balance totals go through
    decimal(18,2) per the registry's money rule."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("sum_cents"), F.count(F.lit(1)).alias("n")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
    dormant = (
        c.join(F.broadcast(pos))
        .filter(cents * F.col("n") > F.col("sum_cents"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        dormant.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )

