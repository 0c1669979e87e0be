"""Registry queries: relational_events (split from registry.py, round 14).

POSITION-CONTIGUOUS slice of the original registry.py — import
order of the registry_queries modules IS the driver-contract
registration order; do not reorder. Body lines are verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from trendmachine_spark import oracle_sql as osql

from trendmachine_spark.registry_core import (
    _docs,
    _embeddings,
    _table,
    register,
)

from trendmachine_spark.registry_queries.captures import (
    _dense,
)



# ------------------------------------------------------- relational / TPC-H


def _cents(col: str) -> "F.Column":
    """Exact integer cents from a nonnegative 2-decimal DOUBLE column,
    fully primitive: (x*100 + 0.5)::long.

    r14 (guide §4.1/§1.2): the previous `(col.cast(decimal(_,2)) *
    100).cast(long)` allocated a BigDecimal per row per column —
    measured 0.98 vs 0.76 s on the 600k-row per-order grouped sum at
    sf0.1 (tools/exp_cents_primitive.py). Equivalence to the decimal
    HALF_UP cast needs two facts, both checked on the real data:
    (1) every value is a 2-decimal quantum (so x*100 in double lands
    within +-0.5 ulp-scaled of the true integer and floor(x*100+0.5)
    recovers it exactly; a >=3-decimal value like 1.005 would round
    differently) and (2) every value is nonnegative (cast-to-long
    truncates toward zero = floor only for positives; decimal HALF_UP
    rounds away from zero). Verified: 0 mismatches across all of
    lineitem at sf0.001/sf0.01/sf0.1 (min values nonnegative), pinned
    by tests/test_extensions.py::test_primitive_cents_match_decimal
    and by the unchanged DuckDB oracles (which still compute in
    decimal). The x10-x40 scaled inputs reuse these price columns
    byte-identically (tools/scale_testdata.py shifts only int64 keys).
    """
    return (F.col(col) * 100 + 0.5).cast("long")


@register(
    "pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                       * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
              CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
              CAST(count(*) AS BIGINT) AS count_order
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape (reference has no relational layer; extension).

    SCALE: all per-row arithmetic and the first-level sums run in LONG
    (exact cents / basis points), not decimal — Spark decimal products
    grow past precision 18, leaving the primitive-long codegen fast
    path for per-row BigDecimal allocation, which measured 2x slower
    on the x10 dataset (1.65 s vs 0.80 s). The cents are produced by
    the fully primitive `_cents` (r14 — the decimal(_,2)-cast cents
    still allocated one BigDecimal per row per column; see _cents for
    the exactness argument). Exactness at ANY scale: the long partials
    aggregate per
    (group, input partition) — bounded by partition row count, no
    overflow for any realistic partition — and a second tiny
    aggregation (|groups| x |partitions| rows) totals them in
    decimal(38), so the full sum never wraps even at sf100k where a
    flat long would. Decimals thus touch ~200 rows instead of 6M
    (measured cost within noise of the flat-long shape at both
    scales). Every output double is bit-identical to the all-decimal
    formulation (sums of the same exact integers). The ship-date
    filter compares the raw timestamp column (pushable to the parquet
    scan) instead of wrapping it in to_date(), which blocked pushdown.
    """
    li = _table(spark, sf_dir, "lineitem")
    qc = _cents("l_quantity")
    pc = _cents("l_extendedprice")
    dc = _cents("l_discount")
    as_d = lambda c, scale: (c / scale).cast("double")  # noqa: E731
    partials = (
        li.filter(
            # cast the literal to the column's own type (timestamp_ntz in
            # the current testdata, timestamp under the legacy nanos
            # layout) — session tz is pinned UTC so both agree
            F.col("l_shipdate") < F.lit("1998-09-03").cast(li.schema["l_shipdate"].dataType)
        )
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_part"))
        .agg(
            F.sum(qc).alias("_q"),
            F.sum(pc).alias("_p"),
            F.sum(pc * (100 - dc)).alias("_dp"),
            F.sum(dc).alias("_d"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return (
        partials.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("_q").cast("decimal(38,0)")).alias("_q"),
            F.sum(F.col("_p").cast("decimal(38,0)")).alias("_p"),
            F.sum(F.col("_dp").cast("decimal(38,0)")).alias("_dp"),
            F.sum(F.col("_d").cast("decimal(38,0)")).alias("_d"),
            F.sum("_n").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            as_d(F.col("_q"), 100).alias("sum_qty"),
            as_d(F.col("_p"), 100).alias("sum_base_price"),
            as_d(F.col("_dp"), 10000).alias("sum_disc_price"),
            (as_d(F.col("_q"), 100) / F.col("count_order")).alias("avg_qty"),
            (as_d(F.col("_d"), 100) / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
    )


@register(
    "shipping_priority",
    """SELECT l.l_orderkey,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
              strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
              o.o_orderpriority
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1995-03-15'
         AND l.l_shipdate > TIMESTAMP '1995-03-15'
       GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
       ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey LIMIT 10""",
)
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: unshipped high-revenue orders for one segment.

    SCALE: the segment customer list is a BROADCAST build side (a
    filtered dimension); both fact filters compare raw timestamp
    columns so they push to the parquet scans; revenue cents sum in
    LONG per order — exact without decimals because a TPC-H order has
    a bounded line count (sum <= ~1e10 cents-basis-points, 8 orders of
    magnitude under long overflow) — and the final top-10 is a
    distributed TakeOrderedAndProject, never a global sort.
    """
    c = _table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _table(spark, sf_dir, "orders")
    o = o.filter(
        F.col("o_orderdate")
        < F.lit("1995-03-15").cast(o.schema["o_orderdate"].dataType)
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = _table(spark, sf_dir, "lineitem")
    li = li.filter(
        F.col("l_shipdate")
        > F.lit("1995-03-15").cast(li.schema["l_shipdate"].dataType)
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    # Deliberately the decimal(_,2)-cast cents, NOT _cents (r14): in
    # THIS query the primitive form measured consistently SLOWER
    # (A/B best 0.641 vs 0.579 s, median 0.884 vs 0.713 s at sf0.1,
    # order-alternated; tools/exp_cents_headtohead.py) even though the
    # plans are structurally identical and the same expression wins in
    # pricing_summary/top_revenue_customers — per-site measurement
    # beats the pattern (guide §1).
    pc = (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast("long")
    dc = (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long")
    return (
        li.join(
            F.broadcast(o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(pc * (100 - dc)) / F.lit(10000)).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "event_session_windows",
    # Spark's native session_window semantics: a session extends while
    # the next event starts STRICTLY before last+gap (end-exclusive),
    # i.e. a gap of exactly 30 min starts a new session -> the lag
    # condition is >=, not > (event_sessionization's legacy rule)
    """WITH e AS (
      SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us FROM events
    ),
    flagged AS (
      SELECT user_id, us,
             CASE WHEN us - lag(us) OVER w >= 1800000000 OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sid AS (
      SELECT user_id, us,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(us) AS start_us,
           max(us) + 1800000000 AS end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sid GROUP BY user_id, sid""",
)
def q_event_session_windows(spark, sf_dir):
    """Native ``session_window`` sessionization (the Structured
    Streaming session operator, here batch-oracled against the
    lag/cumsum construction): one user-keyed session-merge aggregation;
    the identical expression runs on a readStream source with a
    watermark for the streaming case."""
    e = _table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (
        e.groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("start_us"),
            F.unix_micros(F.col("session_window.end")).alias("end_us"),
            "n_events",
        )
    )


@register(
    "top_revenue_customers",
    """WITH rev AS (
      SELECT o.o_custkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
             CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey
    )
    SELECT c.c_custkey, c.c_name, n.n_name, r.revenue, r.n_orders, rk.rank
    FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY revenue DESC, o_custkey) AS INT) AS rank
      FROM rev
    ) rk
    JOIN rev r ON rk.o_custkey = r.o_custkey
    JOIN customer c ON r.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE rk.rank <= 20""",
)
def q_top_revenue_customers(spark, sf_dir):
    li = _table(spark, sf_dir, "lineitem")
    orders = _table(spark, sf_dir, "orders")
    customer = _table(spark, sf_dir, "customer")
    nation = _table(spark, sf_dir, "nation")
    # pre-aggregate lineitem to (orderkey, order revenue) BEFORE the join:
    # the join input shrinks ~4x (one row per order, not per line item)
    # and n_orders becomes a plain count — no countDistinct expand.
    # Revenue accumulates in LONG basis points (price_cents * (100 -
    # disc_cents), exact), converting to decimal->double once per
    # CUSTOMER — same primitive-codegen win as pricing_summary (2.33 s
    # -> 1.57 s on x10, value-identical to the decimal formulation).
    pc = _cents("l_extendedprice")
    dc = _cents("l_discount")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(pc * (100 - dc)).alias("order_rev_bp")
    )
    rev = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            (F.sum("order_rev_bp").cast("decimal(38,4)") / 10000)
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    # distributed top-k (TakeOrderedAndProject), NOT a global no-partition
    # window: every executor ships only its local top 20, the driver-side
    # sort touches 20 rows per partition instead of every customer. The
    # row_number window then runs on the 20 survivors only.
    top = rev.orderBy(F.col("revenue").desc(), F.col("o_custkey")).limit(20)
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_custkey"))
    top = top.withColumn("rank", F.row_number().over(w))
    return (
        top.join(F.broadcast(customer), top.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue", "n_orders", "rank")
    )


@register(
    "region_revenue",
    """SELECT r.r_name, n.n_name,
              CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
              CAST(count(*) AS BIGINT) AS n_orders
       FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name, n.n_name""",
)
def q_region_revenue(spark, sf_dir):
    orders = _table(spark, sf_dir, "orders")
    customer = _table(spark, sf_dir, "customer")
    nation = _table(spark, sf_dir, "nation")
    region = _table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            # r14: per-row sums in exact LONG cents (see _cents); ONE
            # decimal division per group (25 nations) reproduces the
            # oracle's SUM(decimal)->double bit-exactly
            (F.sum(_cents("o_totalprice")).cast("decimal(38,2)") / 100)
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "event_sessionization",
    """WITH e AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep
      FROM events
    ),
    flagged AS (
      SELECT user_id, ep,
             CASE WHEN ep - lag(ep) OVER w > 1800 OR lag(ep) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) AS DOUBLE) / SUM(new_session) AS events_per_session
    FROM flagged GROUP BY user_id""",
)
def q_event_sessionization(spark, sf_dir):
    e = _table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ep")
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            (F.col("ep") - F.lag("ep").over(w) > 1800) | F.lag("ep").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        (F.count(F.lit(1)).cast("double") / F.sum("new_session")).alias("events_per_session"),
    )


@register(
    "event_asof_join",
    """WITH e AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep
      FROM events
    ),
    l AS (SELECT event_id, user_id, ep FROM e WHERE event_type = 'error'),
    r AS (SELECT event_id, user_id, ep FROM e WHERE event_type = 'click'),
    u AS (
      SELECT user_id, ep, 1 AS side, CAST(0 AS BIGINT) AS ord,
             event_id AS l_id, NULL AS r_id, NULL AS r_ep
      FROM l
      UNION ALL
      SELECT user_id, ep, 0, event_id, NULL, event_id, ep FROM r
    ),
    m AS (
      SELECT user_id, ep, side, l_id,
             last_value(r_id IGNORE NULLS) OVER w AS click_id,
             last_value(r_ep IGNORE NULLS) OVER w AS click_ep
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ep, side, ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT l_id AS event_id, user_id, ep,
           CAST(click_id AS BIGINT) AS click_id,
           CAST(click_ep AS BIGINT) AS click_ep,
           CAST(ep - click_ep AS BIGINT) AS lag_sec
    FROM m WHERE side = 1""",
)
def q_event_asof_join(spark, sf_dir):
    """As-of join: each 'error' event matched to the latest at-or-before
    'click' by the same user (union+window — one key shuffle, no range
    predicate; see operators/asof.py). Generalizes the reference's
    nearest-observed-day gap fill (main.py:192-199) to two tables."""
    from trendmachine_spark.operators.asof import asof_join

    e = _table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").alias("ep")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ep"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ep"
    )
    out = asof_join(
        errors, clicks, on="user_id", ts="ep",
        right_order="event_id", payload=["event_id"], prefix="click_",
    )
    return out.select(
        "event_id", "user_id", "ep",
        F.col("click_event_id").alias("click_id"),
        F.col("click_ep").cast("long").alias("click_ep"),
        (F.col("ep") - F.col("click_ep")).cast("long").alias("lag_sec"),
    )


@register(
    "event_range_join",
    """WITH e AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep
      FROM events
    ),
    l AS (SELECT event_id, user_id, ep FROM e WHERE event_type = 'error'),
    r AS (SELECT ep FROM e WHERE event_type = 'click')
    SELECT l.event_id, l.user_id, l.ep,
           CAST(count(r.ep) AS BIGINT) AS n_prior_clicks
    FROM l LEFT JOIN r ON r.ep >= l.ep - 60 AND r.ep < l.ep
    GROUP BY l.event_id, l.user_id, l.ep""",
)
def q_event_range_join(spark, sf_dir):
    """Keyless range join: clicks by ANY user in the 60 s before each
    error. Time-binned equi-join (operators/asof.range_count_join) —
    the naive theta-join is a BroadcastNestedLoopJoin at scale."""
    from trendmachine_spark.operators.asof import range_count_join

    e = _table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").alias("ep")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ep"
    )
    clicks = e.filter(F.col("event_type") == "click").select("ep")
    return range_count_join(
        errors, clicks, ts="ep", lo=60, hi=0, count_col="n_prior_clicks"
    )


@register(
    "session_stats",
    """WITH e AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events
    ),
    flagged AS (
      SELECT user_id, ep,
             CASE WHEN ep - lag(ep) OVER w > 1800 OR lag(ep) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
    ),
    sid AS (
      SELECT user_id, ep,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ep
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, sid,
             max(ep) - min(ep) AS duration_sec,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sid GROUP BY user_id, sid
    )
    SELECT CAST(duration_sec // 600 AS BIGINT) AS bucket,
           CAST((duration_sec // 600) * 600 AS BIGINT) AS lo_sec,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS total_events,
           CAST(sum(n_events) AS DOUBLE) / count(*) AS mean_events
    FROM sessions GROUP BY bucket, lo_sec""",
)
def q_session_stats(spark, sf_dir):
    """Session-duration histogram (10-minute buckets): the global
    duration distribution without a global sort — bucketing by integer
    division is exact and aggregates map-side, where exact global
    quantiles would need a single-partition rank over every session.
    Shape: ONE user exchange (gap-flag window, running session-id
    window, and the (user, sid) groupBy all share it — subset
    clustering) + the map-combined bucket aggregation."""
    e = _table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ep")
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    flagged = e.withColumn(
        "new_session",
        F.when(
            (F.col("ep") - F.lag("ep").over(w) > 1800)
            | F.lag("ep").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sessions = (
        flagged.withColumn("sid", F.sum("new_session").over(run))
        .groupBy("user_id", "sid")
        .agg(
            (F.max("ep") - F.min("ep")).alias("duration_sec"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    bucket = F.expr("duration_sec div 600")
    return (
        sessions.groupBy(
            bucket.alias("bucket"), (bucket * 600).alias("lo_sec")
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
            (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias("mean_events"),
        )
    )


@register(
    "event_props_stats",
    """WITH p AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INT) AS k,
             value
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           min(k) AS min_k,
           max(k) AS max_k,
           CAST(sum(k) AS DOUBLE) / count(*) AS avg_k,
           CAST(count(CASE WHEN value > 50 THEN 1 END) AS BIGINT) AS n_high_value
    FROM p GROUP BY event_type""",
)
def q_event_props_stats(spark, sf_dir):
    """Semi-structured extraction: typed ``from_json`` over the JSON
    props column, aggregated per event type. The parse is a pure
    projection (JacksonParser inside codegen, no UDF); the only
    exchange is the map-combined per-type aggregation, and column
    pruning still reaches the scan (props + value + event_type only).
    """
    e = _table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json("props", "k int").getField("k").alias("k"),
        "value",
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        F.count(F.when(F.col("value") > 50, 1)).alias("n_high_value"),
    )


@register(
    "event_funnel",
    """WITH e AS (
      SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us FROM events
    ),
    s1 AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN us END) AS t_view
      FROM e GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, s1.t_view,
             min(CASE WHEN event_type = 'click' AND s1.t_view IS NOT NULL
                       AND us > s1.t_view THEN us END) AS t_click
      FROM e JOIN s1 USING (user_id) GROUP BY e.user_id, s1.t_view
    ),
    s3 AS (
      SELECT e.user_id, s2.t_view, s2.t_click,
             min(CASE WHEN event_type = 'purchase' AND s2.t_click IS NOT NULL
                       AND us > s2.t_click THEN us END) AS t_purchase
      FROM e JOIN s2 USING (user_id) GROUP BY e.user_id, s2.t_view, s2.t_click
    )
    SELECT user_id, t_view, t_click, t_purchase,
           CAST(CASE WHEN t_view IS NULL THEN 0 ELSE 1 END
              + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
              + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS BIGINT)
             AS steps_reached
    FROM s3""",
)
def q_event_funnel(spark, sf_dir):
    """Ordered view->click->purchase funnel per user (strictly-after
    step chaining at microsecond precision)."""
    from trendmachine_spark.operators.funnel import event_funnel

    return event_funnel(_table(spark, sf_dir, "events"))


@register(
    "event_retention",
    """WITH a AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    c AS (SELECT user_id, min(d) AS cohort_day FROM a GROUP BY user_id)
    SELECT c.cohort_day, CAST(a.d - c.cohort_day AS BIGINT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN c USING (user_id)
    GROUP BY c.cohort_day, day_offset""",
)
def q_event_retention(spark, sf_dir):
    """First-activity cohorts x day-offset distinct-user retention."""
    from trendmachine_spark.operators.funnel import event_retention

    return event_retention(_table(spark, sf_dir, "events"))


@register(
    "event_attribution",
    """WITH e AS (
      SELECT user_id, event_type, event_id, value,
             CAST(epoch_us(ts) AS BIGINT) AS us
      FROM events),
    t AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM e)
    SELECT coalesce(touch, 'direct') AS touch_type,
           CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM t WHERE event_type = 'purchase' GROUP BY touch_type""",
)
def q_event_attribution(spark, sf_dir):
    """Last-touch conversion attribution (funnel.event_attribution):
    one user exchange, a rows-frame running last-non-conversion window
    (event_id tie-break), integer-cents value sums."""
    from trendmachine_spark.operators.funnel import event_attribution

    return event_attribution(_table(spark, sf_dir, "events"))


# ------------------------------------------- non-SQL-expressible (goldens)

@register("resilience_daily_series", None)  # O34/O35 recurrences: rows-only
def q_resilience_daily_series(spark, sf_dir):
    from trendmachine_spark.operators.recurrence import score_daily_series
    from trendmachine_spark.pipeline import report_projection

    dense = _dense(spark, sf_dir, fill=2, policy="closest")
    return report_projection(score_daily_series(dense))


# ----------------------------------------------------------------------- O37

@register(
    "chaos_melt",
    f"""WITH {osql.SPINE},
    dense AS (
      SELECT s.url, s.day, d.chaos, d.chaosn
      FROM spine s LEFT JOIN daily d ON s.url = d.url AND s.day = d.day
    ),
    filled AS (
      SELECT url, day,
             coalesce(last_value(chaos IGNORE NULLS) OVER w, 0.0) AS chaos,
             coalesce(last_value(chaosn IGNORE NULLS) OVER w, 0.0) AS chaosn
      FROM dense
      WINDOW w AS (PARTITION BY url ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT url, day, win, chaos FROM (
      SELECT url, day, chaos, chaosn FROM filled
    ) UNPIVOT (chaos FOR win IN (chaos AS 'All', chaosn AS 'Last1000'))""",
)
def q_chaos_melt(spark, sf_dir):
    dense = _dense(spark, sf_dir)
    return dense.selectExpr(
        "url", "day_str as day",
        "stack(2, 'All', chaos, 'Last1000', chaosn) as (win, chaos)",
    )


# ----------------------------------------------------------------------- O36

@register("sigmoid_preview", None)  # exp() differs in last ulp across libms
def q_sigmoid_preview(spark, sf_dir):
    from trendmachine_spark.operators.sigmoid_preview import sigmoid_shapes_all

    return sigmoid_shapes_all(spark)


@register(
    "dedup_embedding_cosine",
    """WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
      FROM embeddings
    ),
    nv AS (
      SELECT vec_id, q,
             CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS norm2
      FROM qv
    )
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(list_sum(list_transform(generate_series(1, len(a.q)),
                                          i -> a.q[i] * b.q[i])) AS DOUBLE)
               / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) AS cosine
      FROM nv a, nv b WHERE a.vec_id < b.vec_id
    ) WHERE cosine >= 0.3""",
)
def q_dedup_embedding_cosine(spark, sf_dir):
    from trendmachine_spark.extensions.similarity import embedding_near_dup

    return embedding_near_dup(_embeddings(spark, sf_dir), min_cosine=0.3)


def _srp_neardup_oracle(n_planes: int = 8, min_cosine: float = 0.3) -> str:
    """SRP-bucketed near-dup oracle — mirrors similarity.srp_buckets'
    md5-derived ±1 hyperplanes exactly (bit 0 of md5('plane:dim'))."""
    bits = []
    for p in range(n_planes):
        sign = (
            f"((('0x' || substr(md5(concat('{p}', ':', CAST(i - 1 AS VARCHAR))), 32, 1))::INT % 2) * 2 - 1)"
        )
        bits.append(
            "CASE WHEN CAST(list_sum(list_transform(generate_series(1, len(q)), "
            f"i -> q[i] * {sign})) AS BIGINT) > 0 THEN '1' ELSE '0' END"
        )
    bucket = "concat(" + ", ".join(bits) + ")"
    return f"""WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
      FROM embeddings
    ),
    nv AS (
      SELECT vec_id, q,
             CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS norm2,
             {bucket} AS bucket
      FROM qv
    )
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(list_sum(list_transform(generate_series(1, len(a.q)),
                                          i -> a.q[i] * b.q[i])) AS DOUBLE)
               / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) AS cosine
      FROM nv a JOIN nv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cosine >= {min_cosine}"""


@register("dedup_embedding_cosine_bucketed", _srp_neardup_oracle())
def q_dedup_embedding_cosine_bucketed(spark, sf_dir):
    """The production embedding near-dup: SRP-bucket equi-join + exact
    cosine predicate — subset of dedup_embedding_cosine by design."""
    from trendmachine_spark.extensions.similarity import embedding_near_dup_bucketed

    return embedding_near_dup_bucketed(
        _embeddings(spark, sf_dir), min_cosine=0.3
    )


@register(
    "embedding_outliers",
    # centroid = per-dim SUM (exact bigint; cosine is scale-invariant,
    # so the un-normalized centroid gives the same value as the mean
    # while keeping every aggregation integer/associative)
    """WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
      FROM embeddings
    ),
    e AS (
      SELECT vec_id, label, i AS pos, q[i] AS v
      FROM q, unnest(generate_series(1, len(q))) AS t(i)
    ),
    cent AS (SELECT label, pos, CAST(sum(v) AS BIGINT) AS s FROM e GROUP BY label, pos),
    cn AS (SELECT label, CAST(sum(s * s) AS BIGINT) AS c2 FROM cent GROUP BY label),
    dots AS (
      SELECT e.vec_id, e.label,
             CAST(sum(e.v * c.s) AS BIGINT) AS dot,
             CAST(sum(e.v * e.v) AS BIGINT) AS n2
      FROM e JOIN cent c ON e.label = c.label AND e.pos = c.pos
      GROUP BY e.vec_id, e.label
    )
    SELECT d.vec_id, d.label,
           CAST(dot AS DOUBLE) / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(c2 AS DOUBLE)))
             AS cos_centroid,
           CAST(CASE WHEN CAST(dot AS DOUBLE)
                          / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(c2 AS DOUBLE))) < 0.0
                     THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
    FROM dots d JOIN cn ON d.label = cn.label""",
)
def q_embedding_outliers(spark, sf_dir):
    """Per-vector cosine to its label centroid (mislabel/outlier scan)."""
    from trendmachine_spark.extensions.similarity import embedding_outliers

    return embedding_outliers(_embeddings(spark, sf_dir))


@register(
    "text_term_stats",
    """WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS n_term
      FROM words GROUP BY doc_id, term
    ),
    doc_len AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_doc FROM words GROUP BY doc_id
    ),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY term)
    SELECT tf.doc_id, tf.term, tf.n_term, df.doc_freq,
           CAST(tf.n_term AS DOUBLE) / doc_len.n_doc AS tf
    FROM tf JOIN doc_len ON tf.doc_id = doc_len.doc_id
    JOIN df ON tf.term = df.term""",
)
def q_text_term_stats(spark, sf_dir):
    from trendmachine_spark.extensions.text import term_stats

    return term_stats(_docs(spark, sf_dir))


#: shared quality-model CTE chain (mirrors extensions.text.quality_score
#: term by term, same left-associative float order)
_QUALITY_SQL = """w AS (
      SELECT doc_id, source, text, string_split(text, ' ') AS words FROM documents
    ),
    p AS (
      SELECT doc_id, source,
             len(words) AS n_words,
             CAST(length(text) - len(words) + 1 AS DOUBLE) / len(words) AS awl,
             CAST(len(list_filter(words,
                  x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
               / len(words) AS sw,
             CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS dr
      FROM w
    ),
    s AS (
      SELECT doc_id, source,
             -1.0 + 2.0 * (CAST(n_words AS DOUBLE) / (n_words + 100))
                  + 1.5 * dr + 1.0 * sw + -0.1 * greatest(awl - 4.0, 0.0) AS quality
      FROM p
    )"""


@register(
    "quality_score",
    f"""WITH {_QUALITY_SQL}
    SELECT doc_id, quality,
           CAST(CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS keep_quality
    FROM s""",
)
def q_quality_score(spark, sf_dir):
    """Linear quality-model scores (deterministic fasttext-slot stand-in)."""
    from trendmachine_spark.extensions.text import quality_score

    return quality_score(_docs(spark, sf_dir))


@register(
    "top_quality_docs",
    f"""WITH {_QUALITY_SQL}
    SELECT doc_id, source, quality, rank FROM (
      SELECT doc_id, source, quality,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY quality DESC, doc_id) AS BIGINT) AS rank
      FROM s
    ) WHERE rank <= 5""",
)
def q_top_quality_docs(spark, sf_dir):
    """Best 5 documents per source by model quality (WindowGroupLimit
    distributed per-group top-k)."""
    from trendmachine_spark.extensions.text import quality_score
    from trendmachine_spark.operators.topk import top_per_group

    scored = quality_score(_docs(spark, sf_dir), keep_cols=("source",))
    return top_per_group(
        scored.select("doc_id", "source", "quality"),
        ["source"],
        [F.col("quality").desc(), F.col("doc_id")],
        k=5,
    )


@register(
    "corpus_card",
    f"""WITH {_QUALITY_SQL},
    base AS (
      SELECT d.source AS grp, d.doc_id,
             length(d.text) AS chars,
             len(string_split(d.text, ' ')) AS toks,
             md5(d.text) AS h,
             CASE WHEN s.quality >= 0.5 THEN 1 ELSE 0 END AS kq
      FROM documents d JOIN s ON d.doc_id = s.doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY grp ORDER BY chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY grp) AS n
      FROM base
    ),
    agg AS (
      SELECT grp,
             CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(toks) AS DOUBLE) AS total_tokens,
             CAST(sum(chars) AS DOUBLE) / count(*) AS mean_chars,
             CAST(max(CASE WHEN rn = (n - 1) // 2 + 1 THEN chars END) AS DOUBLE) AS p50_chars,
             CAST(max(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN chars END) AS DOUBLE) AS p90_chars,
             1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*) AS exact_dup_rate,
             CAST(sum(kq) AS DOUBLE) / count(*) AS quality_rate
      FROM ranked GROUP BY grp
    )
    SELECT grp AS source, 'n_docs' AS metric, n_docs AS value FROM agg
    UNION ALL SELECT grp, 'total_tokens', total_tokens FROM agg
    UNION ALL SELECT grp, 'mean_chars', mean_chars FROM agg
    UNION ALL SELECT grp, 'p50_chars', p50_chars FROM agg
    UNION ALL SELECT grp, 'p90_chars', p90_chars FROM agg
    UNION ALL SELECT grp, 'exact_dup_rate', exact_dup_rate FROM agg
    UNION ALL SELECT grp, 'quality_rate', quality_rate FROM agg""",
)
def q_corpus_card(spark, sf_dir):
    """Release-style per-source corpus card, long-form."""
    from trendmachine_spark.extensions.text import corpus_card

    return corpus_card(_docs(spark, sf_dir))


@register(
    "bpe_pair_stats",
    """WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
      SELECT word, CAST(count(*) AS BIGINT) AS wc FROM words
      WHERE len(word) > 0 GROUP BY word
    ),
    pairs AS (
      SELECT substr(word, i, 1) AS left_sym,
             CASE WHEN i < len(word) THEN substr(word, i + 1, 1)
                  ELSE '</w>' END AS right_sym,
             wc
      FROM wc, unnest(generate_series(1, len(word))) AS t(i)
    )
    SELECT left_sym, right_sym, CAST(sum(wc) AS BIGINT) AS pair_count
    FROM pairs GROUP BY left_sym, right_sym""",
)
def q_bpe_pair_stats(spark, sf_dir):
    """BPE tokenizer-training pair counts (iteration-0 merge statistics)."""
    from trendmachine_spark.extensions.text import bpe_pair_stats

    return bpe_pair_stats(_docs(spark, sf_dir))


def _redact_pii_sql(source: str) -> str:
    """The redaction SELECT over ``source`` — mirrors text.redact_pii
    (fixed pattern order, original-text counting, explicit 'g' flag so
    DuckDB replaces all matches). Shared by the corpus query and the
    planted-fixture twin."""
    return rf"""SELECT doc_id,
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                    '[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}', '<IP>', 'g'),
                  '[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g'),
                '[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}', '<SSN>', 'g') AS text_redacted,
              CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}'))
                 + len(regexp_extract_all(text, '[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}'))
                 + len(regexp_extract_all(text, '[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}'))
                 + len(regexp_extract_all(text, '[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}')) AS BIGINT)
                AS n_redactions
       FROM {source}"""


@register(
    "redact_pii",
    _redact_pii_sql("documents"),
)
def q_redact_pii(spark, sf_dir):
    """Destructive PII redaction (typed placeholders, fixed pattern
    order, span counts taken pre-replacement) — the transform twin of
    text_pii_stats."""
    from trendmachine_spark.extensions.text import redact_pii

    return redact_pii(_docs(spark, sf_dir))


@register(
    "redact_pii_planted",
    f"""WITH planted AS (
      SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR) ||
             '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com ' ||
             text ||
             ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) ||
             '.0.' || CAST(doc_id % 100 AS VARCHAR) ||
             ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
             '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             CASE WHEN doc_id % 3 = 0
                  THEN ' ssn 123-45-' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' fwd a@1.2.3.4.com' ELSE '' END AS text
      FROM documents
    )
    {_redact_pii_sql("planted")}""",
)
def q_redact_pii_planted(spark, sf_dir):
    """Redaction on the deterministically PII-planted corpus twin
    (round 8): the synthetic corpus holds no PII spans, so redact_pii's
    oracle exercised zero replacements — this query drives every
    pattern's replace path (plus the email/IP overlap pathology) on
    driver-checked data. text.plant_pii documents the closed-form
    expected counts."""
    from trendmachine_spark.extensions.text import plant_pii, redact_pii

    return redact_pii(plant_pii(_docs(spark, sf_dir)))


@register(
    "training_shards",
    """WITH sharded AS (
      SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16 AS shard,
             doc_id, len(text) AS chars, len(string_split(text, ' ')) AS toks
      FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           CAST(sum(chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM sharded GROUP BY shard""",
)
def q_training_shards(spark, sf_dir):
    """Deterministic md5-mod output-shard manifest (count/token/char
    totals + id range per shard) — the balance audit before a
    partitionBy export."""
    from trendmachine_spark.extensions.packing import training_shards

    return training_shards(_docs(spark, sf_dir), n_shards=16)


@register(
    "lm_familiarity",
    """WITH u AS (
      SELECT doc_id, text,
             ('0x' || substr(md5('lmfam:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS u
      FROM documents
    ),
    tw AS (SELECT string_split(text, ' ') AS w FROM u WHERE u >= 0.25),
    tb AS (
      SELECT array_to_string(w[i:i+1], ' ') AS g
      FROM tw, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
    ),
    cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM tb GROUP BY g),
    ctx AS (
      SELECT split_part(g, ' ', 1) AS w1, CAST(sum(c) AS BIGINT) AS ctx
      FROM cnt GROUP BY w1
    ),
    vsz AS (
      SELECT CAST(count(DISTINCT split_part(g, ' ', 2)) AS BIGINT) AS v
      FROM cnt
    ),
    hw AS (SELECT doc_id, string_split(text, ' ') AS w FROM u WHERE u < 0.25),
    hb AS (
      SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
      FROM hw, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
    )
    SELECT hb.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(COALESCE(len(bin(c)) - 1, 0)) AS BIGINT) AS familiarity_bits,
           CAST(sum(COALESCE(len(bin(c)) - 1, 0)) AS DOUBLE) / count(*) AS avg_bits,
           CAST(sum((len(bin(COALESCE(ctx.ctx, 0) + vsz.v)) - 1)
                    - (len(bin(COALESCE(c, 0) + 1)) - 1)) AS BIGINT)
             AS surprisal_bits,
           CAST(sum((len(bin(COALESCE(ctx.ctx, 0) + vsz.v)) - 1)
                    - (len(bin(COALESCE(c, 0) + 1)) - 1)) AS DOUBLE) / count(*)
             AS avg_surprisal
    FROM hb
    LEFT JOIN cnt ON hb.g = cnt.g
    LEFT JOIN ctx ON split_part(hb.g, ' ', 1) = ctx.w1
    CROSS JOIN vsz
    GROUP BY hb.doc_id""",
)
def q_lm_familiarity(spark, sf_dir):
    """Held-out bigram-LM familiarity (the CCNet perplexity-filter
    slot): floor(log2(train count)) bits per bigram via the exact
    binary-string-length identity, averaged per held-out doc; round 8
    adds true add-one surprisal at floor-log2 resolution — unseen
    bigrams now cost strictly more than count-1 bigrams (the r7
    verdict's smoothing-realism gap), still exact-integer."""
    from trendmachine_spark.extensions.text import lm_familiarity

    return lm_familiarity(_docs(spark, sf_dir))
