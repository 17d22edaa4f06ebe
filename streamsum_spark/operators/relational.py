"""§2.C relational surface — filters, joins, aggregations, windows, set
ops, dedup, scalar functions (SURVEY.md §2.C).

The reference has none of these beyond its cache aggregations (its only
"join" is a map lookup; its only sort is a comparator over query results —
TupleComparators.java).  They are mandated by the north star
(BASELINE.json) and implemented purely with Catalyst-native operators so
pushdown/pruning/broadcast/AQE all apply.  Scale notes are on each op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamsum_spark.tables import table


# -- filters ----------------------------------------------------------------


def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates (IN + range + time range) — all push down to
    the parquet scan (verified in tests: PushedFilters in the plan)."""
    ev = table(spark, sf_dir, "events")
    return ev.where(
        F.col("event_type").isin("click", "purchase")
        & (F.col("value") >= 10.0)
        & (F.col("value") < 50.0)
        & (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp_ntz"))
    ).select("event_id", "ts", "user_id", "event_type", "value")


# -- joins ------------------------------------------------------------------


def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer (equi).  NO broadcast hint (round-11 fix):
    customer is O(SF) — 15M rows at sf100, billions at the 100 TB design
    point — not a fixed dimension like nation/region, so a forced
    ``F.broadcast`` here is the same scale-growing-broadcast class the
    r7/r8 rounds purged from the dedup keep-lists and tfidf/bloom.  AQE
    broadcasts while customer measures under the threshold and degrades
    to a shuffle join when it doesn't (pinned in
    tests/test_plan_shapes.py: values unchanged at
    autoBroadcastJoinThreshold=-1 with zero BroadcastHashJoin)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one order (left semi == EXISTS)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders (left anti == NOT EXISTS)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join surface in one declared result: customers WITH at
    least one order (left semi == EXISTS, tag 'has_orders') unioned with
    customers WITHOUT orders (left anti == NOT EXISTS, tag 'no_orders').

    Both branches are keyed joins against the same orders scan; Catalyst
    plans each as a broadcast/shuffled semi- or anti-join — no row
    explosion on either side (the probe side never duplicates)."""
    semi = join_semi(spark, sf_dir).select(
        F.lit("has_orders").alias("tag"), "c_custkey", "c_name"
    )
    anti = join_left_anti(spark, sf_dir).select(
        F.lit("no_orders").alias("tag"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


JOIN_SEMI_ANTI_SQL = """
SELECT 'has_orders' AS tag, c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'no_orders' AS tag, c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the same user's most recent
    click at-or-before it (matched purchases only — ASOF inner).

    Implemented with the union+window technique rather than a range join:
    interleave both sides ordered by (ts, side, seq) per user and carry the
    last non-null click ts forward.  One shuffle on user_id, no join
    explosion — the scalable as-of plan (a naive join-then-max would
    produce |purchases|x|clicks| intermediate rows per user).
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("ts").alias("click_ts"), F.lit(0).alias("is_probe")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(None).cast("timestamp_ntz").alias("click_ts"),
        F.lit(1).alias("is_probe"),
    )
    # at equal ts the click sorts first, so ts >= click_ts includes equality
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .where((F.col("is_probe") == 1) & F.col("last_click_ts").isNotNull())
        .select("event_id", "user_id", "ts", F.col("last_click_ts").alias("click_ts"))
    )


# -- aggregations -----------------------------------------------------------


def agg_revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary.  Sums rounded to the exact decimal
    width of their inputs (price*discount products have <=4 decimals) so
    both engines land on the same grid point despite FP summation order."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


AGG_REVENUE_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def agg_rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation) over customer counts + balances.  Both dims
    broadcast; the rollup is a single pass with partial aggregation."""
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — expands to a two-phase exact distinct
    aggregation (partial dedup map-side before the shuffle)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB path (one pass, fixed-size
    sketch, no distinct shuffle).  Approximate => rows-only check."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


# -- windows ----------------------------------------------------------------


def window_rownum_lastn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last 5 events per user by arrival order — window row_number with
    WindowGroupLimit pushdown (per-key state O(N), not O(rows))."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("user_id", "event_id", "event_type", "ts", "rn")
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum of value over arrival order (2-decimal inputs
    => round 2 keeps both engines on the decimal grid)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by retail price (deterministic tie-break)."""
    part = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


# -- set ops / dedup --------------------------------------------------------


def set_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(clickers ∪ viewers) \\ error-ers, as distinct user sets."""
    ev = table(spark, sf_dir, "events")
    clickers = ev.where(F.col("event_type") == "click").select("user_id")
    viewers = ev.where(F.col("event_type") == "view").select("user_id")
    # restrict the subtracted set to a time window so the result is
    # non-trivial at every SF (every user errors *eventually*)
    erring = ev.where(
        (F.col("event_type") == "error")
        & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp_ntz"))
    ).select("user_id")
    # union -> EXCEPT (set semantics: subtract dedups, matching SQL EXCEPT)
    return clickers.union(viewers).subtract(erring)


def dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: first event per (user, type) by arrival order — the
    window-rank formulation of dropDuplicates with a deterministic keeper."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


# -- scalar functions -------------------------------------------------------


def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "part")
    return ev.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.length(F.col("p_name")).cast("long").alias("name_len"),
        F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract(F.col("p_type"), r"(\w+)$", 1).alias("type_last_word"),
        F.col("p_name").like("%green%").alias("is_green"),
    )


def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface + the null-semantics corner (nullif /
    null-safe equality <=> / coalesce) in one per-event projection —
    absorbs the former scalar_null_safe declared query."""
    ev = table(spark, sf_dir, "events")
    masked = F.expr("nullif(event_type, 'error')")
    return ev.select(
        "event_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),  # 0=Sunday, DuckDB convention
        F.hour("ts").cast("long").alias("h"),
        masked.alias("masked_type"),
        masked.eqNullSafe(F.lit(None).cast("string")).alias("is_error"),
        masked.eqNullSafe("click").alias("is_click"),
        F.coalesce(masked, F.lit("(err)")).alias("type_or_default"),
    )


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def batch_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows, batch form (streaming twin lives in
    streamsum_spark.streaming): date_trunc bucket + hash agg."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over embeddings: size + positional explode of the
    leading elements (scalar rows hash cleanly across engines)."""
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            F.posexplode("embedding").alias("pos", "val"),
        )
        .where(F.col("pos") < 3)
        .select(
            "vec_id", "dim", (F.col("pos") + 1).cast("long").alias("idx"),
            F.col("val").cast("double").alias("val"),
        )
    )


def agg_cube_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, market segment): all four grouping combinations
    in one pass (Expand + partial agg — no re-scan per grouping set)."""
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.cube("r_name", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns per return flag.  The oracle is the
    equivalent conditional aggregation (engine-portable pivot form)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})
    )


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both clicked and purchased (INTERSECT set semantics)."""
    ev = table(spark, sf_dir, "events")
    clickers = ev.where(F.col("event_type") == "click").select("user_id")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers)


def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface: abs/mod/greatest/least/square — exact-arithmetic
    forms (x*x, not pow: libm last-ulp behavior is engine-specific)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        (F.col("l_partkey") % 7).cast("long").alias("part_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.round(F.col("l_discount") * F.col("l_discount"), 4).alias("disc_sq"),
    )


def subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's (rounded) average balance — the
    decorrelated form of a correlated scalar subquery: per-nation aggregate
    joined back (what Catalyst rewrites the subquery to anyway).  Rounding
    the avg to the 2-decimal grid keeps the comparison engine-stable."""
    customer = table(spark, sf_dir, "customer")
    nation_avg = customer.groupBy("c_nationkey").agg(
        F.round(F.avg("c_acctbal"), 2).alias("nation_avg")
    )
    return (
        customer.join(F.broadcast(nation_avg), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_acctbal", "nation_avg")
    )


def join_range_bucketed(
    spark: SparkSession, sf_dir: str, ev: DataFrame | None = None
) -> DataFrame:
    """Range join: (purchase, click) pairs for the same user with the click
    in the hour before the purchase (0 <= purchase_ts - click_ts < 1h).

    Naive non-equi joins plan as nested-loop — quadratic at scale.  The
    scalable formulation bucketizes time and equi-joins on
    (user, hour_bucket), probing each purchase against its own and the
    previous bucket (explode of 2 bucket keys), then applies the exact
    range predicate as a post-filter.  Shuffle is keyed equi-join sized;
    the quadratic term is bounded per (user, hour).

    Skew: a hot user concentrates one (user, hour) key.  Two production
    treatments, both pinned in tests/test_skew_range_join.py: AQE's
    skew-join splits oversized shuffle partitions at runtime (works
    because this is a plain equi-join), and ``join_range_salted`` spreads
    the hot key over n_salt subkeys deterministically.  ``ev`` overrides
    the events relation for fixtures.
    """
    ev = table(spark, sf_dir, "events") if ev is None else ev
    hour = 3600 * 1000 * 1000  # microseconds
    us = "CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.expr(us).alias("click_us"),
        F.expr(f"{us} div {hour}").alias("bucket"),
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.expr(us).alias("purchase_us"),
            F.explode(
                F.array(F.expr(f"{us} div {hour}"), F.expr(f"{us} div {hour} - 1"))
            ).alias("bucket"),
        )
    )
    return (
        purchases.join(clicks, ["user_id", "bucket"])
        .where(
            (F.col("purchase_us") >= F.col("click_us"))
            & (F.col("purchase_us") - F.col("click_us") < hour)
        )
        .select("user_id", "purchase_id", "click_id")
        .distinct()
    )


def join_range_salted(
    spark: SparkSession,
    sf_dir: str,
    ev: DataFrame | None = None,
    n_salt: int = 8,
) -> DataFrame:
    """join_range_bucketed with explicit key salting for hot users.

    Each purchase row carries ONE deterministic salt (hash of its id mod
    n_salt); the click side is replicated across all n_salt values, so
    every qualifying (purchase, click) pair still meets exactly once and
    the hot (user, hour) key's probe work spreads over n_salt shuffle
    partitions.  The replication cost is n_salt x the SMALL side of the
    skewed key — the standard trade.  Result-set equality with the
    unsalted join is pinned on a 50%-hot-user fixture; prefer AQE skew
    handling when available (no replication), salting when the engine's
    runtime re-plan cannot see the skew (e.g. the skewed key feeds a
    later aggregation too).
    """
    ev = table(spark, sf_dir, "events") if ev is None else ev
    hour = 3600 * 1000 * 1000
    us = "CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.expr(us).alias("click_us"),
        F.expr(f"{us} div {hour}").alias("bucket"),
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])).alias("salt"),
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.expr(us).alias("purchase_us"),
            F.explode(
                F.array(F.expr(f"{us} div {hour}"), F.expr(f"{us} div {hour} - 1"))
            ).alias("bucket"),
            F.pmod(F.xxhash64("event_id"), F.lit(n_salt)).cast("int").alias("salt"),
        )
    )
    return (
        purchases.join(clicks, ["user_id", "bucket", "salt"])
        .where(
            (F.col("purchase_us") >= F.col("click_us"))
            & (F.col("purchase_us") - F.col("click_us") < hour)
        )
        .select("user_id", "purchase_id", "click_id")
        .distinct()
    )


def window_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h length, 30m slide): each event lands in two
    overlapping windows.  Spark's window() generates the assignment
    natively; the oracle reproduces it by exploding the two candidate
    window starts per event."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )


WINDOW_SLIDING_SQL = """
SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n
FROM (
    SELECT event_type,
           unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                   time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS w_start,
           ts
    FROM events
)
WHERE ts >= w_start AND ts < w_start + INTERVAL 1 HOUR
GROUP BY w_start, event_type
"""


def sessionize_events(spark: SparkSession, sf_dir: str, gap_minutes: int = 5) -> DataFrame:
    """Per-user sessionization with an inactivity gap: session_window in
    Spark (works in batch groupBy too; streaming twin is the same
    expression + watermark).  Output: (user_id, session_start, session_end,
    n_events) with end = last event + gap — checked against the classic
    gaps-and-islands SQL in DuckDB."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# Boundary note: Spark's session_window MERGES an event at exactly
# prev_ts + gap (pinned by tests/test_sessionize_boundary.py), so the
# oracle's merge condition is `<=` — not `<`.
SESSIONIZE_SQL = """
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 5 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         <= INTERVAL 5 MINUTE THEN 0 ELSE 1 END AS is_new
        FROM events
    )
)
GROUP BY user_id, session_id
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90) per group.  Spark's
    percentile() and DuckDB's quantile_cont() use the same linear
    interpolation over order statistics (verified value-equal); the
    approximate sketch path is percentile_approx/approx_quantile (rows-only
    territory, not declared)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.min("value"), 2).alias("vmin"),
        F.round(F.max("value"), 2).alias("vmax"),
    )


AGG_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(min(value), 2) AS vmin,
       round(max(value), 2) AS vmax
FROM events GROUP BY event_type
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: ((type, day), (type), ()) — finer control
    than rollup/cube, one Expand pass."""
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type, date_trunc('day', ts)), (event_type), ())
        """
    )


def agg_grouping_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE + explicit GROUPING SETS in one pass: the union of
    rollup(r_name, n_name) and cube(r_name, c_mktsegment) expressed as a
    single GROUPING SETS clause — one Expand + one partial-combined hash
    aggregation instead of three scans (the merged declared form of
    agg_rollup_nation_region / agg_cube_region_segment / agg_grouping_sets).

    ``gid`` is the grouping bitmask built from single-argument GROUPING()
    calls (engine-portable, unlike grouping_id() whose bit order is
    implementation-defined); it disambiguates grouping sets that share a
    null pattern."""
    for name in ("customer", "nation", "region"):
        table(spark, sf_dir, name).createOrReplaceTempView(f"{name}_gm")
    return spark.sql(GROUPING_MULTI_SQL_TEMPLATE.format(c="customer_gm", n="nation_gm", r="region_gm"))


GROUPING_MULTI_SQL_TEMPLATE = """
SELECT r_name, n_name, c_mktsegment,
       CAST(grouping(r_name) * 4 + grouping(n_name) * 2 + grouping(c_mktsegment) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_cust,
       round(sum(c_acctbal), 2) AS sum_bal
FROM {c}
JOIN {n} ON c_nationkey = n_nationkey
JOIN {r} ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), (), (r_name, c_mktsegment), (c_mktsegment))
"""

AGG_GROUPING_MULTI_SQL = GROUPING_MULTI_SQL_TEMPLATE.format(
    c="customer", n="nation", r="region"
)


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / EXCEPT / INTERSECT surface in one declared result:
    (clickers ∪ viewers) \\ early-error-ers tagged 'union_except', plus
    clickers ∩ purchasers tagged 'intersect' (the merged declared form of
    set_union_except / set_intersect).  Set ops plan as aggregations /
    null-safe joins on the value columns — shuffle-keyed, skew handled by
    AQE."""
    ue = set_union_except(spark, sf_dir).select(
        F.lit("union_except").alias("op"), "user_id"
    )
    it = set_intersect(spark, sf_dir).select(F.lit("intersect").alias("op"), "user_id")
    return ue.unionByName(it)


SET_OPS_SQL = """
SELECT 'union_except' AS op, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03 00:00:00'
)
UNION ALL
SELECT 'intersect' AS op, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
)
"""


def window_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1h) + sliding (1h length / 30m slide) time-window
    aggregations in one declared result (the merged form of
    batch_tumbling_counts / window_sliding_counts; the streaming twins in
    streamsum_spark.streaming use the window() expressions directly).

    Plan design: both window families are DERIVED from one shared 30-minute
    pre-aggregation — tumble(1h) re-groups the half-hour partials by hour;
    slide(1h/30m) fans each partial out to its 2 overlapping windows
    (explode of the tiny aggregated relation, not the event stream).  The
    two branches share an identical aggregation subtree, so Spark's
    exchange reuse executes the event scan + partial aggregation ONCE —
    at 100 TB this halves the dominant cost vs aggregating each window
    family from the raw scan.  Counts re-sum exactly; value sums re-sum on
    the 0.01 decimal grid (round after the final sum, same convention as
    everywhere else)."""
    ev = table(spark, sf_dir, "events")
    base = ev.groupBy(
        F.window("ts", "30 minutes").getField("start").alias("b30"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n30"), F.sum("value").alias("s30"))
    tumble = (
        base.groupBy(F.date_trunc("hour", "b30").alias("w_start"), "event_type")
        .agg(
            F.sum("n30").cast("long").alias("n"),
            F.round(F.sum("s30"), 2).alias("sum_value"),
        )
        .select(F.lit("tumble").alias("kind"), "w_start", "event_type", "n", "sum_value")
    )
    slide = (
        base.select(
            F.explode(
                F.array(F.col("b30"), F.expr("b30 - INTERVAL 30 MINUTES"))
            ).alias("w_start"),
            "event_type",
            "n30",
            "s30",
        )
        .groupBy("w_start", "event_type")
        .agg(
            F.sum("n30").cast("long").alias("n"),
            F.round(F.sum("s30"), 2).alias("sum_value"),
        )
        .select(F.lit("slide").alias("kind"), "w_start", "event_type", "n", "sum_value")
    )
    return tumble.unionByName(slide)


WINDOW_TIME_BUCKETS_SQL = """
SELECT 'tumble' AS kind, time_bucket(INTERVAL 1 HOUR, ts) AS w_start, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'slide' AS kind, w_start, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
FROM (
    SELECT event_type, value,
           unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                   time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS w_start,
           ts
    FROM events
)
WHERE ts >= w_start AND ts < w_start + INTERVAL 1 HOUR
GROUP BY w_start, event_type
"""


def scalar_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) and null-generating
    scalars (nullif/coalesce/nvl2-shaped CASE) — the null-semantics corner
    of the scalar surface."""
    ev = table(spark, sf_dir, "events")
    masked = F.expr("nullif(event_type, 'error')")
    return ev.select(
        "event_id",
        masked.alias("masked_type"),
        masked.eqNullSafe(F.lit(None).cast("string")).alias("is_error"),
        masked.eqNullSafe("click").alias("is_click"),
        F.coalesce(masked, F.lit("(err)")).alias("type_or_default"),
    )


def profile_events(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Data-profiling pass — the quality gate a pipeline runs before
    trusting a new drop of data: per-column row counts, null counts, and
    distinct cardinalities, computed in ONE aggregation over one
    scan and unpivoted via stack() to a (column, n_rows, n_nulls,
    n_distinct) relation.  Exact count(DISTINCT) keeps it
    oracle-checkable; ``approx=True`` switches every cardinality to
    approx_count_distinct (HLL++, default 5% rsd) — the 100 TB
    substitution, sharing the identical single-scan plan shape with no
    per-column distinct expansion — and is pinned within 5% of exact in
    tests/test_demoted_oracles.py.  Numeric range stats (min/max/mean)
    belong to a typed per-column query, not this uniform relation —
    agg_percentiles and the log-histogram sketch cover
    value-distribution checks."""
    ev = table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    distinct_fn = F.approx_count_distinct if approx else F.countDistinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}__nulls"),
            distinct_fn(c).cast("long").alias(f"{c}__distinct"),
        ]
    row = ev.agg(*aggs)
    stacked = row.select(
        F.expr(
            "stack(%d, %s) AS (column, n_rows, n_nulls, n_distinct)"
            % (
                len(cols),
                ", ".join(
                    f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__distinct`" for c in cols
                ),
            )
        )
    )
    return stacked


PROFILE_EVENTS_SQL = """
WITH a AS (
  SELECT count(*) AS n,
         count(*) - count(event_id) AS null_event_id,
         count(DISTINCT event_id) AS d_event_id,
         count(*) - count(user_id) AS null_user_id,
         count(DISTINCT user_id) AS d_user_id,
         count(*) - count(event_type) AS null_event_type,
         count(DISTINCT event_type) AS d_event_type,
         count(*) - count(value) AS null_value,
         count(DISTINCT value) AS d_value
  FROM events
)
SELECT 'event_id' AS "column", CAST(n AS BIGINT) AS n_rows,
       CAST(null_event_id AS BIGINT) AS n_nulls, CAST(d_event_id AS BIGINT) AS n_distinct FROM a
UNION ALL
SELECT 'user_id', CAST(n AS BIGINT), CAST(null_user_id AS BIGINT), CAST(d_user_id AS BIGINT) FROM a
UNION ALL
SELECT 'event_type', CAST(n AS BIGINT), CAST(null_event_type AS BIGINT), CAST(d_event_type AS BIGINT) FROM a
UNION ALL
SELECT 'value', CAST(n AS BIGINT), CAST(null_value AS BIGINT), CAST(d_value AS BIGINT) FROM a
"""
