"""Relational operator coverage over the TPC-H-ish testdata tables.

Each query instantiates an operator family from SURVEY.md §2 on the
driver-provided tables so the DuckDB oracle can cross-check it:
aggregations (A4/A7), broadcast dictionary joins (J4), anti-join
validation shapes (J1/J2), window ordering / history tails (W3/W5),
sessionization (gap windows), set intersection (U3), tumbling rollups
(the batch analog of the streaming window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical groupBy rollup (A7 analog)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-N: customer revenue by nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    j = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # top-N via sort+limit (TakeOrderedAndProject — distributed partial
    # top-k per partition, no single-partition global window); the rank
    # window then runs on only 20 rows.
    top = agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("rank").cast("long").alias("rank"),
        "c_custkey", "c_name", "n_name", "revenue", "n_orders",
    )


def part_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dictionary join (J4 shape): lineitem enriched with the
    small part dim, revenue per brand."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def broken_part_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 shape: 'edges' (lineitems) whose referenced 'node' is missing
    from a filtered node set (parts with p_size >= 10) -> left anti join;
    report grouped by orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    nodes = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 10).select("p_partkey")
    broken = li.join(nodes, li.l_partkey == nodes.p_partkey, "left_anti")
    return broken.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_broken"),
        F.min("l_partkey").alias("min_partkey"),
    )


def orphan_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 shape: nodes with no qualifying edges — customers with no order
    above 100k (anti join against a filtered edge set)."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


def last_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 shape: conversation-history tail — last 3 events per user under
    stable (ts, event_id) ordering (query.post.ts:93-97 analog)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", F.col("rn").cast("long").alias("rn"), "event_id", "event_type")
    )


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (stateful-window analog done in batch):
    new session when >30min between a user's events; sessions per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional epoch seconds (microsecond precision) — matches DuckDB
    # epoch(); NTZ needs the LTZ hop (session TZ is UTC) before unix_micros
    epoch = F.unix_micros(F.col("ts").cast("timestamp_ltz")) / F.lit(1e6)
    gap = epoch - F.lag(epoch).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window rollup (batch analog of the streaming
    windowed agg): per (day, event_type) counts + value sums."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def purchase_click_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 shape: set intersection — users with both click and purchase."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.intersect(buys)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time: str,
    tiebreak: str,
    carry: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Generic as-of join: every LEFT row gains the latest RIGHT row with
    the same ``key`` and ``right.time <= left.time`` (the time-series
    point-lookup join Spark has no native join type for; DuckDB spells it
    ASOF JOIN).  Output = all left columns + ``prefix``-ed right columns
    (``tiebreak``, ``time``, and each of ``carry``), NULL when no right
    row precedes.

    Plan: union the two streams with a source tag and forward-fill the
    last right row over a ``key``-partitioned window ordered by
    (time, source, tiebreak) — ONE shuffle on the key and a linear sorted
    scan per key.  A naive inequality join is O(left x right-per-key) row
    amplification before its per-row top-1 window; the union form never
    materializes non-winning matches, so it survives a 100x scale-up
    (per-key history fits a partition by construction; a hot key is a
    window-skew problem, not a join-explosion problem).  Tie semantics
    (deterministic): a right row exactly at the left time matches
    (at-or-before — the source tag sorts right rows first); same-time
    right rows resolve to the max ``tiebreak`` (last in the sorted frame).
    """
    lcols = [c for c in left.columns if c != key]
    rcols = [tiebreak] + [c for c in carry if c != tiebreak]
    schema_r = {f.name: f.dataType for f in right.schema.fields}
    schema_l = {f.name: f.dataType for f in left.schema.fields}
    r = right.select(
        F.col(key),
        F.col(time).alias("_t"),
        F.lit(0).alias("_src"),
        *[F.col(c) for c in rcols],
        *[F.lit(None).cast(schema_l[c]).alias(c) for c in lcols],
    )
    lf = left.select(
        F.col(key),
        F.col(time).alias("_t"),
        F.lit(1).alias("_src"),
        *[F.lit(None).cast(schema_r[c]).alias(c) for c in rcols],
        *lcols,
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_src", tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_right = F.last(
        F.when(F.col("_src") == 0, F.struct(F.col("_t").alias(time), *rcols)),
        ignorenulls=True,
    ).over(w)
    return (
        r.unionByName(lf)
        .withColumn("_lo", last_right)
        .filter(F.col("_src") == 1)
        .select(
            key,
            *lcols,
            *[F.col(f"_lo.{c}").alias(f"{prefix}{c}") for c in rcols + [time]],
        )
    )


def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join instance on the testdata tables: each event matched to
    the LATEST order by the same customer at-or-before the event time —
    see ``asof_join`` for the plan and tie semantics (mirrored exactly in
    the DuckDB oracle)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
        "o_totalprice",
    )
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    j = asof_join(
        e, o, key="user_id", time="ts", tiebreak="o_orderkey",
        carry=["o_totalprice"],
    )
    return j.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        F.col("asof_ts").alias("asof_orderdate"),
        F.col("asof_o_totalprice").alias("asof_totalprice"),
    )


#: range-join attribution window: clicks within this many seconds BEFORE
#: a purchase count toward that purchase
RANGE_WINDOW_S = 3600


def range_join_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (interval containment): per purchase event, the count
    and value sum of the same user's clicks inside [purchase - 1h,
    purchase) — the attribution-window query family Spark has no native
    join type for.

    Scalable plan: bin both sides into window-width time buckets and
    equi-join on (key, bucket).  A click strictly before the purchase but
    within the window can only land in the purchase's bucket or the
    previous one (bucket width == window length), so each purchase probes
    exactly 2 buckets (explode of a 2-element array) and the exact
    interval predicate refines the candidates.  The shuffle is keyed by
    (user_id, bucket) — bounded fan-out, never the unbounded row
    amplification of a raw inequality theta-join, and skewed hot users
    split across time buckets.  Inner-join semantics: purchases with no
    in-window click produce no row (mirrored in the oracle).
    """
    w_us = RANGE_WINDOW_S * 1_000_000
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", us.alias("p_us")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "value", us.alias("c_us"))
        .withColumn("bucket", F.floor(F.col("c_us") / w_us))
    )
    probes = p.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.col("p_us") / w_us) - 1, F.floor(F.col("p_us") / w_us)
            )
        ),
    )
    hits = probes.join(c, ["user_id", "bucket"]).filter(
        (F.col("c_us") >= F.col("p_us") - w_us) & (F.col("c_us") < F.col("p_us"))
    )
    return hits.groupBy("purchase_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum("value"), 2).alias("sum_click_value"),
    )


#: quantile levels for the per-type value distribution summary
QUANTILES = (0.5, 0.9, 0.99)


def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value quantiles by EXACT rank pick: the value at
    row ceil(q * n) under a deterministic (value, event_id) total order —
    discrete quantiles, zero floating-point interpolation, so both
    engines select the identical element (percentile_cont-style
    interpolation is engine-order-sensitive FP arithmetic; rank-pick is
    not).  One shuffle for the per-type sort window; at 100 TB swap in
    approx_percentile (t-digest) — the exact form is the oracle-checkable
    contract.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
    )
    aggs = [
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("value")
            )
        ).alias(f"p{int(q * 100)}")
        for q in QUANTILES
    ]
    return ranked.groupBy("event_type").agg(F.max("n").alias("n"), *aggs)


def order_priority_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 shape: type histogram with a validation-style predicate."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") != "F")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )
