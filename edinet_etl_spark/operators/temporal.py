"""Temporal join operators the reference lacks (SURVEY.md §2.3 notes:
"theta/range/as-of/interval joins ... our engine still exposes them").

- **as-of join**: for each event, the latest order at-or-before it per
  user.  Implemented as the distributed union+window pattern — tag
  both sides, sort by (key, time, tag), carry the last order forward
  with ``last(..., ignorenulls=True)``.  ONE hash shuffle on the key;
  no range-condition join, whose candidate blowup is what kills as-of
  at scale.  Ties (several orders on the same date) break to the
  highest order key, pinned on both sides for hash stability.
- **band (range) join**: price-band classification via a broadcast
  non-equi join against a literal bounds table — the plan is a
  BroadcastNestedLoopJoin over 4 rows, i.e. a scan-side predicate,
  not a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from edinet_etl_spark.numeric import _dec_to_double, dec
from edinet_etl_spark.registry import query
from edinet_etl_spark.session import prep
from edinet_etl_spark.tables import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time: str,
    payload: list[str],
    tiebreak: str,
) -> DataFrame:
    """Generic as-of join (union+window form): for each ``left`` row,
    attach the ``payload`` of the latest ``right`` row with the same
    ``key`` and ``time`` at-or-before it (ties inside ``right`` broken
    by ascending ``tiebreak`` — the largest value wins).

    Both inputs must already expose ``key`` and ``time`` under those
    names.  One hash shuffle on ``key``; linear in |left|+|right|.
    """
    lcols = [c for c in left.columns if c not in (key, time)]
    l_tagged = left.select(
        key,
        time,
        F.lit(1).alias("__side"),
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
    )
    r_tagged = right.select(
        key,
        time,
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *payload,
        F.col(tiebreak).alias("__tb"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(time, "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(F.col("__side") == 0, F.struct(*payload)), ignorenulls=True
    ).over(w)
    out_payload = [F.col(f"__asof.{c}").alias(f"asof_{c}") for c in payload]
    return (
        l_tagged.unionByName(r_tagged)
        .withColumn("__asof", carried)
        .filter(F.col("__side") == 1)
        .select(key, time, *lcols, *out_payload)
    )


@query(
    "asof_latest_order_per_event",
    oracle="""
    SELECT event_id, user_id, ts, o_orderkey AS asof_orderkey,
           o_orderdate AS asof_orderdate
    FROM (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
    covers=["J-extended", "W-extended"],
)
def asof_latest_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, union+window form.

    A naive range join (``user_id = o_custkey AND o_orderdate <= ts``
    then argmax) materializes every (event, earlier-order) candidate —
    quadratic per key.  The union+window form is linear: both sides
    shuffle once on the key, sort by event time (order rows first on
    ties via the side tag), and each event row reads the running "last
    order seen".  This is the standard distributed as-of construction
    (same shape Flink/kdb temporal joins use); the SQL oracle states
    the same semantics declaratively.
    """
    prep(spark)
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    od = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
        "o_orderdate",
    )
    return asof_join(
        ev, od, key="user_id", time="ts",
        payload=["o_orderkey", "o_orderdate"], tiebreak="o_orderkey",
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        F.col("asof_o_orderdate").alias("asof_orderdate"),
    )


# p_retailprice spans [900, 1000) in the fixture — bands chosen to
# split it four ways so the join is actually exercised per band.
_BANDS = [
    ("budget", 0.0, 925.0),
    ("mid", 925.0, 950.0),
    ("premium", 950.0, 975.0),
    ("luxury", 975.0, 1e12),
]


@query(
    "part_price_band_join",
    oracle="""
    SELECT band, COUNT(*) AS n_parts,
           CAST(MIN(p_retailprice) AS DOUBLE) AS min_price,
           CAST(MAX(p_retailprice) AS DOUBLE) AS max_price
    FROM part
    JOIN (VALUES ('budget', 0.0, 925.0), ('mid', 925.0, 950.0),
                 ('premium', 950.0, 975.0), ('luxury', 975.0, 1e12))
         AS bands(band, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
    covers=["J-extended"],
)
def part_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: facts against a tiny literal bounds table on
    a pure inequality predicate.  Catalyst plans BroadcastNestedLoop
    with the 4-row side broadcast — per-row predicate evaluation, no
    shuffle of the fact table; the aggregation then shuffles |bands|
    partial rows.  (min/max are exact doubles — no sum → no decimal
    discipline needed.)"""
    prep(spark)
    part = load(spark, sf_dir, "part")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


@query(
    "lineitem_ship_lag_range",
    oracle="""
    SELECT CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS ship_lag_days,
           COUNT(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    """,
    covers=["J-extended", "F4"],
)
def lineitem_ship_lag_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: equi-key plus a time-range predicate.  The equi
    half keeps it a hash join (range applied as a post-join filter in
    the same stage) — the shape to prefer over pure range joins
    whenever any equality key exists."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    j = li.join(od, li.l_orderkey == od.o_orderkey).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("interval 30 days"))
    )
    return j.groupBy(
        F.datediff("l_shipdate", "o_orderdate").alias("ship_lag_days")
    ).agg(F.count("*").alias("n"))


@query(
    "gapfill_locf_hourly",
    oracle="""
    WITH grid AS (
      SELECT u.user_id, g.grid_hour
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                      TIMESTAMP '2024-01-08 00:00:00',
                                      INTERVAL 1 HOUR)) AS grid_hour) g
    ), hourly AS (
      SELECT user_id, grid_hour, hour_value FROM (
        SELECT user_id, date_trunc('hour', ts) AS grid_hour, value AS hour_value,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      ) WHERE rn = 1
    )
    SELECT g.user_id, g.grid_hour,
           LAST_VALUE(h.hour_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.grid_hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g
    LEFT JOIN hourly h ON h.user_id = g.user_id AND h.grid_hour = g.grid_hour
    """,
    covers=["T-gapfill", "W-extended", "F2"],
)
def gapfill_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill a sparse series onto a dense hourly grid with
    last-observation-carried-forward — the timeseries regularization
    step every feature/training pipeline needs before windowed models.

    Spark plan: the grid is users × explode(sequence(...)) — generated,
    never stored; observed hours reduce via one window; the LOCF is a
    second window over the same (user, hour) partitioning, so the whole
    query is ONE hash shuffle on user_id (grid generation is
    broadcast-free: distinct users is a keyed aggregate).  At 100 TB
    the grid stays proportional to users × horizon, not to events.
    Leading hours before a user's first observation stay NULL — no
    fabricated data.
    """
    prep(spark)
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    return gapfill_locf(ev, users, "2024-01-01 00:00:00", "2024-01-08 00:00:00")


def gapfill_locf(ev: DataFrame, users: DataFrame, start: str, end: str) -> DataFrame:
    """Core of gapfill_locf_hourly over any events-shaped frame
    (user_id, ts, value, event_id): dense (users x hours) grid,
    per-hour last observation, LOCF forward fill."""
    spark = ev.sparkSession
    ev = ev.filter(
        (F.col("ts") >= F.lit(start).cast("timestamp"))
        & (F.col("ts") < F.lit(end).cast("timestamp"))
    )
    hours = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr("interval 1 hour"),
            )
        ).alias("grid_hour")
    )
    grid = users.crossJoin(F.broadcast(hours))
    w_pick = Window.partitionBy("user_id", "grid_hour").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    hourly = (
        ev.select(
            "user_id",
            F.date_trunc("hour", "ts").alias("grid_hour"),
            F.col("value").alias("hour_value"),
            "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("user_id", "grid_hour", "hour_value")
    )
    w_locf = (
        Window.partitionBy("user_id")
        .orderBy("grid_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "grid_hour"], "left")
        .withColumn("filled_value", F.last("hour_value", ignorenulls=True).over(w_locf))
        .select("user_id", "grid_hour", "filled_value")
    )


@query(
    "time_weighted_avg_value",
    oracle="""
    WITH stepped AS (
      SELECT user_id, value,
             date_diff('second', ts,
                       LEAD(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)) AS dt
      FROM events
    )
    SELECT user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,8)) * dt) AS VARCHAR) AS DOUBLE)
             / SUM(dt) AS twa_value,
           COUNT(*) AS n_intervals
    FROM stepped
    WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
    ORDER BY user_id
    """,
    covers=["T-twa", "W-extended", "A-extended"],
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user: each observation holds until the
    next one, so it contributes value × holding-seconds.  The standard
    correction for irregularly-sampled series (a plain AVG over-weights
    bursts).  One window (lead) + one aggregate = one shuffle on
    user_id.  The weighted term is computed as DECIMAL(value) × BIGINT
    — decimal×integer arithmetic is exact, so no double product is ever
    rounded.  (Casting the double product value*dt instead breaks at
    ~1e9 magnitudes: |x|·10^8 crosses 2^53 and engines disagree on the
    last ulp — caught by the sf0.1 bit-exactness probe.)  The closing
    division is a single rounding on identical operands in both
    engines.
    """
    prep(spark)
    return time_weighted_avg(load(spark, sf_dir, "events"))


def time_weighted_avg(ev: DataFrame) -> DataFrame:
    """Core of time_weighted_avg_value over any events-shaped frame."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        "user_id",
        "value",
        (
            F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")
        ).alias("dt"),
    ).filter(F.col("dt").isNotNull() & (F.col("dt") > 0))
    return (
        stepped.groupBy("user_id")
        .agg(
            (
                F.sum(dec(F.col("value")) * F.col("dt")).cast("string").cast("double")
                / F.sum("dt")
            ).alias("twa_value"),
            F.count("*").alias("n_intervals"),
        )
        .orderBy("user_id")
    )


@query(
    "hourly_ohlc_bars",
    oracle="""
    WITH ranked AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour_start,
             value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
               ORDER BY ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM events)
    SELECT user_id, hour_start,
           MAX(CASE WHEN rn_first = 1 THEN value END) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX(CASE WHEN rn_last = 1 THEN value END) AS close_value,
           COUNT(*) AS n_events
    FROM ranked
    GROUP BY user_id, hour_start
    """,
    covers=["TS-downsample", "A-extended", "A2"],
)
def hourly_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to OHLC bars (the hypertable /
    financial-tick "candlestick" rollup): per user per hour, the
    first/highest/lowest/last value.

    Spark side uses ``min_by``/``max_by`` keyed on the (ts, event_id)
    struct — ONE hash aggregation, no window sort at all; the oracle
    derives the same bars with the classic double-ROW_NUMBER window
    SQL.  That asymmetry is deliberate: at 100 TB the aggregate form
    shuffles one partial row per (user, hour) per partition while the
    window form must sort every event — `max_by(value, struct)` is the
    scalable plan.  Open/close/high/low are raw values (no float
    accumulation), so portability is free; the (ts, event_id) struct
    makes simultaneous events deterministic."""
    prep(spark)
    return ohlc_bars(load(spark, sf_dir, "events"))


def ohlc_bars(ev: DataFrame) -> DataFrame:
    """Hourly OHLC aggregation over an (event_id, ts, user_id, value)
    frame — factored for property tests (model equivalence for ANY
    event sequence, `tests/test_properties.py`)."""
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_start")
        )
        .agg(
            F.min_by("value", order_key).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", order_key).alias("close_value"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "trailing_hour_user_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,8))) OVER w AS VARCHAR) AS DOUBLE)
             / COUNT(*) OVER w AS trailing_avg,
           COUNT(*) OVER w AS n_trailing
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
    covers=["TS-sliding", "W-range-frame", "A-extended"],
)
def trailing_hour_user_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time range frame: each event's trailing one-hour average
    value for its user — `rangeBetween` measured in SECONDS over the
    event-time axis (the frame the year-axis query in analytics.py
    can't express).  Spark range frames need a numeric ordering column,
    so the frame orders by epoch MICROSECONDS (`unix_timestamp` would
    truncate to whole seconds and disagree with DuckDB's micro-exact
    INTERVAL frame on sub-second data — caught by the sf0.1 tri-scale
    differential); DuckDB's INTERVAL-RANGE frame is the identical
    [ts−3600s, ts] microsecond window, UTC pinned on both engines.

    One shuffle on user_id; the running frame is computed by a single
    ordered scan per partition — no self-join against the hour
    neighborhood, which is the naive O(n·k) formulation.  The frame sum
    is an exact decimal (ties in frame membership are value-exact), the
    average one correctly-rounded division."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        # ts is TIMESTAMP_NTZ; unix_micros needs LTZ — the cast is an
        # identity on the instant because prep() pins the session to UTC
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp_ltz")))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    frame_sum = (
        F.sum(dec(F.col("value"))).over(w).cast("string").cast("double")
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (frame_sum / F.count("*").over(w)).alias("trailing_avg"),
        F.count("*").over(w).alias("n_trailing"),
    )


_NBR_EPS = 0.05  # true pair predicate: |Δprice| <= eps
_NBR_BIN = 0.1  # candidate bin width (> eps so ±1 bins cover all pairs)
# Coverage invariant of the ±1-bin candidate explode: two values within
# eps can sit at most one bin apart ONLY while bin width exceeds eps.
# Tuning eps above the bin width would silently drop true pairs.
assert _NBR_BIN > _NBR_EPS, "±1-bin coverage requires _NBR_BIN > _NBR_EPS"


@query(
    "price_neighbor_pairs_binned",
    oracle=f"""
    SELECT CAST(FLOOR(a.p_retailprice / 10.0) AS INT) AS price_decade,
           COUNT(*) AS n_pairs,
           MIN(ABS(a.p_retailprice - b.p_retailprice)) AS min_gap,
           MAX(ABS(a.p_retailprice - b.p_retailprice)) AS max_gap
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND ABS(a.p_retailprice - b.p_retailprice) <= {_NBR_EPS}
    GROUP BY 1
    """,
    covers=["J-extended"],
)
def price_neighbor_pairs_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range self-join (|Δprice| ≤ ε) executed as a BINNED
    equi-join — the scale rewrite for range predicates with NO equality
    key, where Catalyst's only native plan is BroadcastNestedLoop
    (O(n·m) comparisons and a broadcast that can't fit at lake scale).

    The bin trick: bucket values into width-w bins (w > ε); the left
    side keeps its own bin, the right side explodes into {{b-1, b, b+1}}.
    Any pair within ε is then guaranteed to share a candidate bin (and
    shares exactly ONE, since the un-exploded side has a single bin), so
    a hash equi-join on the bin key + the exact residual predicate
    returns precisely the true pairs.  Cost: 3× one side's rows through
    a hash shuffle — linear, partitionable, AQE-skew-splittable —
    versus the nested-loop's quadratic probe.  The oracle is the
    direct quadratic join: values must be identical, only the plan
    differs.  (Same technique generalizes to interval overlap and
    proximity joins on time or geohash.)"""
    prep(spark)
    part = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    a = part.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_retailprice").alias("a_price"),
        F.floor(F.col("p_retailprice") / _NBR_BIN).alias("bin"),
    )
    b = part.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_retailprice").alias("b_price"),
        F.explode(
            F.array(
                F.floor(F.col("p_retailprice") / _NBR_BIN) - 1,
                F.floor(F.col("p_retailprice") / _NBR_BIN),
                F.floor(F.col("p_retailprice") / _NBR_BIN) + 1,
            )
        ).alias("bin"),
    )
    gap = F.abs(F.col("a_price") - F.col("b_price"))
    pairs = a.join(b, "bin").filter(
        (F.col("a_key") < F.col("b_key")) & (gap <= _NBR_EPS)
    )
    return pairs.groupBy(
        F.floor(F.col("a_price") / 10.0).cast("int").alias("price_decade")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.min(gap).alias("min_gap"),
        F.max(gap).alias("max_gap"),
    )


@query(
    "gapfill_linear_interp",
    oracle="""
    WITH grid AS (
      SELECT u.user_id, g.grid_hour
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                      TIMESTAMP '2024-01-08 00:00:00',
                                      INTERVAL 1 HOUR)) AS grid_hour) g
    ), hourly AS (
      SELECT user_id, grid_hour, hour_value FROM (
        SELECT user_id, date_trunc('hour', ts) AS grid_hour, value AS hour_value,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      ) WHERE rn = 1
    ), edges AS (
      SELECT g.user_id, g.grid_hour,
             CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                            g.grid_hour) AS BIGINT) AS h,
             LAST_VALUE(h.hour_value IGNORE NULLS) OVER w_back AS prev_v,
             LAST_VALUE(CASE WHEN h.hour_value IS NOT NULL
                        THEN CAST(date_diff('hour',
                                  TIMESTAMP '2024-01-01 00:00:00',
                                  g.grid_hour) AS BIGINT) END
                        IGNORE NULLS) OVER w_back AS prev_h,
             FIRST_VALUE(h.hour_value IGNORE NULLS) OVER w_fwd AS next_v,
             FIRST_VALUE(CASE WHEN h.hour_value IS NOT NULL
                         THEN CAST(date_diff('hour',
                                   TIMESTAMP '2024-01-01 00:00:00',
                                   g.grid_hour) AS BIGINT) END
                         IGNORE NULLS) OVER w_fwd AS next_h
      FROM grid g
      LEFT JOIN hourly h ON h.user_id = g.user_id AND h.grid_hour = g.grid_hour
      WINDOW w_back AS (PARTITION BY g.user_id ORDER BY g.grid_hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_fwd AS (PARTITION BY g.user_id ORDER BY g.grid_hour
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, grid_hour,
           CASE
             WHEN prev_v IS NULL THEN NULL
             WHEN next_v IS NULL THEN prev_v
             ELSE prev_v + (next_v - prev_v)
                  * (CAST(h - prev_h AS DOUBLE)
                     / CAST(next_h - prev_h AS DOUBLE))
           END AS interp_value
    FROM edges
    """,
    covers=["T-gapfill", "W-extended"],
)
def gapfill_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with LINEAR interpolation — `gapfill_locf_hourly`'s
    sibling for continuous signals (sensor values, prices) where a
    step function biases downstream features: missing hours get the
    straight line between the surrounding observations, the tail after
    the last observation carries forward, leading hours stay NULL.

    Exactness: the time fraction is a ratio of exact int64 hour
    offsets; interp = prev + (next-prev) * frac is three sequential
    IEEE ops on engine-identical doubles — a fixed expression tree,
    correctly rounded the same everywhere (no accumulation).  The
    per-hour observation pick pins ties by (ts, event_id) DESC.

    Scale: same law as LOCF — grid = users x horizon (generated, not
    stored), ONE hash shuffle on user_id; the backward and forward
    IGNORE NULLS windows share that partitioning, so adding the second
    direction costs no extra exchange.  At 100 TB the horizon is
    bounded (a week here); per-user state is the window frame, never
    the corpus."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    return gapfill_interp(
        ev, users, "2024-01-01 00:00:00", "2024-01-08 00:00:00"
    )


def gapfill_interp(
    ev: DataFrame, users: DataFrame, start: str, end: str
) -> DataFrame:
    """Linear-interpolation gap-fill core over any events-shaped frame
    (user_id, ts, value, event_id) — factored like `gapfill_locf` so
    the hypothesis model test can drive it."""
    spark = ev.sparkSession
    ev = ev.filter(
        (F.col("ts") >= F.lit(start).cast("timestamp"))
        & (F.col("ts") < F.lit(end).cast("timestamp"))
    )
    hours = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr("interval 1 hour"),
            )
        ).alias("grid_hour")
    )
    grid = users.crossJoin(F.broadcast(hours))
    w_pick = Window.partitionBy("user_id", "grid_hour").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    hourly = (
        ev.select(
            "user_id",
            F.date_trunc("hour", "ts").alias("grid_hour"),
            F.col("value").alias("hour_value"),
            "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("user_id", "grid_hour", "hour_value")
    )
    h = (
        (
            F.col("grid_hour").cast("long")
            - F.lit(start).cast("timestamp").cast("long")
        )
        / 3600
    ).cast("bigint")
    joined = grid.join(hourly, ["user_id", "grid_hour"], "left").select(
        "user_id",
        "grid_hour",
        h.alias("h"),
        "hour_value",
        F.when(F.col("hour_value").isNotNull(), h).alias("obs_h"),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("grid_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "Nearest following observation" as a CUMULATIVE frame over DESC
    # hour order (exclusive of current): Spark evaluates growing
    # cumulative frames incrementally (O(horizon) per user), while a
    # literal [1 FOLLOWING, UNBOUNDED FOLLOWING] frame rescans the
    # remainder per row (O(horizon^2) — measured 4.2x on the 10x probe
    # before this rewrite; 'forward pass as reversed backward pass' is
    # the standard fix).
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("grid_hour"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    edges = joined.select(
        "user_id",
        "grid_hour",
        "h",
        F.last("hour_value", ignorenulls=True).over(w_back).alias("prev_v"),
        F.last("obs_h", ignorenulls=True).over(w_back).alias("prev_h"),
        F.last("hour_value", ignorenulls=True).over(w_fwd).alias("next_v"),
        F.last("obs_h", ignorenulls=True).over(w_fwd).alias("next_h"),
    )
    frac = (F.col("h") - F.col("prev_h")).cast("double") / (
        F.col("next_h") - F.col("prev_h")
    ).cast("double")
    return edges.select(
        "user_id",
        "grid_hour",
        F.when(F.col("prev_v").isNull(), F.lit(None).cast("double"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac
        )
        .alias("interp_value"),
    )


@query(
    "business_day_ship_lag",
    oracle="""
    WITH lags AS (
      SELECT
        (5 * ((CAST(date_diff('day', DATE '1970-01-01',
                    CAST(l_shipdate AS DATE)) AS BIGINT) + 3) // 7)
         + LEAST((CAST(date_diff('day', DATE '1970-01-01',
                       CAST(l_shipdate AS DATE)) AS BIGINT) + 3) % 7, 5))
        -
        (5 * ((CAST(date_diff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) AS BIGINT) + 3) // 7)
         + LEAST((CAST(date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) + 3) % 7, 5))
        AS bday_lag
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= o_orderdate
    )
    SELECT CAST(bday_lag AS BIGINT) AS bday_lag,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lags GROUP BY bday_lag ORDER BY bday_lag
    """,
    covers=["T-calendar", "F4", "J-extended"],
)
def business_day_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping lag in BUSINESS days (weekends excluded) — the
    calendar-intelligence form of `lineitem_ship_lag_range` that SLA
    reporting actually wants ("shipped within 5 business days").

    The business-day count uses a closed form, not a calendar table:
    with m = epoch_day + 3 (so m % 7 == 0 ⇔ Monday), business days
    since epoch B = 5·(m div 7) + min(m mod 7, 5); the lag is
    B(ship) − B(order).  Pure int64 div/mod — no engine weekday
    function is trusted (Spark's dayofweek is 1=Sunday, DuckDB's is
    0=Sunday; the epoch-day formula sidesteps the mismatch class
    entirely).

    Scale: the equi-join is the same hash shape as the raw-lag query;
    the histogram collapses map-side to ≤ a few thousand lag values."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    epoch = F.lit("1970-01-01").cast("date")

    def bdays(col: str) -> F.Column:
        m = F.datediff(F.col(col).cast("date"), epoch).cast("bigint") + 3
        # (m - m%7)/7 is an exact integer (≪ 2^53), so the double
        # division is lossless; m is always positive here (dates ≥1992)
        weeks = ((m - (m % 7)) / F.lit(7)).cast("bigint")
        return F.lit(5) * weeks + F.least(m % 7, F.lit(5))

    j = li.join(od, li.l_orderkey == od.o_orderkey).filter(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    lag = (bdays("l_shipdate") - bdays("o_orderdate")).cast("bigint")
    return (
        j.select(lag.alias("bday_lag"))
        .groupBy("bday_lag")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("bday_lag")
    )


@query(
    "peak_open_orders",
    oracle="""
    WITH spans AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o.o_orderdate AS DATE)) AS BIGINT) AS d0,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(MAX(l.l_shipdate) AS DATE)) AS BIGINT) AS d1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
      SELECT d, CAST(SUM(delta) AS BIGINT) AS delta FROM (
        SELECT d0 AS d, 1 AS delta FROM spans
        UNION ALL
        SELECT d1 + 1 AS d, -1 AS delta FROM spans
      ) GROUP BY d
    ),
    running AS (
      SELECT d,
             SUM(delta) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_orders
      FROM deltas
    )
    SELECT CAST(year(DATE '1970-01-01' + CAST(d AS INT)) AS BIGINT) AS yr,
           CAST(MAX(open_orders) AS BIGINT) AS peak_open,
           MIN(CASE WHEN open_orders = mx THEN DATE '1970-01-01'
                    + CAST(d AS INT) END) AS peak_day
    FROM (
      SELECT d, open_orders,
             MAX(open_orders) OVER (
               PARTITION BY year(DATE '1970-01-01' + CAST(d AS INT))) AS mx
      FROM running
    )
    GROUP BY year(DATE '1970-01-01' + CAST(d AS INT))
    ORDER BY yr
    """,
    covers=["T-sweepline", "W-extended", "A-extended"],
)
def peak_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open orders per year — the sweep-line
    interval-concurrency operator (concurrent sessions, hospital beds,
    connection pools): each order is open from its order date to its
    last line's ship date; +1/−1 boundary deltas accumulate along
    the timeline and the running sum IS the concurrency curve, read
    out as each year's peak and the first day it was hit.

    Exactness: days are epoch-day int64 throughout (no engine date
    arithmetic in the math path); the running sum, peaks, and the
    argmin-day election are pure integers; only the readable peak_day
    converts back to DATE (epoch + int, exact in both engines).

    Scale: spans collapse per order map-side; the boundary-delta table
    collapses to DISTINCT days — calendar-bounded like
    `compaction_bin_packing`, so the partition-less cumulative window
    is constant-size regardless of order volume.  The naive
    alternative (self-join orders against days) is quadratic; the
    sweep line is linear plus a bounded scan."""
    prep(spark)
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    epoch = F.lit("1970-01-01").cast("date")
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("rmax"))
        .select(
            F.datediff(F.col("o_orderdate").cast("date"), epoch)
            .cast("bigint")
            .alias("d0"),
            F.datediff(F.col("rmax").cast("date"), epoch)
            .cast("bigint")
            .alias("d1"),
        )
    )
    deltas = (
        spans.select(F.col("d0").alias("d"), F.lit(1).alias("delta"))
        .unionAll(spans.select((F.col("d1") + 1).alias("d"), F.lit(-1).alias("delta")))
        .groupBy("d")
        .agg(F.sum("delta").cast("bigint").alias("delta"))
    )
    wrun = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = deltas.select(
        "d", F.sum("delta").over(wrun).alias("open_orders")
    )
    day = F.date_add(epoch, F.col("d").cast("int"))
    yr = F.year(day).cast("bigint")
    wyr = Window.partitionBy(yr)
    flagged = running.select(
        "d",
        "open_orders",
        yr.alias("yr"),
        F.max("open_orders").over(wyr).alias("mx"),
        day.alias("day"),
    )
    return (
        flagged.groupBy("yr")
        .agg(
            F.max("open_orders").cast("bigint").alias("peak_open"),
            F.min(
                F.when(F.col("open_orders") == F.col("mx"), F.col("day"))
            ).alias("peak_day"),
        )
        .orderBy("yr")
    )


_EWMA_K = 20  # events per user entering the average (lag 0..K-1)


@query(
    "ewma_user_value_halflife",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, value, ts, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) - 1
               AS lag
      FROM events
    ), recent AS (
      SELECT * FROM ranked WHERE lag < {_EWMA_K}
    ), agg AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events_used,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,8))
                               * CAST(1::BIGINT << ({_EWMA_K - 1} - lag)
                                      AS DECIMAL(10,0)))
                  AS VARCHAR) AS DOUBLE) AS wsum,
             SUM(1::BIGINT << ({_EWMA_K - 1} - lag)) AS wtot,
             CAST(CAST(MAX(CASE WHEN lag = 0 THEN value END)
                  AS DECIMAL(18,8)) AS DOUBLE) AS latest_value
      FROM recent GROUP BY user_id
    )
    SELECT user_id, n_events_used,
           wsum / CAST(wtot AS DOUBLE) AS ewma_value,
           latest_value
    FROM agg ORDER BY user_id
    """,
    covers=["W-extended", "A-extended", "F1-F4"],
)
def ewma_user_value_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event value with half-life = one event
    (alpha = 1/2), the standard recency-weighted engagement score.
    EWMA is a recursive definition most engines can't fold into a
    window; the closed form Σ value·2^-lag / Σ 2^-lag over the last
    K=20 events CAN be — and by scaling to INTEGER weights 2^(K-1-lag)
    (a bit shift, exact in any engine) the weighted sum rides the
    decimal discipline and the single final division is correctly
    rounded: bit-exact on any partitioning, no libm anywhere.

    Scale: one window rank + one map-side-combinable aggregate, both
    on user_id — a single hash shuffle of the fact stream; weights are
    computed inside codegen.  The K cap both bounds the integer
    weights (2^19·value < 10^10, inside DECIMAL(18,8)) and is the
    semantic dial: lag-K contributions are < 2^-19 of the score."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    recent = (
        ev.select("user_id", "value", "ts", "event_id")
        .withColumn("lag", F.row_number().over(w) - 1)
        .filter(F.col("lag") < _EWMA_K)
    )
    # F.shiftleft only takes a literal bit count; the SQL form shifts
    # by a column (codegen integer op, same as the oracle's `1 << x`)
    wt = F.expr(f"shiftleft(cast(1 as bigint), {_EWMA_K} - 1 - lag)")
    # decimal-FIRST multiply (CLAUDE.md magnitude bound): value*2^19
    # as a double reaches ~3e8, past the 2^53/10^8 portability limit of
    # a post-hoc decimal cast; dec(value) x dec(wt) is exact instead
    agg = recent.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events_used"),
        F.sum(dec(F.col("value")) * wt.cast("decimal(10,0)"))
        .cast("string")
        .cast("double")
        .alias("wsum"),
        F.sum(wt).alias("wtot"),
        F.max(F.when(F.col("lag") == 0, F.col("value")))
        .cast("decimal(18,8)")
        .cast("double")
        .alias("latest_value"),
    )
    return agg.select(
        "user_id",
        "n_events_used",
        (F.col("wsum") / F.col("wtot").cast("double")).alias("ewma_value"),
        "latest_value",
    ).orderBy("user_id")


# Shared KM event-grid CTE: per-user (first event, first purchase),
# censor-at-horizon observation times, the day grid, and the risk set
# — all BIGINT arithmetic up to this point.  Reused verbatim by
# kaplan_meier_conversion and its diagnostic probes so a red probe
# names the exact diverging stage.
#
# Round-9 rewrite (VERDICT r8 task 1): `km_grid_probe` went driver-RED
# on pure-BIGINT output, proving the 3-round divergence lives in the
# old aggregated-MIN/MAX → CAST AS DATE → date_diff path and/or the
# suffix-frame window, NOT in float rounding.  Both suspects are gone:
# the time axis is now CALENDAR-FREE — every timestamp becomes an
# epoch-day BIGINT *before* aggregation via
# ``epoch_us // 86_400_000_000`` (the CAST pins µs explicitly in case
# the engine reads the fixture's TIMESTAMP_NS natively; all event
# instants are post-1970, so floor and truncating division agree) —
# and the risk set is total-minus-prefix over the grid instead of a
# suffix frame.  Nothing in KM needs calendar semantics: only day
# DELTAS matter, and integer subtraction is the same in every engine.
_KM_RISK_CTE = """
    ev_days AS (
      SELECT user_id, event_type,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                  AS BIGINT) AS day
      FROM events
    ), per_user AS (
      SELECT user_id,
             MIN(day) AS d_first,
             MIN(CASE WHEN event_type = 'purchase' THEN day END) AS d_purch
      FROM ev_days GROUP BY user_id
    ), horizon AS (
      SELECT MAX(day) AS h FROM ev_days
    ), obs AS (
      SELECT CASE WHEN d_purch IS NOT NULL THEN d_purch - d_first
                  ELSE horizon.h - d_first END AS t,
             CASE WHEN d_purch IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_user, horizon
    ), grid AS (
      SELECT t,
             CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c
      FROM obs GROUP BY t
    ), risk AS (
      SELECT t, d, c,
             CAST(SUM(d + c) OVER ()
                  - COALESCE(SUM(d + c) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS n_at_risk
      FROM grid
    )
"""


def _km_risk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_KM_RISK_CTE``: the (t, d, c, n_at_risk) grid.

    One user-keyed combinable aggregate collapses the corpus to
    per-user rows, then a day grid bounded by the observation span
    (~30 rows); the risk windows run on that constant-size grid, never
    on data.

    Calendar-free (round 9): the ``.cast("timestamp")`` is the NTZ→LTZ
    hop `unix_micros` needs (a no-op on the nanos-fixture path, which
    already yields LTZ); under `prep`'s pinned-UTC session the result
    is the raw epoch-µs integer, and ``div`` on post-1970 instants
    matches the oracle's floor ``//``.  Day conversion happens
    PRE-aggregation so both engines aggregate plain BIGINTs — no
    aggregated-timestamp representation ever crosses an engine
    boundary.  The risk set is total-minus-prefix (two frames sharing
    one ORDER BY t sort) rather than a suffix frame."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("day").alias("d_first"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("day"))
        ).alias("d_purch"),
    )
    horizon = ev.agg(F.max("day").alias("h"))
    has = F.col("d_purch").isNotNull()
    obs = per_user.crossJoin(F.broadcast(horizon)).select(
        F.when(has, F.col("d_purch") - F.col("d_first"))
        .otherwise(F.col("h") - F.col("d_first"))
        .alias("t"),
        has.cast("int").alias("ev"),
    )
    grid = obs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        (F.count("*") - F.sum("ev")).cast("bigint").alias("c"),
    )
    # risk set = observations at-or-after t, spelled total-minus-prefix
    # over the grid itself — one window sort, no suffix frame, and no
    # separate count() action (which would re-run the per-user
    # aggregation: the corpus_drift_report lesson)
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prefix = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    dc = F.col("d") + F.col("c")
    return grid.withColumn(
        "n_at_risk",
        (
            F.sum(dc).over(w_all)
            - F.coalesce(F.sum(dc).over(w_prefix), F.lit(0))
        ).cast("bigint"),
    )


@query(
    "km_grid_probe",
    oracle=f"""
    WITH {_KM_RISK_CTE}
    SELECT t AS time_days, d AS n_events_at, c AS n_censored_at,
           n_at_risk
    FROM risk ORDER BY time_days
    """,
    covers=["A-extended", "W-extended"],
)
def km_grid_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostic probe 1 for the kaplan_meier_conversion driver-env
    divergence (VERDICT r7 task 1): emit ONLY the pure-BIGINT event
    grid (t, d, c, n_at_risk) — no doubles anywhere.  Its round-8 RED
    proved the divergence lived in the old calendar path (aggregated
    timestamps → DATE → date_diff + suffix frame); the grid is now
    calendar-free epoch-day integer arithmetic (round 9, see
    ``_KM_RISK_CTE``).  A green row exonerates every integer stage;
    `km_obs_probe` sits one grain earlier if it ever reds again."""
    prep(spark)
    return _km_risk_frame(spark, sf_dir).select(
        F.col("t").alias("time_days"),
        F.col("d").alias("n_events_at"),
        F.col("c").alias("n_censored_at"),
        "n_at_risk",
    ).orderBy("time_days")


@query(
    "km_obs_probe",
    oracle=f"""
    WITH {_KM_RISK_CTE}
    SELECT user_id, d_first, d_purch,
           CASE WHEN d_purch IS NOT NULL THEN 1 ELSE 0 END AS ev
    FROM per_user ORDER BY user_id
    """,
    covers=["A-extended", "F1-F4"],
)
def km_obs_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostic probe 0 for the KM family, at the PRE-grid grain
    (VERDICT r8 task 1): per-user absolute epoch-day BIGINTs for first
    event and first purchase — the raw material every later KM stage
    is built from.  A red driver row here means the engine pair
    disagrees on the timestamp→epoch-day integer itself (fixture
    decode or µs truncation); a green row plus a red grid row would
    pin any residual divergence on grid arithmetic alone."""
    prep(spark)
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("day").alias("d_first"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("day"))
            ).alias("d_purch"),
        )
        .select(
            "user_id",
            "d_first",
            "d_purch",
            F.col("d_purch").isNotNull().cast("int").alias("ev"),
        )
        .orderBy("user_id")
    )


@query(
    "km_factor_probe",
    oracle=f"""
    WITH {_KM_RISK_CTE}
    SELECT t AS time_days, n_at_risk,
           CAST(n_at_risk - d AS DOUBLE) / n_at_risk AS hazard_factor
    FROM risk WHERE d > 0 ORDER BY time_days
    """,
    covers=["A-extended", "W-extended"],
)
def km_factor_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostic probe 2 for the KM divergence: each row carries ONE
    correctly-rounded division of exact BIGINTs — no chained product.
    Green here + green grid probe pins any remaining KM divergence on
    the survival-product fold; red here means the driver's engine pair
    disagrees on a single IEEE division (which would be new physics —
    division is correctly rounded everywhere)."""
    prep(spark)
    risk = _km_risk_frame(spark, sf_dir)
    return (
        risk.filter(F.col("d") > 0)
        .select(
            F.col("t").alias("time_days"),
            "n_at_risk",
            (
                (F.col("n_at_risk") - F.col("d")).cast("double")
                / F.col("n_at_risk")
            ).alias("hazard_factor"),
        )
        .orderBy("time_days")
    )


@query(
    "kaplan_meier_conversion",
    oracle=f"""
    WITH RECURSIVE {_KM_RISK_CTE}, fac AS (
      SELECT t, d, c, n_at_risk,
             CAST(n_at_risk - d AS DOUBLE) / n_at_risk AS factor,
             ROW_NUMBER() OVER (ORDER BY t) AS rn
      FROM risk
    ), km AS (
      SELECT rn, t, d, c, n_at_risk,
             CAST(1.0 AS DOUBLE) * factor AS survival
      FROM fac WHERE rn = 1
      UNION ALL
      SELECT f.rn, f.t, f.d, f.c, f.n_at_risk,
             k.survival * f.factor
      FROM km k JOIN fac f ON f.rn = k.rn + 1
    )
    SELECT t AS time_days, n_at_risk, d AS n_events_at,
           c AS n_censored_at,
           CAST(CAST(CAST(survival AS DECIMAL(18,8)) AS VARCHAR)
                AS DOUBLE) AS survival
    FROM km WHERE d > 0 ORDER BY time_days
    """,
    covers=["A-extended", "W-extended", "LLM-eval"],
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit estimator of time-to-first-purchase
    per user, with REAL right-censoring: users who never purchase are
    censored at the observation horizon (global max event time), at a
    censor time that varies per user -- the survival curve ("what
    fraction of users are still unconverted after t days?") a growth /
    SLA monitor publishes, and the censoring-aware statistic none of
    the moment-based summaries can substitute (dropping never-buyers
    biases conversion fast, counting them as converted biases it up).
    The reference has no survival surface; this extends the temporal
    family (SURVEY.md section 2.3 extensions).

    Exactness, per the no-libm discipline: each hazard factor
    (n_i-d_i)/n_i is ONE correctly-rounded division of exact integers
    (risk set = total minus cumulative prior events+censorings, all
    bigint); the survival product is ORDER-PINNED BY CONSTRUCTION on
    both sides: the oracle walks a recursive CTE (survival_1 =
    1.0*factor_1, survival_t = survival_{t-1}*factor_t over
    ROW_NUMBER-ranked grid rows), and Spark left-folds an
    `array_sort`ed (t, factor) struct array with an explicit 1.0 seed
    -- the identical ascending-t multiplication sequence.

    Round-8 hardening (VERDICT r7 task 1): the published `survival`
    column is QUANTIZED through the repo's own float discipline --
    DECIMAL(18,8) -> string -> double on BOTH sides -- absorbing any
    sub-1e-8 divergence; 8 decimals is beyond any consumer's use of a
    survival curve, so semantics are unchanged.

    Round-9 root fix (VERDICT r8 task 1): `km_grid_probe` going RED on
    pure-BIGINT output falsified the float-rounding premise -- the
    driver divergence lived in the integer TIME GRID (aggregated
    timestamps -> CAST AS DATE -> date_diff, plus the suffix-frame
    window).  ``_KM_RISK_CTE`` is now calendar-free: timestamps become
    epoch-day BIGINTs pre-aggregation (`epoch_us // 86_400_000_000` on
    both sides) and the risk set is total-minus-prefix.  The probes
    `km_obs_probe` (pre-grid grain), `km_grid_probe` (pure-BIGINT
    grid) and `km_factor_probe` (single divisions) localize the stage
    if this row ever reds again; `tests/test_km_model.py` replays the
    same grid with stdlib ints to separate repo-wrong from engine-pair
    divergence in one glance.

    Scale: one user-keyed combinable aggregate collapses the corpus
    to per-user (first event, first purchase) rows, then to a day
    grid bounded by the observation span (~30 rows) -- the cumulative
    risk and product windows run on that constant-size grid, never on
    data.  10x the events is the same grid."""
    prep(spark)
    risk = _km_risk_frame(spark, sf_dir)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    factor = (
        (F.col("n_at_risk") - F.col("d")).cast("double") / F.col("n_at_risk")
    )
    return (
        risk.withColumn("factor", factor)
        .withColumn(
            "survival",
            # array_sort on (t, factor) structs pins ascending-t fold
            # order regardless of collect_list accumulation order;
            # F.aggregate is a documented left fold with explicit seed.
            _dec_to_double(
                dec(
                    F.aggregate(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.struct(F.col("t"), F.col("factor"))
                                ).over(w_cum)
                            ),
                            lambda s: s["factor"],
                        ),
                        F.lit(1.0),
                        lambda acc, x: acc * x,
                    )
                )
            ),
        )
        .filter(F.col("d") > 0)
        .select(
            F.col("t").alias("time_days"),
            "n_at_risk",
            F.col("d").alias("n_events_at"),
            F.col("c").alias("n_censored_at"),
            "survival",
        )
        .orderBy("time_days")
    )


@query(
    "asof_tolerance_enrich",
    oracle="""
    SELECT event_id, user_id, ts, o_orderkey AS asof_orderkey,
           o_orderdate AS asof_orderdate,
           o_orderkey IS NOT NULL AS matched
    FROM (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
       AND o.o_orderdate >= e.ts - INTERVAL 30 DAY
    ) WHERE rn = 1
    """,
    covers=["J-extended", "W-extended"],
)
def asof_tolerance_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH A STALENESS TOLERANCE — the feature-store
    `max_staleness` semantic: each event takes the latest order
    at-or-before it, but only if that order is ≤30 days old at event
    time; older matches surface as NULL (stale features must not leak
    into training rows — a silent 9-month-old "latest order" is worse
    than none).  Composes the linear union+window `asof_join` (no
    range-join candidate blowup) with a post-pick tolerance mask —
    equivalent to restricting the join window, because if the LATEST
    match is stale every earlier one is staler.

    Scale: identical to `asof_latest_order_per_event` (one hash
    shuffle on the key); the mask is a codegen'd comparison, free."""
    prep(spark)
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    od = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
        "o_orderdate",
    )
    joined = asof_join(
        ev, od, key="user_id", time="ts",
        payload=["o_orderkey", "o_orderdate"], tiebreak="o_orderkey",
    )
    fresh = F.col("asof_o_orderdate") >= F.col("ts") - F.expr(
        "INTERVAL 30 DAYS"
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("asof_o_orderkey")).alias("asof_orderkey"),
        F.when(fresh, F.col("asof_o_orderdate")).alias("asof_orderdate"),
        F.coalesce(fresh, F.lit(False)).alias("matched"),
    )


@query(
    "max_drawdown_per_user",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts,
             SUM(CASE WHEN event_type IN ('purchase', 'signup')
                      THEN CAST(value AS DECIMAL(18,8))
                      ELSE -CAST(value AS DECIMAL(18,8)) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS bal
      FROM events
    ), peaks AS (
      SELECT user_id, event_id, ts, bal,
             MAX(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS peak
      FROM seq
    ), ranked AS (
      SELECT user_id, event_id, bal, peak, peak - bal AS ddv,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY peak - bal DESC, ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_ev,
             FIRST_VALUE(bal) OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS fin,
             MAX(peak) OVER (PARTITION BY user_id) AS pk
      FROM peaks
    )
    SELECT user_id, CAST(n_ev AS BIGINT) AS n_events,
           CAST(CAST(fin AS VARCHAR) AS DOUBLE) AS final_balance,
           CAST(CAST(pk AS VARCHAR) AS DOUBLE) AS peak_balance,
           CAST(CAST(ddv AS VARCHAR) AS DOUBLE) AS max_drawdown,
           event_id AS trough_event_id
    FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
    covers=["W-extended", "A-extended", "EV-timeseries"],
)
def max_drawdown_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's running net-flow balance — the
    peak-to-trough risk statistic every portfolio/engagement monitor
    publishes: credits (purchase, signup values) raise the balance,
    debits (view/click/error values) lower it; the drawdown at time t
    is the gap between the running peak and the current balance, and
    the max over t is the worst excursion.  Emits the trough event id
    (deepest point, earliest such row on ties) alongside final and
    peak balances.

    Exactness: the running balance is a cumulative SUM of DECIMAL(18,8)
    values — exact and associative, so the engine's window-accumulation
    strategy (incremental vs segment-tree) cannot perturb it; running
    peak and drawdown stay in decimal, and each output converts once
    via the string hop (`numeric._dec_to_double`).  The argmax row is
    pinned by (drawdown DESC, ts, event_id).

    Scale: ONE hash shuffle on user_id; three window passes over the
    same (user_id, ts, event_id) sort order — Spark reuses the single
    sort for all of them (one Exchange, one Sort in the plan); no
    driver loops, no self-joins.  Per-user state is O(1) per row."""
    prep(spark)
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    signed = F.when(
        F.col("event_type").isin("purchase", "signup"), dec(F.col("value"))
    ).otherwise(-dec(F.col("value")))
    w_seq = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_last = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_user = Window.partitionBy("user_id")
    seq = ev.withColumn("bal", F.sum(signed).over(w_seq))
    peaks = seq.withColumn("peak", F.max("bal").over(w_seq))
    ddv = F.col("peak") - F.col("bal")
    ranked = peaks.select(
        "user_id",
        "event_id",
        ddv.alias("ddv"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                ddv.desc(), "ts", "event_id"
            )
        )
        .alias("rn"),
        F.count("*").over(w_user).alias("n_ev"),
        F.first("bal").over(w_last).alias("fin"),
        F.max("peak").over(w_user).alias("pk"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_ev").cast("bigint").alias("n_events"),
            _dec_to_double(F.col("fin")).alias("final_balance"),
            _dec_to_double(F.col("pk")).alias("peak_balance"),
            _dec_to_double(F.col("ddv")).alias("max_drawdown"),
            F.col("event_id").alias("trough_event_id"),
        )
        .orderBy("user_id")
    )


# Seasonal-naive rolling backtest: the forecasting-eval harness every
# capacity/demand pipeline runs before trusting a model — score the
# naive baselines (y_hat(t) = y(t - season)) over every rolling
# origin, because a model that cannot beat seasonal-naive MAE is
# noise.  Dials prefixed per CLAUDE.md.
_SNB_SEASONS = ((24, "naive_24h"), (168, "naive_168h"))


def _snb_arm_sql(lag_h: int, label: str) -> str:
    return f"""
      SELECT '{label}' AS method,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(CAST(SUM(CASE WHEN a.v >= b.v THEN a.v - b.v
                                ELSE b.v - a.v END) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS mae,
             CAST(CAST(SUM(a.v - b.v) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS bias
      FROM grid a JOIN grid b ON b.h = a.h - {lag_h} * 3600
    """


@query(
    "seasonal_naive_backtest",
    oracle="""
    WITH grid AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
             SUM(CAST(value AS DECIMAL(18,8))) AS v
      FROM events GROUP BY 1
    )
    """
    + " UNION ALL ".join(_snb_arm_sql(lag, label) for lag, label in _SNB_SEASONS)
    + " ORDER BY method",
    covers=["EV-timeseries", "A-extended", "LLM-eval"],
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the two seasonal-naive forecasters
    (daily and weekly lag) over the hourly value series: for every
    hour with a reference observation one season earlier, the
    forecast error is y(t) − y(t−season); emits per method the number
    of scored origins, MAE, and signed bias — the baseline scorecard
    any real forecasting model must beat, and the drift alarm when a
    pipeline's seasonality assumption breaks.

    Exactness: the hourly series is an exact DECIMAL sum; errors and
    their sums stay in decimal (|a−b| via a CASE on exact decimals, so
    no float subtraction ever reorders), and each output is ONE
    string-hop conversion then ONE division.  The season join is on
    integer epoch-hours — gaps in the grid exclude origins on both
    engines identically (no positional lag that would misalign on
    gaps).

    Scale: one map-side-combinable collapse to the hour grid (constant
    size per day of data), then two self-equi-joins ON THE GRID — the
    fact table is scanned once; everything after is grid-sized."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    grid = (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
            .cast("bigint")
            .alias("h")
        )
        .agg(F.sum(dec(F.col("value"))).alias("v"))
        .localCheckpoint(eager=True)
    )
    arms = []
    for lag_h, label in _SNB_SEASONS:
        b = grid.select(
            (F.col("h") + F.lit(lag_h * 3600)).alias("h"),
            F.col("v").alias("vb"),
        )
        j = grid.join(b, "h")
        err = F.col("v") - F.col("vb")
        abs_err = F.when(F.col("v") >= F.col("vb"), F.col("v") - F.col("vb")).otherwise(
            F.col("vb") - F.col("v")
        )
        arms.append(
            j.agg(
                F.lit(label).alias("method"),
                F.count("*").cast("bigint").alias("n_points"),
                (_dec_to_double(F.sum(abs_err)) / F.count("*")).alias("mae"),
                (_dec_to_double(F.sum(err)) / F.count("*")).alias("bias"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("method")


# SCD2 point-in-time consumption (the read-side twin of
# analytics.scd2_customer_dim's merge): every 3rd customer's segment
# changes at _PIT_CHANGE.  Dials prefixed per CLAUDE.md.
_PIT_CHANGE = "1995-07-01 00:00:00"
_PIT_NEWSEG = "RELOCATED"


@query(
    "scd2_point_in_time_join",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment AS seg,
             TIMESTAMP '1992-01-01 00:00:00' AS valid_from,
             CASE WHEN c_custkey % 3 = 0
                  THEN TIMESTAMP '{_PIT_CHANGE}' END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, '{_PIT_NEWSEG}', TIMESTAMP '{_PIT_CHANGE}', NULL
      FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT d.seg AS segment_at_order,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,8))) AS VARCHAR)
                AS DOUBLE) AS revenue
    FROM orders o JOIN dim d ON d.c_custkey = o.o_custkey
     AND o.o_orderdate >= d.valid_from
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    GROUP BY 1 ORDER BY 1
    """,
    covers=["J-extended", "W-extended", "X-maintenance"],
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (effective-dated) join against a type-2 slowly-
    changing dimension — the canonical CONSUMPTION of the versioned
    dim `scd2_customer_dim` maintains: each order joins the customer
    version valid AT o_orderdate (every 3rd customer's segment flips
    to {_PIT_NEWSEG} at {_PIT_CHANGE[:10]}), then revenue rolls up by
    the segment AS OF the order.  Joining today's dim instead is the
    classic time-travel bug this operator exists to prevent.

    The ORACLE spells the textbook range join
    (valid_from <= t < valid_to); the Spark side runs the engine's
    union+window as-of construction (`asof_join`): version rows and
    order rows union, shuffle ONCE on custkey, sort by event time, and
    each order reads the running "latest version seen".  Linear in
    |orders|+|versions| — never the per-key quadratic candidate
    blowup of a naive range join, and no broadcast assumption (the dim
    grows with SF).  Values match bit-for-bit because the join is
    row-exact and revenue rides the decimal discipline."""
    prep(spark)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    change = F.to_timestamp(F.lit(_PIT_CHANGE))
    v1 = cust.select(
        F.col("c_custkey").alias("ck"),
        F.to_timestamp(F.lit("1992-01-01 00:00:00")).alias("t"),
        F.col("c_mktsegment").alias("seg"),
    )
    v2 = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .select(
            F.col("c_custkey").alias("ck"),
            change.alias("t"),
            F.lit(_PIT_NEWSEG).alias("seg"),
        )
    )
    dim = v1.unionByName(v2).withColumn("ver", F.col("t"))
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").alias("t"),
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        orders, dim, key="ck", time="t", payload=["seg"], tiebreak="ver"
    )
    return (
        joined.groupBy(F.col("asof_seg").alias("segment_at_order"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            _dec_to_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
        )
        .orderBy("segment_at_order")
    )


@query(
    "nelson_aalen_hazard",
    oracle=f"""
    WITH {_KM_RISK_CTE}, terms AS (
      SELECT t, d, n_at_risk,
             CAST(d AS DOUBLE) / n_at_risk AS hazard_increment,
             CAST(CAST(d AS DOUBLE) / n_at_risk AS DECIMAL(18,8)) AS inc
      FROM risk
    ), na AS (
      SELECT t, d, n_at_risk, hazard_increment,
             SUM(inc) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS ch
      FROM terms
    )
    SELECT t AS time_days, n_at_risk, d AS n_events_at, hazard_increment,
           CAST(CAST(ch AS VARCHAR) AS DOUBLE) AS cum_hazard
    FROM na WHERE d > 0 ORDER BY time_days
    """,
    covers=["A-extended", "W-extended", "LLM-eval"],
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator of time-to-first-purchase
    -- the additive sibling of `kaplan_meier_conversion` on the SAME
    right-censored (t, d, c, n_at_risk) grid (``_KM_RISK_CTE``):
    H(t) = sum_{t_i <= t} d_i / n_i.  Survival analysts publish both
    (H feeds log-rank tests and -ln S diagnostics); for this repo it is
    ALSO the third KM diagnostic: its arithmetic replaces KM's chained
    product with the repo's battle-proven decimal SUM, so a red KM row
    next to a green NA row isolates the driver-env divergence to
    product-fold rounding specifically.

    Exactness: each increment d_i/n_i is ONE correctly-rounded division
    of exact BIGINTs; the cumulative sum rides DECIMAL(18,8) (exact,
    associative, order-free -- `numeric.py` discipline), surfaced
    through the string hop.  No libm anywhere.

    Scale: identical to KM -- one user-keyed combinable aggregate
    collapses the corpus to per-user rows, then a calendar-bounded
    ~30-row grid; every window runs on the grid, never on data."""
    prep(spark)
    risk = _km_risk_frame(spark, sf_dir)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    inc = dec(F.col("d").cast("double") / F.col("n_at_risk"))
    return (
        risk.withColumn(
            "cum_hazard", _dec_to_double(F.sum(inc).over(w_cum))
        )
        .filter(F.col("d") > 0)
        .select(
            F.col("t").alias("time_days"),
            "n_at_risk",
            F.col("d").alias("n_events_at"),
            (F.col("d").cast("double") / F.col("n_at_risk")).alias(
                "hazard_increment"
            ),
            "cum_hazard",
        )
        .orderBy("time_days")
    )


def interval_union_per_key(spans: DataFrame) -> DataFrame:
    """Merge overlapping [s, e] integer intervals per key and return one
    row per (k, island) with the island's bounds and member count --
    the classic sweep: sort by start within key, flag a new island
    whenever a start clears the running max end of everything before
    it, and the running flag-sum IS the island id.

    Intervals are INCLUSIVE integer day spans, so islands merge on
    adjacency as well as overlap ([0,5] + [6,10] is one unbroken busy
    run): a new island starts only when s > prev_max_end + 1.

    Input columns: k, ok (a unique per-interval tie-break), s, e
    (BIGINT, e >= s), and optionally cnt (BIGINT) when a row stands for
    several pre-collapsed intervals — n_spans then sums cnt.  One hash
    shuffle on k; both windows share the single (k; s, e, ok) sort.
    Per-key cost is linear in rows.
    """
    w_ord = Window.partitionBy("k").orderBy("s", "e", "ok")
    prev_max = F.max("e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max + 1), 1).otherwise(
            0
        ),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    n_spans = (
        F.sum("cnt") if "cnt" in spans.columns else F.count("*")
    ).cast("bigint")
    return islands.groupBy("k", "island_id").agg(
        F.min("s").alias("i_start"),
        F.max("e").alias("i_end"),
        n_spans.alias("n_spans"),
    )


@query(
    "interval_union_coverage",
    oracle="""
    WITH spans AS (
      SELECT l.l_suppkey AS k, o.o_orderkey AS ok,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o.o_orderdate AS DATE)) AS BIGINT) AS s,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(MAX(l.l_shipdate) AS DATE)) AS BIGINT) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_suppkey, o.o_orderkey, o.o_orderdate
    ), cells AS (
      SELECT k, s, MAX(e) AS e, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM spans GROUP BY k, s
    ), flagged AS (
      SELECT k, s, e, cnt,
             CASE WHEN MAX(e) OVER (PARTITION BY k ORDER BY s, e, s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  OR s > MAX(e) OVER (PARTITION BY k ORDER BY s, e, s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                  THEN 1 ELSE 0 END AS new_island
      FROM cells
    ), islands AS (
      SELECT k, s, e, cnt,
             SUM(new_island) OVER (PARTITION BY k ORDER BY s, e, s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
      FROM flagged
    ), per_island AS (
      SELECT k, island_id, MIN(s) AS i_start, MAX(e) AS i_end,
             CAST(SUM(cnt) AS BIGINT) AS n_spans
      FROM islands GROUP BY k, island_id
    )
    SELECT k AS suppkey,
           CAST(SUM(n_spans) AS BIGINT) AS n_spans,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(i_end - i_start + 1) AS BIGINT) AS covered_days,
           CAST(MAX(i_end) - MIN(i_start) + 1 AS BIGINT) AS span_days,
           CAST(SUM(i_end - i_start + 1) AS DOUBLE)
             / (MAX(i_end) - MIN(i_start) + 1) AS busy_ratio
    FROM per_island GROUP BY k ORDER BY suppkey
    """,
    covers=["T-sweepline", "W-extended", "A-extended"],
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier interval-UNION coverage: each (supplier, order) is
    busy from the order date to its last ship date; overlapping or
    day-adjacent spans merge (inclusive integer days — see
    `interval_union_per_key`), and the output is each supplier's total covered days, island
    count, and busy ratio over its active range -- the utilization /
    uptime operator (machine busy-time, call-center occupancy, SLA
    coverage) that `peak_open_orders` 's global concurrency curve does
    not answer.  Quadratic self-join formulations die at scale; this is
    the linear per-key sweep.

    Exactness: epoch-day BIGINT throughout (same no-engine-date-math
    discipline as peak_open_orders); island flags, ids, and coverage
    sums are pure integers; busy_ratio is ONE correctly-rounded
    division at the end.  Window order ties break by (s, e, ok) with ok
    unique, so island assignment is total-order pinned on both sides.

    Scale: spans collapse per (supplier, order) off the orders |X|
    lineitem join, then COLLAPSE AGAIN to (supplier, start-day) cells
    -- valid because every interval contains its own start day, so
    same-start intervals always share an island and only their MAX end
    matters; counts ride along as cnt.  The windowed sweep therefore
    runs on at most keys x calendar-days rows NO MATTER THE FACT
    VOLUME (the peak_open_orders boundedness argument, per key): 10x
    or 100x the orders grows only the map-side-combinable collapse,
    not the sort.  Supplier keys are uniform (no skew); nothing is
    quadratic.  (First cut windowed the raw (supplier, order) grain
    and probed 6.2x at the 10x rung -- the cell collapse is what makes
    the sweep data-volume-free.)"""
    prep(spark)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    epoch = F.to_date(F.lit("1970-01-01"))
    spans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_suppkey").alias("k"),
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderdate"),
        )
        .agg(F.max("l_shipdate").alias("ship_max"))
        .select(
            "k",
            "ok",
            F.datediff(F.to_date("o_orderdate"), epoch)
            .cast("bigint")
            .alias("s"),
            F.datediff(F.to_date("ship_max"), epoch)
            .cast("bigint")
            .alias("e"),
        )
    )
    cells = (
        spans.groupBy("k", "s")
        .agg(
            F.max("e").alias("e"),
            F.count("*").cast("bigint").alias("cnt"),
        )
        .withColumn("ok", F.col("s"))
    )
    per_island = interval_union_per_key(cells)
    return (
        per_island.groupBy(F.col("k").alias("suppkey"))
        .agg(
            F.sum("n_spans").cast("bigint").alias("n_spans"),
            F.count("*").cast("bigint").alias("n_islands"),
            F.sum(F.col("i_end") - F.col("i_start") + 1)
            .cast("bigint")
            .alias("covered_days"),
            (F.max("i_end") - F.min("i_start") + 1)
            .cast("bigint")
            .alias("span_days"),
            (
                F.sum(F.col("i_end") - F.col("i_start") + 1).cast("double")
                / (F.max("i_end") - F.min("i_start") + 1)
            ).alias("busy_ratio"),
        )
        .orderBy("suppkey")
    )
