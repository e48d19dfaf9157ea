"""Round-2 batch F registry additions — data reconciliation, marketing
attribution, robust despiking, and funnel timing:

- ``table_diff_checksum``: Merkle-style bucket-checksum table diff
  (order-free 48-bit row hashes summed per bucket, drill-down row
  compare restricted to mismatched buckets),
- ``events_attribution_last_touch``: last-touch marketing attribution
  (purchase events attributed to the latest preceding click/view
  within a 7-day lookback) via one union + ordered window,
- ``ts_hampel_filter``: rolling-median / rolling-MAD despiking filter
  (the robust alternative to z-score spike detection),
- ``conversion_lag_histogram``: signup-to-first-purchase lag
  distribution (time-to-convert funnel metric).

Same contract as :mod:`gibbon_spark.queries`: every Spark plan is
paired with a DuckDB oracle replaying identical arithmetic.

Reference scope note: none of these exist in the reference codec
library (johshoff/gibbon, ``src/*.rs``); they are requested engine
surface beyond the reference (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gibbon_spark.queries import _prep, money_sum, money_sum_sql, query

# =========================================================================
# Merkle-style bucket-checksum table diff
# =========================================================================

_DIFF_BUCKETS = 64
_CORRUPT_MOD = 200  # ~0.5% of rows perturbed in the simulated replica


@query(
    "table_diff_checksum",
    f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_orderkey % {_DIFF_BUCKETS} AS bucket
      FROM orders
    ),
    b AS (  -- simulated replica with deterministic 1-cent corruption
      SELECT o_orderkey, o_orderstatus, bucket,
             cents + CASE WHEN ('0x' || substr(md5('corrupt:' || o_orderkey),
                                               1, 4))::INTEGER
                               % {_CORRUPT_MOD} = 0
                          THEN 1 ELSE 0 END AS cents
      FROM base
    ),
    ca AS (
      SELECT bucket, count(*) AS n_rows,
             sum(CAST(('0x' || substr(md5(concat_ws('|', o_orderkey,
                        o_orderstatus, cents)), 1, 12))::BIGINT
                      AS DECIMAL(38,0))) AS cksum
      FROM base GROUP BY bucket
    ),
    cb AS (
      SELECT bucket, count(*) AS n_rows,
             sum(CAST(('0x' || substr(md5(concat_ws('|', o_orderkey,
                        o_orderstatus, cents)), 1, 12))::BIGINT
                      AS DECIMAL(38,0))) AS cksum
      FROM b GROUP BY bucket
    ),
    mism AS (
      SELECT ca.bucket FROM ca JOIN cb USING (bucket)
      WHERE ca.cksum <> cb.cksum OR ca.n_rows <> cb.n_rows
    ),
    drill AS (
      SELECT base.bucket, count(*) AS n_diff_rows
      FROM base JOIN b USING (o_orderkey)
      WHERE base.bucket IN (SELECT bucket FROM mism)
        AND base.cents <> b.cents
      GROUP BY base.bucket
    )
    SELECT ca.bucket, ca.n_rows,
           (ca.cksum = cb.cksum AND ca.n_rows = cb.n_rows) AS checksums_match,
           CAST(coalesce(drill.n_diff_rows, 0) AS BIGINT) AS n_diff_rows
    FROM ca JOIN cb USING (bucket)
    LEFT JOIN drill ON drill.bucket = ca.bucket
    """,
)
def q_table_diff_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style table reconciliation (the anti-entropy pattern for
    verifying a 100 TB replica without moving the data): hash every row
    to 48 bits, SUM the hashes per key bucket (order-free — a decimal
    sum needs no sort and distributes perfectly), compare per-bucket
    (count, checksum) between the table and a simulated replica with
    ~0.5% deterministic 1-cent corruption, then drill down with a
    row-level compare restricted to the mismatched buckets only.

    Scale posture: phase 1 moves |buckets| rows per side (64 here;
    thousands in production), NOT table rows — each side is one
    map-side-combined aggregate. The row-level drill-down join is
    key-partitioned and pre-filtered to mismatched buckets, so its cost
    is proportional to the corruption footprint, not the table. Float
    prices are integerized to cents (floor(x*100+0.5)) before hashing —
    string-rendering doubles differs across engines; integers do not.
    """
    (orders,) = _prep(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        (F.col("o_orderkey") % _DIFF_BUCKETS).alias("bucket"),
    )
    corrupt = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("corrupt:"), F.col("o_orderkey").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % _CORRUPT_MOD
        == 0
    ).cast("bigint")
    b = base.withColumn("cents", F.col("cents") + corrupt)

    def cksums(df: DataFrame) -> DataFrame:
        row_hash = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", "o_orderkey", "o_orderstatus", "cents")), 1, 12
            ),
            16,
            10,
        ).cast("bigint")
        return df.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(row_hash.cast("decimal(38,0)")).alias("cksum"),
        )

    ca = cksums(base)
    cb = cksums(b)
    both = ca.alias("ca").join(cb.alias("cb"), "bucket")
    mism = both.where(
        (F.col("ca.cksum") != F.col("cb.cksum"))
        | (F.col("ca.n_rows") != F.col("cb.n_rows"))
    ).select("bucket")
    drill = (
        base.join(F.broadcast(mism), "bucket", "leftsemi")
        .alias("a")
        .join(b.select("o_orderkey", "cents").alias("r"), "o_orderkey")
        .where(F.col("a.cents") != F.col("r.cents"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_diff_rows"))
    )
    return (
        both.join(drill, "bucket", "left")
        .select(
            "bucket",
            F.col("ca.n_rows").alias("n_rows"),
            (
                (F.col("ca.cksum") == F.col("cb.cksum"))
                & (F.col("ca.n_rows") == F.col("cb.n_rows"))
            ).alias("checksums_match"),
            F.coalesce(F.col("n_diff_rows"), F.lit(0)).cast("bigint").alias(
                "n_diff_rows"
            ),
        )
    )


# =========================================================================
# Last-touch marketing attribution
# =========================================================================

_ATTR_LOOKBACK_DAYS = 7


@query(
    "events_attribution_last_touch",
    f"""
    WITH p AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_id, event_type AS channel FROM events
      WHERE event_type IN ('click', 'view')
    ),
    a AS (
      SELECT p.event_id, p.value,
             (SELECT t.channel FROM t
              WHERE t.user_id = p.user_id AND t.ts <= p.ts
                AND t.ts >= p.ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
              ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS channel
      FROM p
    )
    SELECT coalesce(channel, 'none') AS channel,
           count(*) AS n_purchases,
           {money_sum_sql("value")} AS revenue
    FROM a GROUP BY coalesce(channel, 'none')
    """,
)
def q_events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase event is
    attributed to the user's most recent click/view at-or-before the
    purchase within a 7-day lookback (ties at the same timestamp break
    to the highest event id); purchases with no qualifying touch fall
    into the 'none' channel. Emits revenue and purchase counts per
    channel.

    Scale posture: the Spark plan is the UNION + ordered-window as-of
    shape (same discipline as ts_asof_join): touches and purchases
    union into one frame, ONE shuffle on user_id, and
    last(_, ignorenulls) over (ts, kind, event_id) carries the latest
    touch forward — no per-purchase probe, no range self-join fan-out.
    The DuckDB oracle states the same semantics as a correlated
    top-1 subquery (fine at oracle SF; the window form is the 100 TB
    plan). The lookback filter is applied AFTER touch selection —
    identical semantics because any in-window touch is later than every
    out-of-window one for the same purchase.
    """
    (events,) = _prep(spark, sf_dir, "events")
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    touches = events.where(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("channel"),
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_p"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("string").alias("channel"),
        "value",
        F.lit(1).alias("is_p"),
    )
    u = touches.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch_ts = F.last(F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True).over(w)
    touch_ch = F.last(
        F.when(F.col("is_p") == 0, F.col("channel")), ignorenulls=True
    ).over(w)
    attributed = (
        u.withColumn("t_ts", touch_ts)
        .withColumn("t_ch", touch_ch)
        .where(F.col("is_p") == 1)
        .select(
            F.coalesce(
                F.when(
                    F.col("t_ts")
                    >= F.col("ts") - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAYS"),
                    F.col("t_ch"),
                ),
                F.lit("none"),
            ).alias("channel"),
            "value",
        )
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        money_sum(F.col("value")).alias("revenue"),
    )


# =========================================================================
# Hampel despiking filter (rolling median + rolling MAD)
# =========================================================================

_HAMPEL_K = 3.0


@query(
    "ts_hampel_filter",
    f"""
    WITH m AS (
      SELECT event_id, user_id, ts, value,
             round(quantile_cont(value, 0.5)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   + 1e-9, 4) AS roll_med
      FROM events
    ),
    d AS (
      SELECT *, round(abs(value - roll_med) + 1e-9, 4) AS dev FROM m
    ),
    s AS (
      SELECT event_id, user_id, roll_med, dev,
             round(quantile_cont(dev, 0.5)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   + 1e-9, 4) AS roll_mad
      FROM d
    )
    SELECT event_id, user_id, roll_med, roll_mad,
           (dev > {_HAMPEL_K} * roll_mad) AS is_spike
    FROM s
    """,
)
def q_ts_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel despiking filter: per series, a centered 7-row rolling
    median and a rolling MAD of the deviations from it; a point is a
    spike when its deviation exceeds 3x the local MAD. The robust
    twin of ts_anomaly_zscore — a single outlier inflates a rolling
    stddev and masks itself, but cannot move a rolling median.

    Parity discipline: the rolling median and MAD are quantized
    (round + 1e-9, 4 dp) before reuse, so the deviation column and the
    3*MAD threshold compare bit-identically in both engines.

    Scale posture: both window passes share one partitioning
    (user_id) and one sort (ts, event_id) — Spark plans a single
    Exchange + Sort feeding two Window operators back to back. Frames
    are bounded (7 rows), state is O(frame). At 100 TB this is one
    shuffle of the events table, the same cost envelope as any
    per-series smoother."""
    (events,) = _prep(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 3)
    m = events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(F.expr("percentile(value, 0.5)").over(w) + F.lit(1e-9), 4).alias(
            "roll_med"
        ),
    ).withColumn("dev", F.round(F.abs(F.col("value") - F.col("roll_med")) + F.lit(1e-9), 4))
    s = m.withColumn(
        "roll_mad",
        F.round(F.expr("percentile(dev, 0.5)").over(w) + F.lit(1e-9), 4),
    )
    return s.select(
        "event_id",
        "user_id",
        "roll_med",
        "roll_mad",
        (F.col("dev") > F.lit(_HAMPEL_K) * F.col("roll_mad")).alias("is_spike"),
    )


# =========================================================================
# Signup-to-first-purchase conversion lag histogram
# =========================================================================


@query(
    "conversion_lag_histogram",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT user_id, min(ts) AS first_purchase_ts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    lagd AS (
      SELECT s.user_id,
             CASE WHEN p.first_purchase_ts >= s.signup_ts
                  THEN date_diff('day', s.signup_ts, p.first_purchase_ts)
                  END AS lag_days
      FROM s LEFT JOIN p USING (user_id)
    )
    SELECT CASE
             WHEN lag_days IS NULL THEN 'no_purchase_after_signup'
             WHEN lag_days = 0 THEN 'same_day'
             WHEN lag_days <= 7 THEN 'within_week'
             WHEN lag_days <= 30 THEN 'within_month'
             ELSE 'over_month' END AS lag_bucket,
           count(*) AS n_users,
           CAST(min(lag_days) AS BIGINT) AS min_days,
           CAST(max(lag_days) AS BIGINT) AS max_days
    FROM lagd
    GROUP BY 1
    """,
)
def q_conversion_lag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert funnel metric: for every signed-up user, the lag
    in days from first signup to first purchase AT OR AFTER signup,
    bucketed into a conversion-lag histogram (same-day / within a week
    / within a month / longer / never). Users whose only purchases
    precede their signup count as unconverted — the guard the naive
    min(purchase)-min(signup) difference gets wrong.

    Scale posture: two filtered map-side-combined min-aggregates shrink
    events to one row per user per stage BEFORE the join (the same
    pre-shrink discipline as cohort_retention); the join and final
    rollup are user-keyed. Integer day lags → hash-exact parity.
    """
    (events,) = _prep(spark, sf_dir, "events")
    s = (
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    lagd = s.join(p, "user_id", "left").select(
        F.when(
            F.col("first_purchase_ts") >= F.col("signup_ts"),
            F.datediff(
                F.col("first_purchase_ts").cast("date"),
                F.col("signup_ts").cast("date"),
            ),
        ).alias("lag_days")
    )
    bucket = (
        F.when(F.col("lag_days").isNull(), "no_purchase_after_signup")
        .when(F.col("lag_days") == 0, "same_day")
        .when(F.col("lag_days") <= 7, "within_week")
        .when(F.col("lag_days") <= 30, "within_month")
        .otherwise("over_month")
    )
    return (
        lagd.groupBy(bucket.alias("lag_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("lag_days").cast("bigint").alias("min_days"),
            F.max("lag_days").cast("bigint").alias("max_days"),
        )
    )
