"""Registry section: event-flow analytics (sessionization, funnels,
retention cohorts) over the events table — operators/eventflow.py.

Time parity: Spark derives int64 epoch-micros from events.ts via
session.ts_micros (dtype-adaptive — nanos-long or TIMESTAMP_NTZ fixture
generations), DuckDB via `epoch_ns(ts) // 1000`. Retention uses pure
int64 epoch-day numbers — no calendar/timezone semantics anywhere.
DuckDB window/group sums over INTEGER go HUGEINT → every count/index is
cast ::BIGINT. events.value carries 2dp fixture values, so sums are
2dp-exact and round(…, 2) is boundary-safe.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from semantic_cpp_spark.operators import eventflow
from semantic_cpp_spark.registry import register
from semantic_cpp_spark.session import load_table, ts_micros

_GAP_US = 30 * 60 * 1_000_000


def _events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("tus", ts_micros(ev))


@register(
    "evt_sessionize",
    f"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tus, value
                   FROM events),
    f AS (SELECT *,
                 CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id
                                                ORDER BY tus, event_id) IS NULL
                        OR tus - lag(tus) OVER (PARTITION BY user_id
                                                ORDER BY tus, event_id) > {_GAP_US}
                      THEN 1 ELSE 0 END AS ns
          FROM e),
    s AS (SELECT *,
                 (sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_idx
          FROM f)
    SELECT user_id, session_idx,
           min(tus) AS t_start, max(tus) AS t_end,
           max(tus) - min(tus) AS dur_us,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM s GROUP BY user_id, session_idx""",
)
def evt_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gap) + per-session rollup
    (operators.eventflow.sessionize/session_summary): one window
    partitioned by user (lag + running sum share a single
    exchange+sort), then a groupBy already co-partitioned with it."""
    ev = _events(spark, sf_dir)
    return eventflow.session_summary(ev, gap_us=_GAP_US)


@register(
    "evt_funnel_signup_view_purchase",
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t
                  FROM events
                  WHERE event_type IN ('signup', 'view', 'purchase')),
    a1 AS (SELECT user_id,
                  min(CASE WHEN event_type = 'signup' THEN t END) AS t_1
           FROM e GROUP BY user_id),
    a2 AS (SELECT e.user_id, min(t) AS t_2
           FROM e JOIN a1 ON e.user_id = a1.user_id
           WHERE event_type = 'view' AND t > t_1 GROUP BY e.user_id),
    a3 AS (SELECT e.user_id, min(t) AS t_3
           FROM e JOIN a2 ON e.user_id = a2.user_id
           WHERE event_type = 'purchase' AND t > t_2 GROUP BY e.user_id)
    SELECT a1.user_id, t_1, t_2, t_3,
           (CASE WHEN t_3 IS NOT NULL THEN 3
                 WHEN t_2 IS NOT NULL THEN 2
                 WHEN t_1 IS NOT NULL THEN 1
                 ELSE 0 END)::BIGINT AS stage
    FROM a1
    LEFT JOIN a2 ON a1.user_id = a2.user_id
    LEFT JOIN a3 ON a1.user_id = a3.user_id""",
)
def evt_funnel(spark, sf_dir):
    """Ordered funnel signup→view→purchase (operators.eventflow.funnel):
    per user, earliest step-k event strictly after step k−1. Conditional
    mins keyed on user_id throughout — the raw event log is scanned
    once, never self-joined per step."""
    ev = _events(spark, sf_dir)
    return eventflow.funnel(ev, ["signup", "view", "purchase"])


@register(
    "evt_retention_cohorts",
    """WITH ud AS (SELECT DISTINCT user_id,
                          (epoch_ns(ts) // 1000) // 86400000000 AS d
                   FROM events),
    f AS (SELECT user_id, min(d) AS cohort_day FROM ud GROUP BY user_id)
    SELECT cohort_day::BIGINT AS cohort_day,
           (d - cohort_day)::BIGINT AS day_offset,
           count(DISTINCT ud.user_id)::BIGINT AS n_users
    FROM ud JOIN f USING (user_id)
    GROUP BY cohort_day, d - cohort_day""",
)
def evt_retention(spark, sf_dir):
    """Retention cohort matrix (operators.eventflow.retention_cohorts):
    cohort = first-activity epoch-day (pure int64 day numbers — no
    calendar/tz semantics), cells count distinct active cohort users
    per day offset."""
    ev = _events(spark, sf_dir)
    return eventflow.retention_cohorts(ev)


@register(
    "evt_interval_join_1h",
    """WITH e AS (SELECT event_id, user_id, event_type,
                         epoch_ns(ts) // 1000 AS tus
                  FROM events),
       s AS (SELECT user_id, event_id AS signup_id, tus AS s_t
             FROM e WHERE event_type = 'signup'),
       p AS (SELECT user_id, event_id AS purchase_id, tus AS p_t
             FROM e WHERE event_type = 'purchase')
       SELECT s.user_id, signup_id, purchase_id, (p_t - s_t) AS gap_us
       FROM s JOIN p ON s.user_id = p.user_id
                    AND p_t >= s_t AND p_t <= s_t + 3600000000""",
)
def evt_interval_join(spark, sf_dir):
    """Batch interval join (operators.interval): every purchase within
    1h AFTER each signup by the same user — ALL matches, not just the
    as-of nearest. Time-bucket blocking bounds join fan-in per (key,
    bucket) cell; the oracle uses the naive range predicate, so
    agreement also proves the two-bucket replication is lossless."""
    ev = _events(spark, sf_dir)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"), F.col("tus").alias("s_t")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("tus").alias("p_t")
    )
    from semantic_cpp_spark.operators.interval import interval_join

    out = interval_join(
        signups, purchases, "user_id", "s_t", "p_t", 3600 * 1_000_000
    )
    return out.select(
        "user_id", "signup_id", "purchase_id",
        (F.col("p_t") - F.col("s_t")).alias("gap_us"),
    )


@register(
    "evt_hourly_moving_avg",
    """WITH h AS (SELECT (epoch_ns(ts) // 1000) // 3600000000 AS hour_id,
                         count(*)::BIGINT AS n
                  FROM events GROUP BY 1)
       SELECT hour_id, n,
              round(avg(n) OVER (ORDER BY hour_id
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
                AS ma3
       FROM h""",
)
def evt_hourly_moving_avg(spark, sf_dir):
    """Hourly event counts + trailing 3-hour moving average. The moving
    window is global ON PURPOSE: it runs over the POST-AGGREGATION hour
    series (one row per hour — bounded by the time span, not the data),
    which is the one place a single-partition window is the right plan;
    the raw events only ever see the groupBy. Hour ids are pure int64
    epoch-hours (`div`, no calendar)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    hourly = (
        ev.select(F.expr("tus div 3600000000").alias("hour_id"))
        .groupBy("hour_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # explicit non-foldable single-partition key: the series is tiny, and
    # this keeps WindowExec's no-partition warning meaningful elsewhere
    w = (
        Window.partitionBy(F.pmod(F.spark_partition_id(), F.lit(1)))
        .orderBy("hour_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return hourly.select(
        "hour_id", "n", F.round(F.avg("n").over(w), 6).alias("ma3")
    )


@register(
    "evt_merged_activity",
    """WITH iv AS (SELECT event_id, user_id,
                          epoch_ns(ts) // 1000 AS s,
                          epoch_ns(ts) // 1000 + 600000000 AS e
                   FROM events),
    f AS (SELECT *,
                 CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                      OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      THEN 1 ELSE 0 END AS nb
          FROM iv),
    b AS (SELECT *,
                 (sum(nb) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS block_idx
          FROM f)
    SELECT user_id, block_idx, min(s) AS b_start, max(e) AS b_end,
           count(*)::BIGINT AS n_intervals
    FROM b GROUP BY user_id, block_idx""",
)
def evt_merged_activity(spark, sf_dir):
    """Interval coalescing (operators.eventflow.merge_intervals): each
    event spans [t, t+10min]; overlapping spans merge into maximal
    per-user activity blocks. Two window passes + rollup on ONE user
    exchange."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.col("tus").alias("s"),
        (F.col("tus") + 600_000_000).alias("e"),
    )
    return eventflow.merge_intervals(ev, "user_id", "s", "e")


@register(
    "evt_hourly_anomalies",
    """WITH h AS (SELECT (epoch_ns(ts) // 1000) // 3600000000 AS hour_id,
                         count(*)::BIGINT AS n
                  FROM events GROUP BY 1),
       w AS (SELECT hour_id, n,
                    avg(n) OVER tw AS mu,
                    stddev_pop(n) OVER tw AS sd,
                    count(*) OVER tw AS m
             FROM h
             WINDOW tw AS (ORDER BY hour_id ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
       SELECT hour_id, n, round(mu, 6) AS mu,
              CASE WHEN m >= 12 AND sd > 0 AND abs(n - mu) > 2 * sd
                   THEN TRUE ELSE FALSE END AS is_anomaly
       FROM w""",
)
def evt_hourly_anomalies(spark, sf_dir):
    """Hourly volume anomaly flags: each hour vs the TRAILING 24h window
    (strictly preceding rows — the current hour never polices itself);
    anomalous = |n − μ| > 2σ with ≥ 12 history hours. Same legitimately-
    global post-aggregation window as evt_hourly_moving_avg (one row
    per hour). The monitoring primitive over any event firehose."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    hourly = (
        ev.select(F.expr("tus div 3600000000").alias("hour_id"))
        .groupBy("hour_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tw = (
        Window.partitionBy(F.pmod(F.spark_partition_id(), F.lit(1)))
        .orderBy("hour_id")
        .rowsBetween(-24, -1)
    )
    mu = F.avg("n").over(tw)
    sd = F.stddev_pop("n").over(tw)
    m = F.count(F.lit(1)).over(tw)
    return hourly.select(
        "hour_id",
        "n",
        F.round(mu, 6).alias("mu"),
        ((m >= 12) & (sd > 0) & (F.abs(F.col("n") - mu) > 2 * sd)).alias(
            "is_anomaly"
        ),
    )


@register(
    "evt_user_trend",
    """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS tus, value FROM events),
       m AS (SELECT user_id, min(tus) AS t0 FROM e GROUP BY user_id),
       x AS (SELECT e.user_id, (tus - t0) // 1000000 AS xs,
                    CAST(round(value * 100) AS BIGINT) AS yc
             FROM e JOIN m ON e.user_id = m.user_id),
       s AS (SELECT user_id, count(*)::BIGINT AS n,
                    sum(xs)::BIGINT AS sx, sum(xs * xs)::BIGINT AS sxx,
                    sum(yc)::BIGINT AS syc, sum(xs * yc)::BIGINT AS sxyc
             FROM x GROUP BY user_id)
       SELECT user_id, n,
              round((n * sxyc - sx * syc) / (n * sxx - sx * sx) / 100.0, 9)
                + 0 AS slope,
              round((syc / 100.0
                     - ((n * sxyc - sx * syc)
                        / (n * sxx - sx * sx) / 100.0) * sx) / n, 6)
                + 0 AS intercept
       FROM s WHERE n >= 2 AND n * sxx - sx * sx > 0""",
)
def evt_user_trend(spark, sf_dir):
    """Per-user linear trend of event value over time: closed-form OLS
    from one pass of power sums (the agg_skew_kurt pattern — no second
    scan, no UDF). x is integer SECONDS from the user's first event:
    centering + the unit change keeps Σx² exactly representable
    (raw epoch-micros would overflow int64 when squared and
    catastrophically cancel in n·Σx² − (Σx)² as doubles). Two
    aggregations co-partitioned on user_id.

    y accumulates as EXACT int64 cents (r6 sf1.0 finding: float Σy/Σxy
    drift by summation order once user counts reach 10×); every sum both
    engines compare is an integer, and the slope/intercept doubles come
    from the identical int-ratio expression on both sides. Bound: Σxs·yc
    needs |xs|·|yc|·rows_per_user « 2⁶³ — holds to ~10⁸ events/user at
    this fixture's ranges; beyond that, widen to decimal/HUGEINT."""
    ev = _events(spark, sf_dir)
    t0 = ev.groupBy("user_id").agg(F.min("tus").alias("t0"))
    x = ev.join(t0, "user_id").select(
        "user_id",
        F.expr("(tus - t0) div 1000000").alias("xs"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    s = x.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xs").cast("long").alias("sx"),
        F.sum(F.col("xs") * F.col("xs")).cast("long").alias("sxx"),
        F.sum("yc").cast("long").alias("syc"),
        F.sum(F.col("xs") * F.col("yc")).cast("long").alias("sxyc"),
    )
    slope = (
        (F.col("n") * F.col("sxyc") - F.col("sx") * F.col("syc"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        / 100.0
    )
    return (
        s.filter(
            (F.col("n") >= 2)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        )
        .select(
            "user_id",
            "n",
            # + 0.0 normalizes IEEE -0.0 → +0.0 (a rounded tiny-negative
            # slope repr-differs between engines otherwise; same trick as
            # the FFT oracle)
            (F.round(slope, 9) + 0.0).alias("slope"),
            (
                F.round(
                    (F.col("syc") / 100.0 - slope * F.col("sx")) / F.col("n"), 6
                )
                + 0.0
            ).alias("intercept"),
        )
    )


@register(
    "evt_conversion_latency",
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t
                  FROM events
                  WHERE event_type IN ('signup', 'view', 'purchase')),
    a1 AS (SELECT user_id,
                  min(CASE WHEN event_type = 'signup' THEN t END) AS t_1
           FROM e GROUP BY user_id),
    a2 AS (SELECT e.user_id, min(t) AS t_2
           FROM e JOIN a1 ON e.user_id = a1.user_id
           WHERE event_type = 'view' AND t > t_1 GROUP BY e.user_id),
    a3 AS (SELECT e.user_id, min(t) AS t_3
           FROM e JOIN a2 ON e.user_id = a2.user_id
           WHERE event_type = 'purchase' AND t > t_2 GROUP BY e.user_id),
    lat AS (SELECT t_3 - a1.t_1 AS l
            FROM a3 JOIN a1 ON a3.user_id = a1.user_id)
    SELECT count(*)::BIGINT AS n_converted,
           round((sum(l)::DOUBLE / count(*)) / 1e6, 6) AS avg_latency_s,
           round(quantile_cont(l::DOUBLE, 0.5) / 1e6, 6) AS p50_latency_s,
           round(quantile_cont(l::DOUBLE, 0.9) / 1e6, 6) AS p90_latency_s
    FROM lat""",
)
def evt_conversion_latency(spark, sf_dir):
    """Funnel conversion latency (eventflow.conversion_latency): for
    users completing signup→view→purchase, the first-step-to-conversion
    time profile — count, mean, and EXACT p50/p90 via the distributed
    sort + rank-selection percentile path (one row per converted user
    scales with the corpus; no one-reducer percentile merge)."""
    ev = _events(spark, sf_dir)
    return eventflow.conversion_latency(ev, ["signup", "view", "purchase"])


@register(
    "evt_rfm_segments",
    """WITH p AS (SELECT user_id, epoch_ns(ts) // 1000 AS t, value
                  FROM events WHERE event_type = 'purchase'),
    u AS (SELECT user_id,
                 count(*)::BIGINT AS n_purchases,
                 round(sum(value), 2) AS monetary,
                 max(t) AS last_t
          FROM p GROUP BY user_id),
    g AS (SELECT max(t) AS gmax FROM p),
    m AS (SELECT user_id, n_purchases, monetary,
                 (gmax - last_t)::BIGINT AS recency_us
          FROM u, g),
    c AS (SELECT quantile_cont(recency_us, 0.3333333333333333) AS r0,
                 quantile_cont(recency_us, 0.6666666666666666) AS r1,
                 quantile_cont(n_purchases, 0.3333333333333333) AS f0,
                 quantile_cont(n_purchases, 0.6666666666666666) AS f1,
                 quantile_cont(monetary, 0.3333333333333333) AS m0,
                 quantile_cont(monetary, 0.6666666666666666) AS m1
          FROM m)
    SELECT user_id, recency_us, n_purchases, monetary,
           (CASE WHEN recency_us >= r1 THEN 2
                 WHEN recency_us >= r0 THEN 1 ELSE 0 END)::BIGINT AS r_band,
           (CASE WHEN n_purchases >= f1 THEN 2
                 WHEN n_purchases >= f0 THEN 1 ELSE 0 END)::BIGINT AS f_band,
           (CASE WHEN monetary >= m1 THEN 2
                 WHEN monetary >= m0 THEN 1 ELSE 0 END)::BIGINT AS m_band
    FROM m, c""",
)
def evt_rfm_segments(spark, sf_dir):
    """RFM user segmentation (eventflow.rfm_segments): recency/frequency/
    monetary per purchasing user, tercile-banded against broadcast 1-row
    exact-percentile cutoffs — the scale-correct CASE banding, never a
    global ntile() window. Bands ascend in the metric (r_band 0 = most
    recent third)."""
    ev = _events(spark, sf_dir)
    return eventflow.rfm_segments(ev)


_DEBOUNCE_US = 30 * 60 * 1_000_000


@register(
    "evt_debounce",
    f"""WITH e AS (SELECT event_id, user_id, event_type,
                          epoch_ns(ts) // 1000 AS t
                   FROM events),
    f AS (SELECT event_type,
                 CASE WHEN lag(t) OVER (PARTITION BY user_id, event_type
                                        ORDER BY t, event_id) IS NULL
                        OR t - lag(t) OVER (PARTITION BY user_id, event_type
                                            ORDER BY t, event_id)
                           > {_DEBOUNCE_US}
                      THEN 1 ELSE 0 END AS k
          FROM e)
    SELECT event_type, sum(k)::BIGINT AS n_kept,
           (count(*) - sum(k))::BIGINT AS n_dropped
    FROM f GROUP BY event_type""",
)
def evt_debounce(spark, sf_dir):
    """Event debouncing (eventflow.debounce): drop an event when the
    previous same-(user,type) event lies within 30 minutes — the
    at-least-once-ingest cleaning rule. One lag() window per (user,type)
    key; reported as kept/dropped counts per type."""
    ev = _events(spark, sf_dir)
    d = eventflow.debounce(ev, _DEBOUNCE_US)
    k = F.when(F.col("keep"), 1).otherwise(0)
    return d.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum(k)).cast("long").alias("n_dropped"),
    )


@register(
    "evt_max_concurrency",
    f"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tus
                   FROM events),
    f AS (SELECT *,
                 CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id
                                                ORDER BY tus, event_id) IS NULL
                        OR tus - lag(tus) OVER (PARTITION BY user_id
                                                ORDER BY tus, event_id) > {_GAP_US}
                      THEN 1 ELSE 0 END AS ns
          FROM e),
    sx AS (SELECT *,
                  (sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_idx
           FROM f),
    s AS (SELECT user_id, session_idx, min(tus) AS t_start, max(tus) AS t_end
          FROM sx GROUP BY user_id, session_idx),
    ex AS (SELECT t_start, t_end,
                  unnest(range(t_start // 86400000000,
                               t_end // 86400000000 + 1)) AS day
           FROM s),
    del AS (
      SELECT day, greatest(t_start, day * 86400000000) AS t, 1 AS d FROM ex
      UNION ALL
      SELECT day, least(t_end, (day + 1) * 86400000000 - 1) + 1 AS t, -1 AS d
      FROM ex),
    ag AS (SELECT day, t, sum(d) AS d FROM del GROUP BY day, t),
    c AS (SELECT day, sum(d) OVER (PARTITION BY day ORDER BY t
                                   ROWS UNBOUNDED PRECEDING) AS c
          FROM ag),
    pk AS (SELECT day, max(c) AS max_concurrent FROM c GROUP BY day),
    n AS (SELECT day, count(*) AS n_sessions FROM ex GROUP BY day)
    SELECT pk.day::BIGINT AS day, n.n_sessions::BIGINT AS n_sessions,
           pk.max_concurrent::BIGINT AS max_concurrent
    FROM pk JOIN n USING (day)""",
)
def evt_max_concurrency(spark, sf_dir):
    """Peak concurrent sessions per epoch-day
    (eventflow.max_concurrency_per_day): sweep-line +1/−1 deltas over
    30-min-gap sessions, running-sum window partitioned BY DAY (never a
    global sort), same-instant deltas pre-summed so the cumulative sum
    is tie-order-free. Midnight-spanning sessions are clipped into both
    days."""
    ev = _events(spark, sf_dir)
    return eventflow.max_concurrency_per_day(ev, gap_us=_GAP_US)


_LOOKBACK_US = 7 * 86_400_000_000


@register(
    "evt_last_touch_attribution",
    f"""WITH e AS (SELECT event_id, user_id, event_type,
                          epoch_ns(ts) // 1000 AS tus
                   FROM events),
    enc AS (SELECT *,
                   max(CASE WHEN event_type = 'click' THEN tus * 8 + 0
                            WHEN event_type = 'signup' THEN tus * 8 + 1
                            WHEN event_type = 'view' THEN tus * 8 + 2 END)
                     OVER (PARTITION BY user_id ORDER BY tus, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS lt
            FROM e)
    SELECT event_id, user_id, tus AS t_conv,
           CASE WHEN lt IS NOT NULL AND tus - lt // 8 <= {_LOOKBACK_US}
                THEN lt // 8 END AS t_touch,
           CASE WHEN lt IS NOT NULL AND tus - lt // 8 <= {_LOOKBACK_US}
                THEN CASE lt % 8 WHEN 0 THEN 'click' WHEN 1 THEN 'signup'
                                 WHEN 2 THEN 'view' END END AS touch_type,
           CASE WHEN lt IS NOT NULL AND tus - lt // 8 <= {_LOOKBACK_US}
                THEN tus - lt // 8 END AS latency_us
    FROM enc WHERE event_type = 'purchase'""",
)
def evt_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution (eventflow.last_touch_attribution): for
    each purchase, the most recent strictly-preceding
    click/signup/view of the same user within a 7-day lookback. ONE
    user-partitioned window carrying an int64-encoded (t·8 + type
    rank) running max — no per-conversion self-join; encode/decode is
    integer-exact in both engines (t·8 ≈ 1.4e16 would NOT survive a
    float division)."""
    ev = _events(spark, sf_dir)
    return eventflow.last_touch_attribution(
        ev, conversion_type="purchase",
        touch_types=("view", "click", "signup"), lookback_us=_LOOKBACK_US,
    )


@register(
    "evt_decayed_activity",
    """WITH e AS (SELECT user_id, value,
                         (epoch_ns(ts) // 1000) // 86400000000 AS d
                  FROM events),
    mx AS (SELECT max(d) AS T FROM e)
    SELECT user_id, count(*)::BIGINT AS n_recent,
           round(sum(CAST(round(value * 100) AS BIGINT)
                     * (1::BIGINT << (30 - (T - d))))::DOUBLE
                 / 107374182400.0, 6) AS score
    FROM e, mx WHERE T - d <= 30
    GROUP BY user_id""",
)
def evt_decayed_activity(spark, sf_dir):
    """Recency-weighted engagement (eventflow.decayed_activity): per
    user Σ value·0.5^Δdays over a 30-day horizon from the corpus max
    day. EXACT cross-engine: integer-day decay makes every weight a
    power of two, so terms are value_cents·2^(30−Δ) int64 shifts summed
    in DECIMAL(38,0)/HUGEINT — no exp(), no per-term float rounding to
    land on a boundary at 10⁶ events. Max-day broadcasts as one scalar;
    the rest is a narrow map + one combinable groupBy."""
    ev = _events(spark, sf_dir)
    return eventflow.decayed_activity(ev, half_life_days=1, horizon_days=30)


@register(
    "evt_mad_outliers",
    """WITH e AS (SELECT event_id, event_type, value FROM events),
    m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM e GROUP BY event_type),
    d AS (SELECT e.event_id, e.event_type, e.value, m.med,
                 abs(e.value - m.med) AS ad
          FROM e JOIN m USING (event_type)),
    md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
           FROM d GROUP BY event_type)
    SELECT d.event_id, d.event_type, d.value,
           round(0.6745 * (d.value - d.med) / md.mad, 6) AS robust_z
    FROM d JOIN md USING (event_type)
    WHERE md.mad > 0 AND abs(0.6745 * (d.value - d.med) / md.mad) > 3.5""",
)
def evt_mad_outliers(spark, sf_dir):
    """Robust per-type outliers (eventflow.mad_outliers, Iglewicz &
    Hoaglin modified z-score): |0.6745·(x−med)/MAD| > 3.5 with med and
    MAD exact per-group percentiles — the monitoring rule that survives
    the very outliers it hunts (50% breakdown vs mean/σ). Two grouped
    percentile passes; the per-group stats broadcast back for a narrow
    final filter."""
    ev = _events(spark, sf_dir)
    return eventflow.mad_outliers(ev, group="event_type", value="value", z_cut=3.5)


@register(
    "evt_markov_transitions",
    """WITH e AS (SELECT event_id, user_id, event_type,
                         epoch_ns(ts) // 1000 AS tus
                  FROM events),
    nx AS (SELECT event_type AS cur,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY tus, event_id) AS next
           FROM e),
    p AS (SELECT cur, next, count(*) AS n_pair
          FROM nx WHERE next IS NOT NULL GROUP BY cur, next),
    t AS (SELECT cur, sum(n_pair) AS n_from FROM p GROUP BY cur)
    SELECT p.cur, p.next, p.n_pair::BIGINT AS n_pair,
           (2000000::BIGINT * p.n_pair + t.n_from)
             // (2 * t.n_from) / 1000000.0 AS p
    FROM p JOIN t USING (cur)""",
)
def evt_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over each user's event
    timeline (eventflow.markov_transitions): one lead() window per user
    + a pair groupBy; P(next|cur) joins pair counts to per-cur totals
    co-keyed on cur. Exact integer counts, one division at the end."""
    ev = _events(spark, sf_dir)
    return eventflow.markov_transitions(ev)


@register(
    "evt_sliding_uniques",
    """WITH e AS (SELECT user_id, (epoch_ns(ts) // 1000) // 3600000000 AS hr
                  FROM events),
    w AS (SELECT user_id, hr, unnest(range(hr - 5, hr + 1)) AS win_start
          FROM e),
    g AS (SELECT win_start, count(DISTINCT user_id) AS n_users
          FROM w GROUP BY win_start),
    bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e)
    SELECT win_start::BIGINT AS win_start, n_users::BIGINT AS n_users
    FROM g, bounds WHERE win_start BETWEEN lo AND hi - 5""",
)
def evt_sliding_uniques(spark, sf_dir):
    """Sliding-window distinct users (6-hour window, 1-hour step):
    replicate-explode each event into the ≤6 windows containing its
    hour, then ONE count_distinct groupBy per window — the
    sliding-distinct shape that needs no window function and no
    state (the win_slide replicate pattern applied to a distinct
    aggregate). Edge windows that extend past the stream bounds are
    trimmed (only fully-covered windows emit — the batch analogue of a
    closed streaming window). Replication factor is the window/step
    ratio, bounded by construction."""
    ev = _events(spark, sf_dir)
    hr = F.expr("tus div 3600000000")
    w = ev.select(
        "user_id",
        hr.alias("hr"),
        F.explode(F.sequence(hr - 5, hr)).alias("win_start"),
    )
    g = w.groupBy("win_start").agg(
        F.count_distinct("user_id").cast("long").alias("n_users")
    )
    bounds = ev.agg(
        F.min(hr).alias("lo"), (F.max(hr) - 5).alias("hi")
    )
    return (
        g.crossJoin(F.broadcast(bounds))
        .filter((F.col("win_start") >= F.col("lo")) & (F.col("win_start") <= F.col("hi")))
        .select(F.col("win_start").cast("long").alias("win_start"), "n_users")
    )


@register(
    "evt_top_paths",
    f"""WITH e AS (SELECT event_id, user_id, event_type,
                          epoch_ns(ts) // 1000 AS tus
                   FROM events),
    f AS (SELECT *,
                 CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id
                                                ORDER BY tus, event_id) IS NULL
                        OR tus - lag(tus) OVER (PARTITION BY user_id
                                                ORDER BY tus, event_id) > {_GAP_US}
                      THEN 1 ELSE 0 END AS ns
          FROM e),
    sx AS (SELECT *,
                  (sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_idx
           FROM f),
    p AS (SELECT event_type || '>' ||
                 lead(event_type, 1) OVER (PARTITION BY user_id, session_idx
                                           ORDER BY tus, event_id) || '>' ||
                 lead(event_type, 2) OVER (PARTITION BY user_id, session_idx
                                           ORDER BY tus, event_id) AS path,
                 lead(event_type, 2) OVER (PARTITION BY user_id, session_idx
                                           ORDER BY tus, event_id) AS nx2
          FROM sx),
    g AS (SELECT path, count(*) AS n FROM p WHERE nx2 IS NOT NULL GROUP BY path)
    SELECT path, n::BIGINT AS n FROM g ORDER BY n DESC, path LIMIT 20""",
)
def evt_top_paths(spark, sf_dir):
    """Top-20 in-session 3-step event paths
    (eventflow.top_session_paths): sessionize + two leads inside
    (user, session) sharing the window exchange, then a combinable path
    groupBy and TakeOrdered with path tie-breaks."""
    ev = _events(spark, sf_dir)
    return eventflow.top_session_paths(ev, k=20, gap_us=_GAP_US)


@register(
    "evt_dau_wau_stickiness",
    """WITH e AS (SELECT DISTINCT user_id,
                         (epoch_ns(ts) // 1000) // 86400000000 AS d
                  FROM events),
    dau AS (SELECT d, count(*) AS dau FROM e GROUP BY d),
    w AS (SELECT user_id, unnest(range(d, d + 7)) AS d FROM e),
    wau AS (SELECT d, count(DISTINCT user_id) AS wau FROM w GROUP BY d),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM e)
    SELECT dau.d::BIGINT AS day, dau.dau::BIGINT AS dau,
           wau.wau::BIGINT AS wau,
           (2000000::BIGINT * dau.dau + wau.wau)
             // (2 * wau.wau) / 1000000.0 AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d, bounds
    WHERE dau.d BETWEEN lo + 6 AND hi""",
)
def evt_dau_wau_stickiness(spark, sf_dir):
    """DAU / WAU / stickiness per day — the canonical engagement
    metric (stickiness = DAU/WAU ∈ [1/7, 1]): WAU via replicate-explode
    of each active (user, day) into the 7 trailing windows it supports
    (the sliding-distinct shape, factor bounded at 7), DAU a plain
    distinct count, both co-keyed on the day. Days before a full
    trailing week are trimmed against broadcast stream bounds.
    stickiness = dau/wau is the exact int/int ratio via
    stats.ratio_round6 / the `//` mirror (r13 half-boundary audit
    conversion)."""
    from semantic_cpp_spark.functions.stats import ratio_round6

    ev = _events(spark, sf_dir)
    d = F.expr("tus div 86400000000")
    ud = ev.select("user_id", d.alias("d")).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    w = ud.select("user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("d"))
    wau = w.groupBy("d").agg(F.count_distinct("user_id").cast("long").alias("wau"))
    bounds = ud.agg((F.min("d") + 6).alias("lo"), F.max("d").alias("hi"))
    return (
        dau.join(wau, "d")
        .crossJoin(F.broadcast(bounds))
        .filter((F.col("d") >= F.col("lo")) & (F.col("d") <= F.col("hi")))
        .select(
            F.col("d").cast("long").alias("day"),
            "dau",
            "wau",
            ratio_round6(F.col("dau"), F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "evt_inter_event_gaps",
    """WITH e AS (SELECT event_id, user_id, event_type,
                         epoch_ns(ts) // 1000 AS tus
                  FROM events),
    g AS (SELECT event_type,
                 tus - lag(tus) OVER (PARTITION BY user_id, event_type
                                      ORDER BY tus, event_id) AS gap
          FROM e)
    SELECT event_type, count(gap)::BIGINT AS n_gaps,
           round(quantile_cont(gap, 0.5), 2) AS p50_us,
           round(quantile_cont(gap, 0.9), 2) AS p90_us,
           round(sum(gap)::DOUBLE / count(gap), 2) AS avg_us
    FROM g WHERE gap IS NOT NULL GROUP BY event_type""",
)
def evt_inter_event_gaps(spark, sf_dir):
    """Per-type inter-event gap distribution (burstiness / cadence
    profile): one lag window per (user, type) — the debounce exchange
    shape — then grouped exact percentiles (per-GROUP buffers, the
    rel_grouped_percentiles argument; a skewed group would take the
    sort-path per group). avg over exact int64 gaps."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("tus", "event_id")
    g = ev.withColumn("gap", F.col("tus") - F.lag("tus").over(w)).filter(
        F.col("gap").isNotNull()
    )
    qs = F.percentile(F.col("gap"), F.array(F.lit(0.5), F.lit(0.9)))
    return g.groupBy("event_type").agg(
        F.count("gap").cast("long").alias("n_gaps"),
        # 2dp rounding: at 1e9-µs magnitudes a double's ulp (~1.2e-7)
        # sits inside a 6dp rounding boundary; 2dp leaves 5 orders of
        # margin, and sub-µs precision is meaningless here anyway.
        # avg as explicit exact-int sum / count (incremental-avg order
        # effects were the drift source).
        F.round(qs[0], 2).alias("p50_us"),
        F.round(qs[1], 2).alias("p90_us"),
        F.round(F.sum("gap").cast("double") / F.count("gap"), 2).alias("avg_us"),
    )


_AGG_HLL_SQL = f"""WITH h AS (
      SELECT ('0x' || substr(md5('hll-' || user_id::VARCHAR), 1, 15))::BIGINT
               AS h
      FROM events),
    r AS (SELECT h % 1024 AS idx,
                 CASE WHEN h // 1024 = 0 THEN 51
                      ELSE 51 - length(bin(h // 1024)) END AS rho
          FROM h),
    regs AS (SELECT idx, max(rho) AS m FROM r GROUP BY idx),
    agg AS (SELECT sum(power(2.0, -m)) AS s_used, count(*) AS n_used FROM regs),
    est AS (SELECT ({0.7213 / (1.0 + 1.079 / 1024)!r}::DOUBLE * 1024 * 1024)
                     / (s_used + (1024 - n_used) * 1.0) AS e,
                   1024 - n_used AS v
            FROM agg)
    SELECT 1024::BIGINT AS n_regs,
           round(CASE WHEN e <= 2560.0 AND v > 0
                      THEN 1024 * ln(1024.0 / v) ELSE e END, 4) AS hll_count
    FROM est"""


def agg_hll_distinct_users(spark, sf_dir):
    """Approximate distinct-user cardinality by HyperLogLog in pure
    Column expressions (dedup.hll_distinct, r8 — the batch companion of
    stream_sliding_uniques_hll, same md5 register derivation): ONE
    <=1024-row map-side-combinable aggregate replaces count(DISTINCT)'s
    shuffle of every distinct key — 8 KB of exchange at 10^10 keys.
    Deterministic registers make the estimate itself a hard-oracle
    value: DuckDB replays idx/rho/max/estimator verbatim. Error band
    (~3.3% theoretical at m=1024) is pinned against exact counts in
    test_hll_distinct_error_band."""
    from semantic_cpp_spark.pipeline import dedup as dedup_ops

    ev = load_table(spark, sf_dir, "events")
    return dedup_ops.hll_distinct(ev, F.col("user_id"))


_AGG_CMS_SQL = """WITH rr AS (SELECT unnest(range(0, 4)) AS r),
    cells AS (
      SELECT rr.r,
             ('0x' || substr(md5('cms' || rr.r || '-' || user_id::VARCHAR),
                             1, 15))::BIGINT % 1024 AS c
      FROM events, rr),
    cms AS (SELECT r, c, count(*) AS cnt FROM cells GROUP BY r, c),
    exact AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    top AS (SELECT user_id, n FROM exact ORDER BY n DESC, user_id LIMIT 10),
    probe AS (
      SELECT t.user_id, t.n, min(cms.cnt) AS cms_count
      FROM top t, rr
      JOIN cms
        ON cms.r = rr.r
       AND cms.c = ('0x' || substr(md5('cms' || rr.r || '-'
                                       || t.user_id::VARCHAR),
                                   1, 15))::BIGINT % 1024
      GROUP BY t.user_id, t.n)
    SELECT user_id, n::BIGINT AS exact_count, cms_count::BIGINT AS cms_count
    FROM probe"""


def agg_cms_user_freq(spark, sf_dir):
    """Count-Min sketch frequency estimation under the gate
    (dedup.cms_build/cms_estimate, r8 — completing the sketch trio with
    the Bloom membership index and the HLL cardinality register file):
    the 4×1024-cell sketch is built in ONE bounded groupBy (≤ 4096
    map-side-combined rows of exchange at any key cardinality), then
    the exact top-10 users are point-queried against it — output
    (user_id, exact_count, cms_count), with cms_count ≥ exact_count by
    construction (one-sided CMS guarantee, error bound test-pinned in
    test_cms_one_sided_bound_and_heavy_hitters). At 100 TB the exact
    per-key groupBy is the thing being avoided; candidates then come
    from per-partition local top-k, and the sketch — a constant-size
    parquet like the Bloom filter — serves all point queries. md5
    row-hashes make every counter engine-replayable: the oracle
    rebuilds the sketch and the probe verbatim."""
    from semantic_cpp_spark.pipeline import dedup as dedup_ops

    ev = load_table(spark, sf_dir, "events")
    cms = dedup_ops.cms_build(ev, F.col("user_id"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    top = exact.orderBy(F.desc("n"), "user_id").limit(10)
    est = dedup_ops.cms_estimate(cms, top.select("user_id"), F.col("user_id"))
    return (
        top.join(est, top["user_id"] == est["key"])
        .select(
            top["user_id"],
            F.col("n").cast("long").alias("exact_count"),
            "cms_count",
        )
    )


@register(
    "agg_sketch_cardinality",
    f"""SELECT 'hll' AS aspect, CAST(NULL AS BIGINT) AS user_id,
           n_regs AS l1, CAST(NULL AS BIGINT) AS l2, hll_count AS d1
    FROM ({_AGG_HLL_SQL}) __h
    UNION ALL
    SELECT 'cms' AS aspect, user_id, exact_count AS l1, cms_count AS l2,
           CAST(NULL AS DOUBLE) AS d1
    FROM ({_AGG_CMS_SQL}) __c""",
)
def agg_sketch_cardinality(spark, sf_dir):
    """The batch sketch-aggregation pair under ONE gate (r13 gate
    consolidation): the HLL distinct-user estimate (aspect='hll' →
    l1=n_regs, d1=hll_count — the deterministic md5 register file,
    ≤1024 rows of exchange at any cardinality) and the Count-Min
    top-10 frequency probe (aspect='cms' → user_id, l1=exact_count,
    l2=cms_count — the 4×1024-cell sketch, cms ≥ exact one-sided
    guarantee pinned in tests). Every member row survives verbatim in
    the tagged slot union; both branches stay map-side-combinable
    bounded aggregates."""
    NL = F.lit(None).cast("long")
    ND = F.lit(None).cast("double")
    h = agg_hll_distinct_users(spark, sf_dir).select(
        F.lit("hll").alias("aspect"), NL.alias("user_id"),
        F.col("n_regs").alias("l1"), NL.alias("l2"),
        F.col("hll_count").alias("d1"),
    )
    c = agg_cms_user_freq(spark, sf_dir).select(
        F.lit("cms").alias("aspect"), F.col("user_id").cast("long").alias("user_id"),
        F.col("exact_count").alias("l1"), F.col("cms_count").alias("l2"),
        ND.alias("d1"),
    )
    return h.unionByName(c)


_ROLLUP_MERGE_SQL = """WITH e AS (
         SELECT (epoch_ns(ts) // 1000) // 3600000000 AS hour_id,
                round(value * 100)::BIGINT AS cents
         FROM events)
       SELECT hour_id, count(*)::BIGINT AS n,
              sum(cents)::BIGINT AS total,
              min(cents)::BIGINT AS vmin,
              max(cents)::BIGINT AS vmax,
              round(sum(cents)::DOUBLE / count(*)::DOUBLE, 6) AS vavg
       FROM e GROUP BY hour_id"""


def _rollup_base(spark, sf_dir):
    """Shared projection every mergeable-rollup member derives from:
    (hour_id, __inc, cents, user_id) — __inc = event_id mod 3 is the
    increment tag (day-1 history / day-2 delta / late rows). r15: the
    members used to re-scan events once per increment FILTER (3 corpus
    scans each, 12 across the family); building the per-increment
    states as one groupBy over (key, __inc) produces the identical
    state rows in ONE pass — the merge step still folds three real
    per-increment partials, so the merge ≡ direct identity each oracle
    proves is exercised unchanged."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        (F.col("event_id") % 3).alias("__inc"),
        ts_micros(ev).alias("tus"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.col("user_id"),
    ).select(
        "__inc",
        F.expr("tus div 3600000000").alias("hour_id"),
        "cents",
        "user_id",
    )


def evt_rollup_merge(spark, sf_dir, base=None):
    """Incremental hourly rollup by MERGEABLE STATE (operators.rollup):
    the events table is split into three increments (event_id mod 3 —
    standing in for day-1 history, day-2 delta, late-arriving rows),
    each reduced to per-hour partial state (n, sum, min, max) over exact
    int64 cents (one pass, states keyed (hour, increment) — see
    _rollup_base), the states merged with one groupBy, and the merge
    finalized. The oracle aggregates the WHOLE table directly — so a
    green row proves merge(state(A), state(B), state(C)) ≡
    state(A ∪ B ∪ C) bit-for-bit, the identity that lets a 100 TB
    pipeline fold a daily delta into a stored rollup without rescanning
    history (state rows = key cardinality; the delta is the only thing
    scanned). Mean derives from the exact integer sums at the end —
    the only float in the path (6dp, boundary-safe on 2dp fixture
    values)."""
    from semantic_cpp_spark.operators import rollup

    if base is None:
        base = _rollup_base(spark, sf_dir)
    st = rollup.agg_state(base, ["hour_id", "__inc"], F.col("cents"))
    merged = rollup.merge_states([st], ["hour_id"])
    return rollup.finalize(merged, ["hour_id"]).select(
        "hour_id",
        F.col("n"),
        "total",
        "vmin",
        "vmax",
        "vavg",
    )


_ROLLUP_VAR_SQL = """WITH e AS (
         SELECT (epoch_ns(ts) // 1000) // 3600000000 AS hour_id,
                round(value * 100)::BIGINT AS cents
         FROM events),
    st AS (SELECT hour_id, count(*)::BIGINT AS n,
                  sum(cents) AS s, sum(cents * cents) AS ssq
           FROM e GROUP BY hour_id)
    SELECT hour_id, n, s::BIGINT AS total,
           round(CAST(n * ssq - s * s AS DOUBLE)
                 / CAST(n::HUGEINT * n AS DOUBLE) / 10000.0, 6) AS var_pop
    FROM st"""


def evt_rollup_var_merge(spark, sf_dir, base=None):
    """Incremental per-hour VARIANCE maintenance by mergeable state
    (operators.rollup.var_state — VERDICT r8 #5, closing the loop with
    the reference's own Chan parallel-variance combiner,
    collector.h:695-715): the events table splits into three deltas
    (event_id mod 3), each reduces to (n, Σcents, Σcents²) — the
    integer sufficient statistics that carry exactly Chan's (n, mean,
    M2) but merge by pure ADDITION, so merge order can never leak into
    the last ulp the way the float M2 formula allows — and the merged
    state finalizes to var_pop as the exact integer rational
    (n·Σx² − (Σx)²)/n² with one decimal→double conversion per operand.
    The oracle aggregates the WHOLE table directly in HUGEINT and
    applies the identical final division, so a green row proves
    merge(state(A), state(B), state(C)) ≡ state(A ∪ B ∪ C) through the
    variance itself. /10000 returns cents² to value units²;
    equivalence with Chan's merge and Spark's var_pop is pinned in
    tests/test_rollup.py. Increment states build in one corpus pass
    keyed (hour, increment) — see _rollup_base."""
    from semantic_cpp_spark.operators import rollup

    if base is None:
        base = _rollup_base(spark, sf_dir)
    st = rollup.var_state(base, ["hour_id", "__inc"], F.col("cents"))
    merged = rollup.merge_var_states([st], ["hour_id"])
    return rollup.finalize_var(merged, ["hour_id"]).select(
        "hour_id",
        "n",
        "total",
        F.round(F.col("var_pop") / F.lit(10000.0), 6).alias("var_pop"),
    )


_ROLLUP_HLL_SQL = f"""WITH e AS (SELECT (epoch_ns(ts) // 1000) // 3600000000 AS hour_id,
                   ('0x' || substr(md5('hll-' || user_id::VARCHAR), 1, 15))::BIGINT
                     AS h
            FROM events),
    r AS (SELECT hour_id, h % 1024 AS idx,
                 CASE WHEN h // 1024 = 0 THEN 51
                      ELSE 51 - length(bin(h // 1024)) END AS rho
          FROM e),
    regs AS (SELECT hour_id, idx, max(rho) AS m FROM r GROUP BY hour_id, idx),
    agg AS (SELECT hour_id, sum(power(2.0, -m)) AS s_used, count(*) AS n_used
            FROM regs GROUP BY hour_id),
    est AS (SELECT hour_id,
                   ({0.7213 / (1.0 + 1.079 / 1024)!r}::DOUBLE * 1024 * 1024)
                     / (s_used + (1024 - n_used) * 1.0) AS e,
                   1024 - n_used AS v
            FROM agg)
    SELECT hour_id,
           round(CASE WHEN e <= 2560.0 AND v > 0
                      THEN 1024 * ln(1024.0 / v) ELSE e END, 4) AS hll_count
    FROM est"""


def evt_rollup_hll_merge(spark, sf_dir, base=None):
    """Incremental per-hour DISTINCT-user maintenance by mergeable HLL
    register states (dedup.hll_state/hll_merge/hll_finalize): the
    events table splits into three increments (event_id mod 3), each
    reduced to sparse per-(hour, register) max-rank rows, merged with
    one idempotent max-groupBy, and finalized with the bias-corrected
    estimator per hour. The oracle computes the per-hour HLL DIRECTLY —
    a green row proves merge(state(A), state(B), state(C)) ≡
    state(A ∪ B ∪ C) register-for-register. This is the sketch half of
    the continuous-aggregate pair with evt_rollup_merge: counts/sums
    merge by +, distincts CANNOT — but their register files merge by
    max, idempotently, so replayed or overlapping increments never
    double-count (test-pinned). State ≤ 1024 rows per hour at ANY user
    cardinality; exact per-hour distinct would shuffle every (hour,
    user) pair instead. Increment register states build in one corpus
    pass keyed (hour, increment) — see _rollup_base."""
    from semantic_cpp_spark.pipeline import dedup as dedup_ops

    if base is None:
        base = _rollup_base(spark, sf_dir)
    st = dedup_ops.hll_state(base, ["hour_id", "__inc"], F.col("user_id"))
    merged = dedup_ops.hll_merge([st], ["hour_id"])
    return dedup_ops.hll_finalize(merged, ["hour_id"])


_ROLLUP_QUANTILE_SQL = """WITH e AS (SELECT (epoch_ns(ts) // 1000) // 3600000000 AS hour_id,
                         round(value * 100)::BIGINT AS cents
                  FROM events),
    b AS (SELECT hour_id,
                 CASE WHEN abs(cents) < 256 THEN cents
                      WHEN cents < 0 THEN
                        -((abs(cents) >> (length(bin(abs(cents))) - 8))
                          << (length(bin(abs(cents))) - 8))
                      ELSE (cents >> (length(bin(cents)) - 8))
                           << (length(bin(cents)) - 8) END AS qv
          FROM e),
    st AS (SELECT hour_id, qv, count(*)::BIGINT AS cnt
           FROM b GROUP BY hour_id, qv),
    cum AS (SELECT hour_id, qv,
                   sum(cnt) OVER (PARTITION BY hour_id ORDER BY qv) AS c,
                   sum(cnt) OVER (PARTITION BY hour_id) AS n
            FROM st)
    SELECT hour_id, max(n)::BIGINT AS n,
           min(CASE WHEN c >= (n * 50 + 99) // 100 THEN qv END) AS p50,
           min(CASE WHEN c >= (n * 95 + 99) // 100 THEN qv END) AS p95,
           min(CASE WHEN c >= (n * 99 + 99) // 100 THEN qv END) AS p99
    FROM cum GROUP BY hour_id"""


def evt_rollup_quantile_merge(spark, sf_dir, base=None):
    """Incremental per-hour QUANTILE maintenance by mergeable sketch
    state (operators.rollup.qsketch_state — the last gap in the
    mergeable family: count/sum/min/max, variance, HLL-distinct and
    CMS-frequency all had merge forms; quantiles now do too). The
    events table splits into three deltas (event_id mod 3), each
    reduces to (hour, bin, count) rows under the exact integer log2
    binning (top QSKETCH_BITS+1 significant bits — DDSketch-grade
    <=2^-7 relative error, but engine-replayable where DDSketch's
    float log-gamma binning is not), merges by pure ADDITION, and
    answers p50/p95/p99 with exact integer rank thresholds
    (n*p + 99) div 100. The oracle bins the WHOLE table directly in
    SQL with the identical shift arithmetic, so a green row proves
    merge(state(A), state(B), state(C)) == state(A U B U C) through
    the quantiles themselves. State <= ~14.6k bins per hour at ANY
    row count; exact quantiles would sort every event instead.
    Error bound + monotonicity + merge-order invariance pinned in
    tests/test_rollup.py. Increment bin states build in one corpus
    pass keyed (hour, increment) — see _rollup_base."""
    from semantic_cpp_spark.operators import rollup

    if base is None:
        base = _rollup_base(spark, sf_dir)
    st = rollup.qsketch_state(base, ["hour_id", "__inc"], F.col("cents"))
    merged = rollup.merge_qsketch_states([st], ["hour_id"])
    return rollup.qsketch_quantiles(merged, ["hour_id"], [50, 95, 99])


def _rollup_family_sql() -> str:
    """Tagged union of the four mergeable-rollup oracles on the shared
    (aspect, hour_id, l1..l4, d1) slot schema (see
    evt_rollup_merge_family)."""
    return f"""SELECT 'merge' AS aspect, hour_id, n AS l1, total AS l2,
           vmin AS l3, vmax AS l4, vavg AS d1
    FROM ({_ROLLUP_MERGE_SQL}) __m
    UNION ALL
    SELECT 'var' AS aspect, hour_id, n AS l1, total AS l2,
           CAST(NULL AS BIGINT) AS l3, CAST(NULL AS BIGINT) AS l4,
           var_pop AS d1
    FROM ({_ROLLUP_VAR_SQL}) __v
    UNION ALL
    SELECT 'hll' AS aspect, hour_id, CAST(NULL AS BIGINT) AS l1,
           CAST(NULL AS BIGINT) AS l2, CAST(NULL AS BIGINT) AS l3,
           CAST(NULL AS BIGINT) AS l4, hll_count AS d1
    FROM ({_ROLLUP_HLL_SQL}) __h
    UNION ALL
    SELECT 'quantile' AS aspect, hour_id, n AS l1, p50 AS l2, p95 AS l3,
           p99 AS l4, CAST(NULL AS DOUBLE) AS d1
    FROM ({_ROLLUP_QUANTILE_SQL}) __q"""


@register("evt_rollup_merge_family", _rollup_family_sql())
def evt_rollup_merge_family(spark, sf_dir):
    """The whole mergeable-rollup family under ONE gate (r13 gate
    consolidation — one driver row re-proves merge(state(A), state(B),
    state(C)) ≡ state(A ∪ B ∪ C) for all four state algebras at once:
    count/sum/min/max (+), variance sufficient statistics (+),
    HLL registers (max), and the integer log2 quantile sketch (+);
    every member row survives verbatim in the tagged slot union
    (aspect, hour_id, l1..l4, d1), so no value coverage is lost).
    Aspect → member mapping: 'merge' → (n, total, vmin, vmax, vavg);
    'var' → (n, total, var_pop); 'hll' → (hll_count); 'quantile' →
    (n, p50, p95, p99). Four independent bounded-state branches —
    per-branch exchange unchanged by the union. r15: the branches
    share ONE materialized base projection (hour, increment, cents,
    user) — the union previously re-scanned and re-projected the
    events corpus per branch (12 scans counting the per-increment
    filters, now folded into the states' group keys; see
    _rollup_base)."""
    base = _rollup_base(spark, sf_dir).localCheckpoint()
    NL = F.lit(None).cast("long")
    ND = F.lit(None).cast("double")
    m = evt_rollup_merge(spark, sf_dir, base=base).select(
        F.lit("merge").alias("aspect"), "hour_id",
        F.col("n").alias("l1"), F.col("total").alias("l2"),
        F.col("vmin").alias("l3"), F.col("vmax").alias("l4"),
        F.col("vavg").alias("d1"),
    )
    v = evt_rollup_var_merge(spark, sf_dir, base=base).select(
        F.lit("var").alias("aspect"), "hour_id",
        F.col("n").alias("l1"), F.col("total").alias("l2"),
        NL.alias("l3"), NL.alias("l4"), F.col("var_pop").alias("d1"),
    )
    h = evt_rollup_hll_merge(spark, sf_dir, base=base).select(
        F.lit("hll").alias("aspect"), "hour_id",
        NL.alias("l1"), NL.alias("l2"), NL.alias("l3"), NL.alias("l4"),
        F.col("hll_count").alias("d1"),
    )
    q = evt_rollup_quantile_merge(spark, sf_dir, base=base).select(
        F.lit("quantile").alias("aspect"), "hour_id",
        F.col("n").alias("l1"), F.col("p50").alias("l2"),
        F.col("p95").alias("l3"), F.col("p99").alias("l4"),
        ND.alias("d1"),
    )
    return m.unionByName(v).unionByName(h).unionByName(q)
