"""Anomaly-detection operators over the ``events`` time series — the
reference repo's home domain (fraud/anomaly detection over transactions,
README.md:3) generalized to the harness's events table:

* hourly gap-fill with last-observation-carried-forward + linear
  interpolation (the resampling step every monitoring pipeline needs
  before scoring),
* an exponential-decay smoother with dyadic weights (EWMA shape; the
  reference's rolling-average deviation, src/features/build_features.py:36-37,
  with decaying instead of uniform weights),
* per-series OLS trend extraction from exact integer sums,
* IQR outlier fencing (the classic box-plot rule).

All four are single-plan DataFrame programs with DuckDB oracles.  Float
parity follows the registry conventions: exact integer/decimal
accumulation, then a fixed sequence of identical IEEE-754 ops in both
engines (no order-dependent double summation anywhere).

Scale notes (100 TB): every operator shuffles once on its series key
(``event_type``); the smoother and interpolation are window passes that
reuse that partitioning.  The hourly spine is bounded by calendar hours ×
series count — negligible next to the raw events — and the OLS aggregation
is a map-side-combinable sum of five integers per series.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.functions import dec2, fmt_ts
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

# Microseconds since epoch of 2024-01-01 00:00:00 UTC — the trend anchor.
# Fixed literal (not data-derived) so x is reproducible across runs.
ANCHOR_US = 1_704_067_200 * 1_000_000

SMOOTHER_TAPS = 8  # dyadic weights 2^7 .. 2^0, most recent heaviest
DEVIATION_CUTOFF = 40.0  # |value - smoothed| reported above this


def _cents(value: Column) -> Column:
    """Exact integer cents (q98's proven parity pattern)."""
    return F.round(value * 100).cast("long")


@register(
    "q101_gap_fill_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS avg_value
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT event_type, date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY event_type
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    joined AS (
      SELECT s.event_type, s.hour, h.avg_value FROM spine s
      LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hour = h.hour
    ),
    neighbors AS (
      SELECT event_type, hour, avg_value,
        last_value(avg_value IGNORE NULLS) OVER wp AS prev_v,
        last_value(CASE WHEN avg_value IS NOT NULL THEN epoch_us(hour) END
                   IGNORE NULLS) OVER wp AS prev_t,
        first_value(avg_value IGNORE NULLS) OVER wn AS next_v,
        first_value(CASE WHEN avg_value IS NOT NULL THEN epoch_us(hour) END
                    IGNORE NULLS) OVER wn AS next_t
      FROM joined
      WINDOW
        wp AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S.%f') AS hour,
      CASE WHEN avg_value IS NULL THEN 1 ELSE 0 END AS is_gap,
      CASE WHEN avg_value IS NOT NULL THEN avg_value
           ELSE prev_v + (next_v - prev_v) *
                (CAST(epoch_us(hour) - prev_t AS DOUBLE)
                 / CAST(next_t - prev_t AS DOUBLE))
      END AS value_filled
    FROM neighbors
    ORDER BY event_type, hour
    """,
)
def q101_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each event_type series to a dense hourly grid: exact hourly
    averages where data exists, linear interpolation between the nearest
    observed hours across gaps.  Spine endpoints always have data (they are
    the series' own min/max hours), so interior gaps are the only NULL case.
    One narrow left join (spine is tiny) + one window shuffle on the series
    key."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        (F.sum(dec2("value")).cast("double") / F.count("*").cast("double")).alias(
            "avg_value"
        )
    )
    spine = (
        ev.groupBy("event_type")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    joined = spine.join(hourly, ["event_type", "hour"], "left")
    tick = F.unix_micros(F.col("hour"))
    obs_t = F.when(F.col("avg_value").isNotNull(), tick)
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    neighbors = joined.select(
        "event_type",
        "hour",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_t, ignorenulls=True).over(wp).alias("prev_t"),
        F.first("avg_value", ignorenulls=True).over(wn).alias("next_v"),
        F.first(obs_t, ignorenulls=True).over(wn).alias("next_t"),
    )
    frac = (tick - F.col("prev_t")).cast("double") / (
        F.col("next_t") - F.col("prev_t")
    ).cast("double")
    return neighbors.select(
        "event_type",
        fmt_ts("hour").alias("hour"),
        F.when(F.col("avg_value").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .alias("value_filled"),
    ).orderBy("event_type", "hour")


def _q102_oracle() -> str:
    # HUGEINT weights (engine: decimal(38,0)): cents × 2^(taps-1)
    # overflows INT64 once |value| passes ~7e14 (extremes fuzz variant)
    num = " + ".join(
        f"COALESCE(CAST(lag_{k} AS HUGEINT), 0) * {1 << (SMOOTHER_TAPS - 1 - k)}"
        for k in range(SMOOTHER_TAPS)
    )
    den = " + ".join(
        f"(CASE WHEN lag_{k} IS NOT NULL THEN {1 << (SMOOTHER_TAPS - 1 - k)} ELSE 0 END)"
        for k in range(SMOOTHER_TAPS)
    )
    lags = ",\n        ".join(
        f"LAG(cents, {k}) OVER w AS lag_{k}" if k else "cents AS lag_0"
        for k in range(SMOOTHER_TAPS)
    )
    return f"""
    WITH cents AS (
      SELECT event_type, event_id, ts, value,
        CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    lagged AS (
      SELECT event_type, event_id, ts, value,
        {lags}
      FROM cents
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    smoothed AS (
      SELECT event_type, event_id, ts, value,
        (CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)) / 100.0 AS smoothed
      FROM lagged
    )
    SELECT event_type, CAST(event_id AS BIGINT) AS event_id,
      strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, value, smoothed,
      value - smoothed AS deviation
    FROM smoothed
    WHERE abs(value - smoothed) > {DEVIATION_CUTOFF!r}
    ORDER BY event_id
    """


@register("q102_decay_smoother", oracle=_q102_oracle())
def q102_decay_smoother(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-decay smoother with dyadic weights (2^7..2^0 over the
    last 8 events per series) and deviation flagging — the EWMA anomaly
    detector in a float-parity-safe form: the weighted numerator/denominator
    are exact BIGINT sums (cents × powers of two), so ``smoothed`` is one
    identical IEEE division in both engines.  Rows whose observed value
    deviates from the smoothed level by more than the cutoff are reported.
    Lags come from the scalable ``grouped_lags`` (ordinals via range
    exchange, lag-j as an equijoin on (series, ordinal−j)) — event_type
    has only five values, so a lag window would funnel a fifth of the
    event stream through one task at 100 TB."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_lags

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type", "event_id", "ts", "value", _cents(F.col("value")).alias("cents")
    )
    lagged = grouped_lags(
        base, "event_type", ["ts", "event_id"], "cents", SMOOTHER_TAPS - 1
    ).withColumn("lag_0", F.col("cents"))
    num = sum(
        (
            # decimal(38,0) weight space — see _q102_oracle's HUGEINT
            F.coalesce(F.col(f"lag_{k}"), F.lit(0)).cast("decimal(38,0)")
            * F.lit(1 << (SMOOTHER_TAPS - 1 - k))
            for k in range(SMOOTHER_TAPS)
        ),
        start=F.lit(0),
    )
    den = sum(
        (
            F.when(
                F.col(f"lag_{k}").isNotNull(), F.lit(1 << (SMOOTHER_TAPS - 1 - k))
            ).otherwise(F.lit(0))
            for k in range(SMOOTHER_TAPS)
        ),
        start=F.lit(0),
    )
    smoothed = (num.cast("double") / den.cast("double")) / F.lit(100.0)
    out = lagged.select(
        "event_type",
        "event_id",
        fmt_ts("ts").alias("ts"),
        "value",
        smoothed.alias("smoothed"),
        (F.col("value") - smoothed).alias("deviation"),
    )
    return out.filter(F.abs(F.col("deviation")) > DEVIATION_CUTOFF).orderBy("event_id")


@register(
    "q103_ols_trend",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
        CAST(floor(CAST(epoch_us(ts) - {ANCHOR_US} AS DOUBLE) / 60000000.0)
             AS BIGINT) AS x,
        CAST(round(value * 100) AS BIGINT) AS y100
      FROM events
    ),
    sums AS (
      -- int128 sums and closed-form products: n·Σxy overflows INT64 at
      -- the sf1 scale point (2.5e19 > 2^63; r15 — DuckDB refused, Spark
      -- ANSI raised).  Per-row x/x²/x·y stay INT64-safe (x is bounded by
      -- the TIME RANGE, not row count); everything downstream of the
      -- SUM is exact int128 / DECIMAL(38,0), then ONE correctly-rounded
      -- double conversion per factor in both engines.
      SELECT event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        CAST(SUM(CAST(y100 AS HUGEINT)) AS HUGEINT) AS sy,
        CAST(SUM(CAST(x * x AS HUGEINT)) AS HUGEINT) AS sxx,
        -- x·y100 in int128: y100 scales with VALUE magnitude, and the
        -- per-row BIGINT product overflows at extreme values (r16 fuzz)
        CAST(SUM(CAST(x AS HUGEINT) * CAST(y100 AS HUGEINT)) AS HUGEINT) AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
      (CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
       / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE))
        / 100.0 AS slope_per_min,
      (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0
        - ((CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
            / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE))
           / 100.0)
          * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS intercept
    FROM sums
    ORDER BY event_type
    """,
)
def q103_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series linear trend (drift detection): least-squares slope of
    value vs minutes-since-anchor, computed from five exact integer sums
    (n, Σx, Σy, Σx², Σxy) so both engines evaluate the identical
    closed-form expression.  Per-row x/x²/x·y stay INT64-safe (x is
    bounded by the TIME RANGE, not row count), but the sums and the
    closed-form products grow with rows — n·Σxy overflowed INT64 at the
    sf1 scale point (2.5e19 > 2^63; r15 — DuckDB refused, Spark ANSI
    raised), so they carry DECIMAL(38,0) here and int128 in the oracle:
    exact to 38 digits, overflow-free past 10¹² rows, one
    correctly-rounded double conversion per factor in both engines.
    The aggregation is fully map-side combinable — at 100 TB it is one
    partial-agg pass plus a five-number shuffle per series."""
    ev = load_table(spark, sf_dir, "events")
    x = F.floor(
        (F.unix_micros(F.col("ts")) - F.lit(ANCHOR_US)).cast("double")
        / F.lit(60000000.0)
    ).cast("long")
    pts = ev.select(
        "event_type", x.alias("x"), _cents(F.col("value")).alias("y100")
    )
    dec = "decimal(38,0)"
    sums = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y100").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        # x·y100 multiplies in DECIMAL(38,0): y100 scales with the VALUE
        # magnitude (±1e15 values → y100 ±1e17; × x ~4e21 > 2^63), so a
        # per-row LONG product overflows under ANSI — the extremes fuzz
        # variant caught it (r16).  x·x stays LONG-safe (x is bounded by
        # the time range, ≤ ~5e5 minutes).
        F.sum(F.col("x").cast(dec) * F.col("y100").cast(dec)).alias("sxy"),
    )
    n, sx, sy = F.col("n").cast(dec), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (
        (n * sxy - sx * sy).cast("double") / (n * sxx - sx * sx).cast("double")
    ) / F.lit(100.0)
    intercept = (sy.cast("double") / n.cast("double")) / F.lit(100.0) - slope * (
        sx.cast("double") / n.cast("double")
    )
    return sums.select(
        "event_type",
        "n",
        slope.alias("slope_per_min"),
        intercept.alias("intercept"),
    ).orderBy("event_type")


@register(
    "q104_iqr_outliers",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM events
      WHERE value IS NOT NULL
    ),
    fenced AS (
      SELECT event_type, value, cnt,
        MAX(CASE WHEN rn = CAST(ceil(0.25 * cnt) AS BIGINT) THEN value END)
          OVER (PARTITION BY event_type) AS q1,
        MAX(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT) THEN value END)
          OVER (PARTITION BY event_type) AS q3
      FROM ranked
    )
    SELECT event_type,
      CAST(MAX(cnt) AS BIGINT) AS n,
      MAX(q1) AS q1,
      MAX(q3) AS q3,
      CAST(COUNT(CASE WHEN value > q3 + 1.5 * (q3 - q1) THEN 1 END) AS BIGINT)
        AS n_outliers_hi,
      CAST(COUNT(CASE WHEN value < q1 - 1.5 * (q3 - q1) THEN 1 END) AS BIGINT)
        AS n_outliers_lo
    FROM fenced
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q104_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-plot outlier fencing per series: exact rank-selected quartiles
    (no interpolation — selected values are actual data points, so parity
    is trivial), fences at ±1.5·IQR evaluated with the identical double
    expression in both engines, and per-series outlier counts.  Ranks
    come from the scalable ``grouped_row_ids`` (range exchange on
    (event_type, value…)) — event_type has only five values, so a
    per-series window task would sort a fifth of the event stream at
    100 TB; the quartiles reduce to a 5-row dimension broadcast-joined
    back."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_row_ids

    ev = load_table(spark, sf_dir, "events")
    # quantiles are over OBSERVED values: NULLs are excluded up front in
    # both engines — ranking them is engine-dependent (Spark orders
    # nulls first, DuckDB last; nulls fuzz variant)
    ranked = grouped_row_ids(
        ev.filter(F.col("value").isNotNull()).select(
            "event_type", "value", "event_id"
        ),
        "event_type",
        ["value", "event_id"],
        ordinal_col="rn",
        total_col="cnt",
    )

    def pick(p: float) -> Column:
        target = F.ceil(F.lit(p) * F.col("cnt")).cast("bigint")
        return F.max(F.when(F.col("rn") == target, F.col("value")))

    quart = ranked.groupBy("event_type").agg(
        F.max("cnt").alias("n"),
        pick(0.25).alias("q1"),
        pick(0.75).alias("q3"),
    )
    # null-SAFE join: a plain equi-join would drop a NULL series key
    fenced = ranked.join(
        F.broadcast(quart.withColumnRenamed("event_type", "_g")),
        F.col("event_type").eqNullSafe(F.col("_g")),
    ).drop("_g")
    iqr = F.col("q3") - F.col("q1")
    return (
        fenced.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("q1").alias("q1"),
            F.max("q3").alias("q3"),
            F.count(
                F.when(F.col("value") > F.col("q3") + 1.5 * iqr, 1)
            ).alias("n_outliers_hi"),
            F.count(
                F.when(F.col("value") < F.col("q1") - 1.5 * iqr, 1)
            ).alias("n_outliers_lo"),
        )
        .orderBy("event_type")
    )


# Benford expected first-digit shares, log10(1+1/d) rounded to 6dp and
# inlined as literals on BOTH sides (log() is banned in oracle-checked
# expressions — libm rounding differs across engines).
BENFORD = {
    1: 0.301030, 2: 0.176091, 3: 0.124939, 4: 0.096910,
    5: 0.079181, 6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


def _q123_oracle() -> str:
    expected = " ".join(
        f"WHEN {d} THEN {p!r}" for d, p in BENFORD.items()
    )
    return f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1.0
    ),
    counts AS (
      SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
    ),
    total AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts)
    SELECT digit, n,
      CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS share,
      CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
        - (CASE digit {expected} END) AS benford_gap
    FROM counts, total
    ORDER BY digit
    """


@register("q123_benford_profile", oracle=_q123_oracle())
def q123_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen over transaction amounts — the classic
    bulk fraud indicator in the reference's domain: fabricated amounts
    drift from the log-uniform first-digit law.  The first digit is read
    from the DECIMAL(18,2) string rendering (exact and engine-identical,
    unlike double→string shortest-repr) and each digit's observed share is
    compared against the Benford expectation inlined as literals.  One
    map-side-combinable aggregation; the total is a 1-row broadcast."""
    ord_ = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    digit = F.substring(dec2("o_totalprice").cast("string"), 1, 1).cast("bigint")
    counts = ord_.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    total = counts.agg(F.sum("n").alias("t"))
    share = F.col("n").cast("double") / F.col("t").cast("double")
    cases = None
    for d, p in BENFORD.items():
        cases = (
            F.when(F.col("digit") == d, F.lit(p))
            if cases is None
            else cases.when(F.col("digit") == d, F.lit(p))
        )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            share.alias("share"),
            (share - cases).alias("benford_gap"),
        )
        .orderBy("digit")
    )


def _q130_oracle() -> str:
    taps = SMOOTHER_TAPS
    # HUGEINT weights (engine: decimal(38,0)) — day_cents × 2^(taps-1)
    # overflows INT64 at extreme values (extremes fuzz variant)
    num = " + ".join(
        f"COALESCE(CAST(lag_{k} AS HUGEINT), 0) * {1 << (taps - 1 - k)}"
        for k in range(taps)
    )
    den = " + ".join(
        f"(CASE WHEN lag_{k} IS NOT NULL THEN {1 << (taps - 1 - k)} ELSE 0 END)"
        for k in range(taps)
    )
    lags = ",\n        ".join(
        f"LAG(day_cents, {k}) OVER w AS lag_{k}" if k else "day_cents AS lag_0"
        for k in range(taps)
    )
    return f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
        CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents,
        COUNT(*) AS n_events
      FROM events
      GROUP BY event_type, date_trunc('day', ts)
    ),
    lagged AS (
      SELECT event_type, day, day_cents, n_events,
        {lags}
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    smoothed AS (
      SELECT event_type, day, day_cents, n_events,
        (CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)) AS smoothed_cents
      FROM lagged
    ),
    ranked AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day_cents, day) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM smoothed
    ),
    fenced AS (
      SELECT *,
        MAX(CASE WHEN rn = CAST(ceil(0.25 * cnt) AS BIGINT) THEN day_cents END)
          OVER (PARTITION BY event_type) AS q1c,
        MAX(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT) THEN day_cents END)
          OVER (PARTITION BY event_type) AS q3c
      FROM ranked
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
      CAST(day_cents AS DOUBLE) / 100.0 AS day_total,
      smoothed_cents / 100.0 AS smoothed_total,
      (CAST(day_cents AS DOUBLE) - smoothed_cents) / 100.0 AS deviation,
      CASE WHEN CAST(day_cents AS DOUBLE)
                > CAST(q3c AS DOUBLE) + 1.5 * (CAST(q3c AS DOUBLE) - CAST(q1c AS DOUBLE))
             OR CAST(day_cents AS DOUBLE)
                < CAST(q1c AS DOUBLE) - 1.5 * (CAST(q3c AS DOUBLE) - CAST(q1c AS DOUBLE))
           THEN 1 ELSE 0 END AS is_outlier
    FROM fenced
    ORDER BY event_type, day
    """


@register("q130_daily_anomaly_monitor", oracle=_q130_oracle(), headline=True)
def q130_daily_anomaly_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The domain capstone composite: the reference's daily gold rollup
    (src/data/gold.py:31-41) fused with this module's detectors in ONE
    declarative plan — exact daily totals, dyadic-EWMA expected level,
    deviation, and IQR outlier flags per series.  Catalyst schedules two
    exchanges total: the daily aggregation, then one event_type
    partitioning reused by the lag window, both rank windows, and the
    fence computation.  Every arithmetic step reuses a proven parity
    pattern (cents sums, dyadic weights, rank-selected quartiles)."""
    taps = SMOOTHER_TAPS
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(_cents(F.col("value"))).alias("day_cents"),
        F.count("*").alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lag_cols = [
        (F.lag("day_cents", k).over(w) if k else F.col("day_cents")).alias(f"lag_{k}")
        for k in range(taps)
    ]
    lagged = daily.select("event_type", "day", "day_cents", "n_events", *lag_cols)
    # int128 weight space (decimal(38,0) / oracle HUGEINT): day_cents ×
    # 2^(taps-1) overflows INT64 once a day's cents pass ~7e16 — the
    # extremes fuzz variant hit it at ±1e15 values; int→double casts
    # stay correctly rounded in both engines.
    # r17 A/B'd and REJECTED a two-lane int64/decimal split (rows whose
    # lags provably fit INT64 taking a long-sum lane): 7-rep isolated
    # bench measured the split SLOWER — 0.934 s vs 0.780 s at sf0.1 —
    # the 16 guard comparisons plus the duplicated weighted-sum tree
    # cost more than the decimal math they skip (q196-persist lesson:
    # measure, keep the loser out).
    num = sum(
        (
            F.coalesce(F.col(f"lag_{k}"), F.lit(0)).cast("decimal(38,0)")
            * F.lit(1 << (taps - 1 - k))
            for k in range(taps)
        ),
        start=F.lit(0),
    )
    den = sum(
        (
            F.when(F.col(f"lag_{k}").isNotNull(), F.lit(1 << (taps - 1 - k))).otherwise(
                F.lit(0)
            )
            for k in range(taps)
        ),
        start=F.lit(0),
    )
    smoothed = lagged.withColumn(
        "smoothed_cents", num.cast("double") / den.cast("double")
    )
    wr = Window.partitionBy("event_type").orderBy("day_cents", "day")
    wall = Window.partitionBy("event_type")
    ranked = smoothed.select(
        "*",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wall).alias("cnt"),
    )

    def pick(p: float) -> Column:
        target = F.ceil(F.lit(p) * F.col("cnt")).cast("bigint")
        return F.max(F.when(F.col("rn") == target, F.col("day_cents"))).over(wall)

    fenced = ranked.select("*", pick(0.25).alias("q1c"), pick(0.75).alias("q3c"))
    dc = F.col("day_cents").cast("double")
    q1d, q3d = F.col("q1c").cast("double"), F.col("q3c").cast("double")
    iqr = q3d - q1d
    return fenced.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (dc / 100.0).alias("day_total"),
        (F.col("smoothed_cents") / 100.0).alias("smoothed_total"),
        ((dc - F.col("smoothed_cents")) / 100.0).alias("deviation"),
        F.when((dc > q3d + 1.5 * iqr) | (dc < q1d - 1.5 * iqr), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_outlier"),
    ).orderBy("event_type", "day")


@register(
    "q135_pandas_udaf_mad",
    python_lane=True,
    oracle="""
    SELECT event_type,
      COUNT(*) AS n,
      mad(value) AS mad_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q135_pandas_udaf_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per series via a GROUPED-AGGREGATE pandas
    UDF — the one Arrow UDF variant the rest of the engine doesn't use
    (scalar pandas_udf: q36; grouped map: q70; mapInPandas: q116; UDTF:
    q87).  Spark has no native MAD; the UDAF receives each group's values
    as one Arrow batch and reduces them with two numpy medians —
    justified Python because median is a rank statistic, not an algebraic
    aggregate (no map-side combine exists for it; at 100 TB switch to
    approx_percentile-based MAD, trading exactness for mergeability).
    DuckDB's built-in mad() is the oracle: both engines compute
    median(|x − median(x)|) with the same even-count interpolation
    (a+b)/2, so float64 outputs match bitwise."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # Explicit GROUPED_AGG: PEP-563 stringized hints break eval-type
    # inference in this module (same constraint as text/dedup.simhash64),
    # and without hints the decorator defaults to SCALAR.
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def mad(v):
        med = v.median()
        return (v - med).abs().median()

    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count rides the same Arrow path
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def arrow_count(v):
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            arrow_count(F.col("value")).alias("n"),
            mad(F.col("value")).alias("mad_value"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------- seasonal profile (q176)


@register(
    "q176_seasonal_residuals",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             dayofweek(ts) AS dow,
             hour(ts) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             SUM(CAST(value AS DECIMAL(18,2))) AS dec_sum
      FROM events GROUP BY event_type, dow, hod
    ),
    typ AS (
      SELECT event_type,
             SUM(dec_sum) AS t_sum,
             CAST(SUM(n_events) AS BIGINT) AS t_n
      FROM cells GROUP BY event_type
    )
    SELECT
      c.event_type, c.dow, c.hod, c.n_events,
      CAST(CAST(c.dec_sum AS VARCHAR) AS DOUBLE) / c.n_events AS cell_mean,
      (CAST(CAST(c.dec_sum AS VARCHAR) AS DOUBLE) / c.n_events)
        / (CAST(CAST(t.t_sum AS VARCHAR) AS DOUBLE) / t.t_n) AS seasonal_index
    FROM cells c JOIN typ t USING (event_type)
    ORDER BY event_type, dow, hod
    """,
)
def q176_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly×hourly seasonal profile per event_type — the seasonality
    operator the anomaly family lacked: mean value per (day-of-week,
    hour-of-day) cell and its index against the series mean.  An index
    far from 1.0 IS the expected seasonal swing; residual-based alerting
    (q130's daily monitor) divides by this profile so Monday-morning
    peaks stop paging anyone.

    Exactness: cell and series means come from one decimal-sum
    aggregation tree (cells → type totals, partials add exactly), each
    emitted double is a single identical IEEE division in both engines.
    One scan, two hash aggregations, a broadcast-size (type) join —
    the always-on profile query shape at 100 TB.

    Day-of-week convention: DuckDB ``dayofweek`` is 0=Sunday;
    Spark ``dayofweek`` is 1=Sunday, so the Spark side subtracts 1.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(dec2("value")).alias("dec_sum"),
    )
    typ = cells.groupBy("event_type").agg(
        F.sum("dec_sum").alias("t_sum"),
        F.sum("n_events").alias("t_n"),
    )
    cell_mean = F.col("dec_sum").cast("double") / F.col("n_events")
    type_mean = F.col("t_sum").cast("double") / F.col("t_n")
    return (
        cells.join(F.broadcast(typ), "event_type")
        .select(
            "event_type",
            "dow",
            "hod",
            "n_events",
            cell_mean.alias("cell_mean"),
            (cell_mean / type_mean).alias("seasonal_index"),
        )
        .orderBy("event_type", "dow", "hod")
    )
