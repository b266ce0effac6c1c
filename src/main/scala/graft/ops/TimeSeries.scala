package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: bucket an event stream onto a fixed grid,
 * fill the gaps, and carry the last observation forward (LOCF) — the
 * standard densification step before windowed feature extraction or
 * charting, where a missing hour must read as "0 events, value unchanged"
 * rather than silently vanish.
 *
 * Scale shape: the hourly rollup is one (key, hour)-keyed aggregate with
 * map-side combine; the grid generator explodes a per-key `sequence`
 * between that key's own min/max hour (grid rows ≈ span-hours per key, no
 * global cross join); the LOCF window partitions by key — no global sort.
 * Gap volume is bounded per key by its own activity span.
 */
object TimeSeries {

  /** Hourly grid per key with gap rows (n=0) and last-observed hourly
    * total carried forward. `valueCol` should be exact (integer) units —
    * the query layer converts money to cents first so sums are
    * order-independent. Output: (keyCol, hour, n, v_locf). */
  def gapFillLocf(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("v"))
    val spans = hourly.groupBy(col(keyCol))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hourly, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("v"), ignoreNulls = true).over(w).as("v_locf"))
  }

  /**
   * Batch sessionization: the gaps-and-islands assignment (a new session
   * starts when the gap since the previous event REACHES `gapSeconds`,
   * i.e. gap >= gapSeconds breaks the session — matching the q88 oracle) —
   * the batch twin of the streaming session window (q32), but emitting a
   * session id PER EVENT so downstream joins can attribute rows to
   * sessions. One per-key window; `tieCol` breaks equal-timestamp ties so
   * the assignment is total-order deterministic. Output: input columns +
   * session_seq (0-based per key) + session_id.
   */
  def sessionIds(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val brk = when(prev.isNull
      .or(unix_micros(col(tsCol)) - prev >= gapSeconds * 1000000L), 1L)
      .otherwise(0L)
    events
      .withColumn("session_seq",
        (sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
          .cast("long"))
      .withColumn("session_id",
        concat(col(keyCol).cast("string"), lit("#"), col("session_seq").cast("string")))
  }

  /**
   * Retention cohort matrix: users grouped by their first-activity week
   * (the cohort), counted in each later week they return — the classic
   * retention triangle. Two aggregates and one broadcastable join of the
   * per-user cohort frame back to events; week offsets in exact integer
   * arithmetic on epoch seconds (both engines truncate weeks to Monday).
   */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val firstWeek = events.groupBy(col(keyCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    events
      .select(col(keyCol), date_trunc("week", col(tsCol)).as("activity_week"))
      .join(firstWeek, Seq(keyCol))
      .groupBy(col("cohort_week"),
        expr("(unix_seconds(activity_week) - unix_seconds(cohort_week)) div 604800")
          .as("week_offset"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
  }

  /**
   * CUSUM level-shift detection per series (Page 1954, Biometrika): for
   * each event type's hourly counts in time order, the one-sided CUSUM
   * s_t = max(0, s_{t-1} + (c_t − μ)) with μ = the series' mean hourly
   * count; `alarm` when s_t > μ (one sustained extra mean-hour of
   * volume). The ingest-monitoring statistic that catches a scraper gone
   * hot or a stuck producer — a level shift — where per-hour outlier
   * tests miss slow drifts.
   *
   * Exactness: the recurrence is rewritten as the WINDOW identity
   * s_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of the
   * deviations — and the deviations are SCALED TO INTEGERS
   * (x_t = c_t·n − total, i.e. n·(c_t − μ)) so the running windows are
   * exact regardless of each engine's internal aggregation tree (DuckDB's
   * segment-tree window association would diverge on doubles); the two
   * reported doubles (μ, cusum in mean-hours… er, hours of drift) each
   * come from ONE final divide.
   *
   * Scale shape: an hour-bucketed count (map-side combinable), a
   * series-keyed broadcast of per-series totals, and two running windows
   * PARTITIONED BY series — no global sort, state bounded by series
   * count.
   */
  /**
   * Seasonal profile + residuals per series: each (series, hour) count
   * against the series' hour-of-day seasonal mean — the calendar
   * complement of [[cusumDrift]] (CUSUM finds level SHIFTS; this removes
   * the daily rhythm so what remains is anomaly, not breakfast). Same
   * integer-scaling discipline: residual_scaled = c·n_hod − total_hod is
   * BIGINT-exact; the reported seasonal mean and residual are one divide
   * each.
   *
   * Scale shape: two hour-keyed map-combinable counts and one
   * (series, hod)-keyed broadcastable join — 24·|series| profile rows.
   */
  /**
   * Truncated EWMA (α = 1/2) over per-series hourly counts, exact by
   * construction: weights are powers of two, so the numerator is the
   * INTEGER Σₖ cnt_{t−k}·2^(lags−1−k) over the available lags and the
   * denominator the matching integer weight sum — one double divide at
   * the end, no float pow, no association ambiguity (the usual
   * recursive-EWMA float accumulation diverges between engines; this
   * cannot). Truncation at `lags` costs at most 2^−lags of mass.
   * Index-based: smoothing runs over OBSERVED buckets (gaps don't decay
   * the average — compose with [[gapFillLocf]] first when they should).
   *
   * Scale shape: one (series, hour) map-combinable count, one
   * series-partitioned window with a bounded `lags`-row frame.
   */
  def ewmaSmooth(events: DataFrame, seriesCol: String, tsCol: String,
      lags: Int = 8): DataFrame = {
    require(lags >= 1 && lags <= 62, s"lags must be in [1, 62], got $lags")
    val hourly = events
      .groupBy(col(seriesCol).as("series"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("series")).orderBy(col("hour"))
    val terms = (0 until lags).map { k =>
      (lag(col("c"), k).over(w), 1L << (lags - 1 - k))
    }
    val num = terms.map { case (v, wt) => coalesce(v * lit(wt), lit(0L)) }
      .reduce(_ + _)
    val den = terms.map { case (v, wt) =>
      when(v.isNotNull, lit(wt)).otherwise(lit(0L))
    }.reduce(_ + _)
    hourly.select(col("series"), col("hour"), col("c"),
      (num.cast("double") / den.cast("double")).as("ewma"))
  }

  /**
   * Run-length encoding of per-key event streams (gaps-and-islands):
   * maximal runs of consecutive identical `typeCol` values in (ts, id)
   * order, via the row_number-difference grouping key. The repetition
   * profile of behavioral data — bot detection (absurd run lengths),
   * session monotony, retry storms.
   *
   * Scale shape: two windows over the same (key, ts, id) sort order (one
   * partition-wide, one sub-partitioned by type — same exchange), then a
   * map-combinable aggregate on (key, type, island).
   */
  def eventRuns(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val wAll = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val wTyp = Window.partitionBy(col(keyCol), col(typeCol))
      .orderBy(col(tsCol), col(idCol))
    events
      .select(col(keyCol), col(typeCol), col(tsCol), col(idCol),
        (row_number().over(wAll) - row_number().over(wTyp)).as("island"))
      .groupBy(col(keyCol), col(typeCol), col("island"))
      .agg(count(lit(1)).as("run_len"), min(col(tsCol)).as("run_start"))
  }

  /**
   * Watermark-lateness audit: per key, each event's arrival lag behind
   * the running event-time high-water mark in `arrivalCol` order —
   * summarized as drop counts at 1/2/5-minute watermarks and the max.
   * The measurement that justifies a pipeline's watermark with data:
   * drop_Wmin is EXACTLY the volume a W-minute watermark would discard
   * (per-key hwm is the conservative per-partition view). First arrivals
   * have lateness 0 (coalesce, not null-propagating greatest — engines
   * disagree on greatest(NULL, 0)).
   */
  def latenessAudit(events: DataFrame, keyCol: String, arrivalCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lat = events
      .select(col(keyCol), col(arrivalCol), unix_micros(col(tsCol)).as("us"))
      .withColumn("hwm", max(col("us")).over(w))
      .select(greatest(coalesce(col("hwm") - col("us"), lit(0L)), lit(0L))
        .as("late_us"))
    lat.agg(
        count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        sum(when(col("late_us") > 60000000L, 1L).otherwise(0L)).as("drop_1min"),
        sum(when(col("late_us") > 120000000L, 1L).otherwise(0L)).as("drop_2min"),
        sum(when(col("late_us") > 300000000L, 1L).otherwise(0L)).as("drop_5min"),
        max(col("late_us")).as("max_late_us"))
      .select(col("n_events"), col("n_late"), col("drop_1min"),
        col("drop_2min"), col("drop_5min"), col("max_late_us"),
        (col("drop_2min").cast("double") / col("n_events").cast("double"))
          .as("drop_2min_share"))
  }

  def seasonalResiduals(events: DataFrame, seriesCol: String,
      tsCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(seriesCol).as("series"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("c"))
      .withColumn("hod", hour(col("hour")).cast("long"))
    val prof = hourly.groupBy(col("series"), col("hod"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("nh"))
    hourly.join(broadcast(prof), Seq("series", "hod"))
      .select(col("series"), col("hour"), col("hod"), col("c"),
        (col("total").cast("double") / col("nh").cast("double")).as("seasonal_mu"),
        ((col("c") * col("nh") - col("total")).cast("double") /
          col("nh").cast("double")).as("residual"))
  }

  /**
   * Conversion-latency curve: for users whose first `toType` event follows
   * their first `fromType` event, the distribution of first-touch →
   * conversion latency in hour buckets plus the cumulative conversion
   * share — the survival-curve summary of product analytics ("x% convert
   * within n hours"), built on exact integer arithmetic: latencies in
   * microseconds (unix_micros ≡ epoch_us), hour buckets by integer DIV,
   * the cumulative count an integer running window (tree-association
   * proof like [[cusumDrift]]), and ONE divide for the share.
   *
   * Scale shape: two user-keyed min aggregates, one join, one bucket
   * count, one bounded running window over ≤ max-latency-hours rows.
   */
  def conversionLatency(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, fromType: String, toType: String): DataFrame = {
    def firstOf(t: String, as: String) = events
      .filter(col(typeCol) === t)
      .groupBy(col(userCol).as("u"))
      .agg(min(col(tsCol)).as(as))
    val base = firstOf(fromType, "t_from")
    val joined = base
      .join(firstOf(toType, "t_to"), "u")
      .filter(col("t_to") >= col("t_from"))
      .select(expr("(unix_micros(t_to) - unix_micros(t_from)) DIV 3600000000")
        .as("hours"))
    val nBase = base.agg(count(lit(1)).as("n_base"))
    val w = Window.orderBy(col("hours"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.groupBy(col("hours")).agg(count(lit(1)).as("n_converted"))
      .withColumn("cum_converted", sum(col("n_converted")).over(w))
      .crossJoin(broadcast(graft.ops.Guards.scalar(nBase)))
      .select(col("hours"), col("n_converted"), col("cum_converted"),
        (col("cum_converted").cast("double") / col("n_base").cast("double"))
          .as("cum_share"))
  }

  def cusumDrift(events: DataFrame, seriesCol: String, tsCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(seriesCol).as("series"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("c"))
    val tot = hourly.groupBy(col("series"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("nh"))
    val w = Window.partitionBy(col("series")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly.join(broadcast(tot), "series")
      .withColumn("p", sum(col("c") * col("nh") - col("total")).over(w))
      .withColumn("cs", col("p") - least(min(col("p")).over(w), lit(0L)))
      .select(col("series"), col("hour"), col("c"),
        (col("total").cast("double") / col("nh").cast("double")).as("mu"),
        (col("cs").cast("double") / col("nh").cast("double")).as("cusum"),
        (col("cs") > col("total")).as("alarm"))
  }
}
