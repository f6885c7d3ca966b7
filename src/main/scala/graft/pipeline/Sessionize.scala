package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: one output row per (key, session), where a
 * session is a maximal run of events whose inter-arrival gap stays under
 * `gap`. Built on `session_window`, so the same operator runs in batch
 * (merging windows inside the aggregate — one shuffle on the key) and in
 * Structured Streaming (with a watermark, state expires as sessions close —
 * exactly the mapGroupsWithState-style sessionization a training-data
 * pipeline needs for clickstream/event data, without hand-rolled state).
 *
 * At scale the plan is one hash-shuffle on `keyCol`; skewed keys split via
 * AQE like any aggregate. No window-function sort over the whole corpus —
 * the classic lag()+cumsum sessionization needs one — which is the point.
 */
object Sessionize {

  /**
   * Sessions per key with bounds, event count, and any extra aggregates
   * (name → aggregate expression over the input rows).
   */
  def sessions(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String,
      extraAggs: Seq[(String, Column)] = Nil): DataFrame = {
    val aggCols = count(lit(1)).as("events") +: extraAggs.map { case (n, c) => c.as(n) }
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col(keyCol) +:
        col("session_window.start").as("session_start") +:
        col("session_window.end").as("session_end") +:
        col("events") +:
        extraAggs.map { case (n, _) => col(n) }: _*)
  }

  /**
   * Retention cohort matrix: users cohort by the epoch week of their FIRST
   * event; each (cohort_week, week_offset) cell counts the distinct users
   * of that cohort active `offset` weeks later — the standard retention
   * triangle. Weeks are days-since-1970 `div` 7 (pure integer arithmetic,
   * identical on any engine; calendar week-of-year functions are a locale
   * trap). Offsets beyond `maxWeeks` drop, bounding the matrix.
   *
   * Scale shape: one min-timestamp aggregate keyed by user, one user-keyed
   * equi-join moving only (user, week) pairs, one distinct-count aggregate
   * on (cohort, offset) — payloads never move, and the join reuses the
   * user-hash partitioning the aggregate just produced.
   */
  def retentionCohorts(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      maxWeeks: Int): DataFrame = {
    require(maxWeeks >= 0, s"maxWeeks must be >= 0, got $maxWeeks")
    // week() only ever sees INTERNAL column names — the user's tsCol is
    // projected to __ts first, so a quote/backtick in the name can't break
    // the expr() parse.
    def week(inner: String): Column =
      expr(s"CAST(datediff(to_date($inner), DATE'1970-01-01') AS BIGINT) div 7")
    val firsts = df.groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__t0"))
      .select(col("__u"), week("__t0").as("__w0"))
    df.select(col(userCol).as("__u2"), col(tsCol).as("__ts"))
      .select(col("__u2"), week("__ts").as("__w"))
      .join(firsts, col("__u2") === col("__u"))
      .withColumn("week_offset", col("__w") - col("__w0"))
      .where(col("week_offset") >= 0 && col("week_offset") <= maxWeeks)
      .groupBy(col("__w0").as("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("__u")).as("n_users"))
  }

  /**
   * Exact-integer EWMA smoothing over per-key bucket series — the metric
   * smoother beside [[rollingAnomalies]]'s flags: each bucket's smoothed
   * value is the decay-weighted mean of its trailing `window` buckets,
   * with weights w_k = round(decay^k · 1e6) computed ONCE driver-side
   * (both engines consume the same integer table, so there is no float
   * recurrence to diverge — the usual EWMA formulation is a running
   * float state that no replay can pin). Missing lags (series head,
   * gaps under ROWS semantics — the rollingAnomalies convention) drop
   * from numerator AND denominator, so early buckets are true partial
   * means, not zero-diluted.
   *
   * Scale shape: one per-key window with `window` lag() reads — compact
   * bucket rows, never raw events; quantized micro values keep every
   * product inside int64 (x_micro · 1e6 · window ≪ 2^63).
   */
  def ewmaSmooth(
      df: DataFrame,
      keyCols: Seq[String],
      tCol: String,
      valueCol: String,
      decayPermille: Int,
      window: Int): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(decayPermille >= 1 && decayPermille <= 999,
      s"decayPermille must be in [1, 999], got $decayPermille")
    require(window >= 1 && window <= 64,
      s"window must be in [1, 64], got $window")
    import org.apache.spark.sql.expressions.Window
    val weights = ewmaWeights(decayPermille, window)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__t"))
    val base = df.select(keyCols.map(col) :+ col(tCol).as("__t") :+
        round(col(valueCol).cast("double") * lit(1000000.0)).cast("long")
          .as("__v"): _*)
      .where(col("__v").isNotNull)
    val lags = weights.zipWithIndex.map { case (wk, k) =>
      (lag(col("__v"), k).over(w), lit(wk))
    }
    val num = lags.map { case (x, wk) =>
      when(x.isNotNull, x * wk).otherwise(lit(0L)) }.reduce(_ + _)
    val den = lags.map { case (x, wk) =>
      when(x.isNotNull, wk).otherwise(lit(0L)) }.reduce(_ + _)
    base.withColumn("__num", num).withColumn("__den", den)
      .select(keyCols.map(col) :+ col("__t").as(tCol) :+
        col("__v").as("value_micro") :+
        expr("__num div __den").as("ewma_micro"): _*)
  }

  /** The shared integer weight table: w_k = round(decay^k · 1e6),
    * computed once so Spark and any oracle consume identical numbers. */
  def ewmaWeights(decayPermille: Int, window: Int): Seq[Long] =
    (0 until window).map(k =>
      math.round(math.pow(decayPermille / 1000.0, k) * 1e6))

  /**
   * Peak concurrency per key: the maximum number of simultaneously open
   * [start, end) intervals, and when it is first reached — max concurrent
   * sessions/streams/leases, the capacity-planning number beside
   * [[intervalCoverage]]'s total. The classic boundary sweep: +1 at each
   * start, −1 at each end, ordered by (t, delta) so an interval ENDING at
   * t closes before one STARTING at t opens (half-open semantics — back-
   * to-back intervals never double-count); the peak is the max running
   * sum, `peak_at` its first time. Two compact windows over 2·n per-key
   * boundary rows; invalid intervals drop.
   */
  def peakConcurrency(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val valid = df.select(col(keyCol).as("__k"),
        col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
      .where(col("__s").isNotNull && col("__e") > col("__s"))
    val bounds = valid.select(col("__k"), col("__s").as("__t"),
        lit(1L).as("__d"))
      .unionByName(valid.select(col("__k"), col("__e").as("__t"),
        lit(-1L).as("__d")))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val running = bounds.withColumn("__r", sum(col("__d")).over(w))
    val peak = running.groupBy(col("__k")).agg(max(col("__r")).as("peak"))
    running.join(peak, "__k")
      .where(col("__r") === col("peak"))
      .groupBy(col("__k"))
      .agg(max(col("peak")).as("peak"), min(col("__t")).as("peak_at"))
      .join(valid.groupBy(col("__k")).agg(count(lit(1)).as("n_intervals")),
        "__k")
      .select(col("__k").as(keyCol), col("n_intervals"), col("peak"),
        col("peak_at"))
  }

  /**
   * Sliding-window trending top-k: the k most frequent items in every
   * OVERLAPPING time window (`windowDur` long, sliding every `slide`) —
   * the "what's trending this hour, updated every 15 minutes" panel.
   * Built on `window()`'s slide form, so each event expands to
   * windowDur/slide (window, item) rows that combine map-side
   * immediately; the rank runs per window over at most |item vocabulary|
   * rows — time-bounded and vocabulary-bounded, never corpus-bounded.
   * Ties break on the item ascending (the (count DESC, item) rule).
   */
  def trendingTopK(
      df: DataFrame,
      tsCol: String,
      itemCol: String,
      windowDur: String,
      slide: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .groupBy(window(col(tsCol), windowDur, slide), col(itemCol).as("item"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("start_us"),
        col("item"), col("n"))
    counts.withColumn("rank",
        row_number().over(Window.partitionBy(col("start_us"))
          .orderBy(desc("n"), asc("item"))).cast("int"))
      .where(col("rank") <= k)
      .select(col("start_us"), col("rank"), col("item"), col("n"))
  }

  /**
   * Interval-union coverage per key: the exact covered length of the
   * UNION of each key's [start, end) intervals — hours of audio actually
   * covered by overlapping segment transcripts, sensor uptime from
   * overlapping heartbeat leases, SCD validity audits. Overlaps must not
   * double-count, which a plain sum(end − start) gets wrong.
   *
   * The classic sweep, in two windows over PER-KEY rows: order by
   * (start, end); an interval opens a new block when its start lies past
   * the running max end of its predecessors; block ids are the running
   * sum of those flags; each block covers max(end) − min(start). All
   * integer arithmetic on the caller's units — replays bit-for-bit.
   * Invalid intervals (null bounds, end ≤ start) are excluded, counted in
   * `n_dropped`.
   *
   * Scale shape: one hash shuffle on the key, windows sort only within a
   * key (per-key interval counts are bounded in every real use — spans
   * per recording, leases per device — never corpus-scale), then two
   * compact aggregates. `covered_permille` = covered ÷ key span, the
   * "how much of this recording is transcribed" number.
   */
  def intervalCoverage(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol).as("__k"),
      col(startCol).cast("long").as("__s"),
      col(endCol).cast("long").as("__e"))
    val valid = base.where(col("__s").isNotNull && col("__e") > col("__s"))
    val dropped = base.groupBy(col("__k"))
      .agg(sum(when(col("__s").isNull || col("__e").isNull ||
        col("__e") <= col("__s"), 1L).otherwise(0L)).as("n_dropped"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__s"), col("__e"))
    val run = max(col("__e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = valid.withColumn("__nb",
      when(run.isNull || col("__s") > run, 1L).otherwise(0L))
    val blocks = flagged.withColumn("__blk",
        sum(col("__nb")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("__k"), col("__blk"))
      .agg(count(lit(1)).as("__c"), min(col("__s")).as("__ms"),
        max(col("__e")).as("__me"))
    blocks.groupBy(col("__k"))
      .agg(sum(col("__c")).as("n_intervals"),
        count(lit(1)).as("n_blocks"),
        sum(col("__me") - col("__ms")).as("covered"),
        (max(col("__me")) - min(col("__ms"))).as("__span"))
      .join(dropped, Seq("__k"), "right")
      .select(col("__k").as(keyCol),
        coalesce(col("n_intervals"), lit(0L)).as("n_intervals"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        col("n_dropped"),
        coalesce(col("covered"), lit(0L)).as("covered"),
        expr("coalesce(covered * 1000 div __span, 0)").as("covered_permille"))
  }

  /**
   * Strict sequential funnel: how many users reach each stage IN ORDER.
   * A user reaches stage k when an event of stage k's type occurs at or
   * after that user's earliest qualifying stage-(k−1) event — an
   * out-of-order event (a click before the first view) does not count,
   * which a naive per-type EXISTS would get wrong. One output row per
   * stage: index, name, users reached, and conversion vs the first stage
   * in integer permille.
   *
   * Scale shape: each stage is a filtered min-timestamp aggregate keyed by
   * user plus an equi-join to the previous stage's compact (user, ts)
   * table — every shuffle is on the user key, every joined row is two
   * columns wide, event payloads never move. Stage subplans nest (stage k
   * re-derives 1..k−1); for deep funnels over huge event logs, persist
   * intermediate stages — at the typical 3-5 stages the optimizer's
   * reused exchange keeps the cost linear in practice.
   */
  def funnel(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    require(stages.distinct.length == stages.length, "funnel stages must be distinct")
    var cur: DataFrame = null
    val stageCounts = stages.zipWithIndex.map { case (st, i) =>
      cur =
        if (i == 0) {
          df.filter(col(typeCol) === st)
            .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__t"))
        } else {
          val prev = cur.select(col("__u").as("__pu"), col("__t").as("__pt"))
          df.filter(col(typeCol) === st)
            .join(prev, col(userCol) === col("__pu"))
            .where(col(tsCol) >= col("__pt"))
            .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__t"))
        }
      cur.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }
    val out = stageCounts.reduce(_ unionByName _)
    val base = out.where(col("stage_idx") === 1)
      .select(col("n_users").as("__base"))
    out.crossJoin(broadcast(base))
      .withColumn("permille_of_first", expr("n_users * 1000 div __base"))
      .drop("__base")
  }

  /**
   * Event-time lateness profile — the number a WATERMARK is tuned from:
   * within each key's ARRIVAL order (`seqCol` — an ingestion sequence or
   * offset), how often does event time step backwards, and by at most
   * how much? `withWatermark(ts, X)` silently DROPS events later than X;
   * pick X below the observed `max_backstep_us` and that drop rate is
   * `inversion_permille` as a lower bound. One row: event count,
   * adjacent-pair inversions, the largest backward step in exact micros,
   * and the inversion rate in integer permille.
   *
   * Scale shape: one key shuffle feeding a streaming `lag` window (the
   * per-key scan is sorted-run, not materialized) and a final map-side-
   * partial global aggregate; timestamps reduce to 8-byte micros before
   * the window.
   */
  def latenessReport(
      df: DataFrame,
      keyCol: String,
      seqCol: String,
      tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u")).orderBy(col("__seq"))
    df.select(col(keyCol).as("__u"), col(seqCol).cast("long").as("__seq"),
        unix_micros(col(tsCol)).as("__ts"))
      .withColumn("__prev", lag(col("__ts"), 1).over(w))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__prev").isNotNull && col("__ts") < col("__prev"), 1L)
          .otherwise(0L)).as("inversions"),
        coalesce(max(when(col("__ts") < col("__prev"),
          col("__prev") - col("__ts"))), lit(0L)).as("max_backstep_us"))
      .withColumn("inversion_permille",
        expr("inversions * 1000 div n_events"))
  }

  /**
   * Rolling z-score anomaly detection over a keyed count series — the
   * ingest-monitoring primitive ("did this source's hourly volume jump
   * 3σ above its own recent history?") that pipelines run per source /
   * event type / shard before a bad feed poisons a training mix.
   *
   * Each bucket is judged against the TRAILING `window` buckets (current
   * excluded — a spike must not dilute its own baseline; ROWS semantics,
   * so missing buckets are skipped, not zero-filled). The z² test is
   * pure integer arithmetic — flag ⟺ (x·n − s1)²·10⁶ > T²·(n·s2 − s1²)·
   * with T in permille — no float mean/stddev anywhere, so engines agree
   * bit-for-bit (the q107 micro seam rule applied to a variance test;
   * quadratic terms in DECIMAL(38,0) so 100-TB-scale counts cannot
   * overflow). Zero-variance history flags ANY deviation; buckets with
   * fewer than `minHistory` prior points are never flagged (cold start).
   *
   * Input: one row per (key, bucket) with an integer `countCol`.
   * Output adds (history_n, mean_milli, is_anomaly, direction ∈
   * {-1,0,1}). Scale shape: one window sort per key partition — the
   * series per key is buckets, not events, so even a year of hourly
   * buckets is ~9k rows per key.
   */
  def rollingAnomalies(
      df: DataFrame,
      keyCol: String,
      bucketCol: String,
      countCol: String,
      window: Int = 24,
      zThresholdPermille: Long = 3000L,
      minHistory: Int = 6): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minHistory >= 2, s"minHistory must be >= 2, got $minHistory")
    require(zThresholdPermille > 0,
      s"zThresholdPermille must be > 0, got $zThresholdPermille")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(-window, -1)
    val x = col(countCol).cast("long")
    df
      .withColumn("history_n", count(x).over(w))
      .withColumn("__s1", coalesce(sum(x).over(w), lit(0L)))
      .withColumn("__s2", coalesce(
        sum((x * x).cast(org.apache.spark.sql.types.DecimalType(38, 0))).over(w),
        lit(0L).cast(org.apache.spark.sql.types.DecimalType(38, 0))))
      .withColumn("mean_milli",
        when(col("history_n") > 0, expr("(__s1 * 1000) div history_n")))
      .withColumn("__dev", x * col("history_n") - col("__s1"))
      .withColumn("__var_n2", // n·s2 − s1² in DECIMAL(38,0)
        expr("CAST(history_n AS DECIMAL(38,0)) * __s2 " +
          "- CAST(__s1 AS DECIMAL(38,0)) * CAST(__s1 AS DECIMAL(38,0))"))
      .withColumn("is_anomaly",
        when(col("history_n") < minHistory, lit(false))
          .when(col("__var_n2") === 0, col("__dev") =!= 0)
          .otherwise(
            expr("CAST(__dev AS DECIMAL(38,0)) * CAST(__dev AS DECIMAL(38,0)) " +
              s"* 1000000 > ${zThresholdPermille * zThresholdPermille} * __var_n2")))
      .withColumn("direction",
        when(!col("is_anomaly"), lit(0))
          .when(col("__dev") > 0, lit(1)).otherwise(lit(-1)))
      .drop("__s1", "__s2", "__dev", "__var_n2")
  }
}
