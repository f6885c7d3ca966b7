package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

/**
 * Temporal joins Spark's built-in operators don't express directly:
 *
 *  - [[asofJoin]] — each probe row matches the LATEST build row at or
 *    before its timestamp (per key). The naive formulations are a
 *    correctness-or-scale trap: an inequality theta-join plans as a
 *    broadcast-nested-loop (quadratic), and a "join then keep max ts"
 *    materializes every candidate pair before pruning. This
 *    implementation is the union-and-window form: tag both sides, union,
 *    ONE hash shuffle on the key, one per-key time-ordered scan in which
 *    `last(struct, ignoreNulls)` carries the most recent build ROW
 *    forward into each probe row. Volume through the shuffle is
 *    |probe| + |build| rows — no pair blow-up, no nested loop.
 *
 *  - [[asofJoinForward]] / [[asofJoinNearest]] — the other two shapes
 *    event pipelines ask for ("next event at or after", "closest event
 *    either way"), expressed THROUGH the backward machinery (forward =
 *    backward on negated timestamps; nearest = backward + forward, pick
 *    the closer). Both accept `bucketWidthMicros` to ride the skew-proof
 *    bucketed variant.
 *
 *  - [[rangeJoinByBucket]] — point-in-interval joins as an EQUI-join on
 *    a time bucket: intervals explode to the buckets they cover, points
 *    hash-join on their single containing bucket, and the residual
 *    lo <= pt <= hi filter runs post-join. Each qualifying pair meets in
 *    exactly one bucket (the point's), so no dedup pass is needed.
 *    Catalyst plans the naive inequality join as BroadcastNestedLoopJoin
 *    — fine when one side broadcasts, quadratic disaster otherwise;
 *    bucketing restores a shuffled hash join whose cost is linear in
 *    rows + interval-spans. Pick `bucketWidth` near the typical interval
 *    length: explode factor ≈ interval/width + 1, while a too-wide
 *    bucket inflates the residual-filtered candidate set.
 *
 * Whole-row semantics: the matched build row travels as ONE struct —
 * `matched_ts` and every `matched_<c>` always come from the SAME build
 * row, even when that row holds NULLs in some value columns (a struct
 * with NULL fields is itself non-null, so `last(..., ignoreNulls)`
 * carries it intact instead of reaching back to an older row per
 * column — the column-tearing hazard of per-column carries).
 *
 * NULL keys: equi-join convention — a NULL key never matches anything.
 * Build rows with any NULL key are dropped before the union (a window's
 * `partitionBy` would otherwise group NULL keys together and hand
 * NULL-key probes a match DuckDB's `ON c.k = v.k` would not produce);
 * NULL-key probe rows survive with null match columns, like any
 * unmatched left-join row.
 *
 * Scale notes (100 TB): both shapes shuffle compact key/ts/value rows
 * once and never move document payloads. asofJoin's per-key scan means a
 * single pathologically hot key serializes into one task — for that key
 * shape use [[asofJoinBucketed]]: pre-split by a coarse time bucket and
 * carry each bucket's closing build row forward (two windows:
 * bucket-local, then one tiny per-key pass over bucket summaries).
 * rangeJoinByBucket's explode is bounded and map-side; AQE handles
 * residual skew like any hash join.
 */
object Joins {

  private def tsAsLong(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }

  /** Drops build rows carrying a NULL in any join key — the documented
   *  equi-join convention (NULL matches nothing). */
  private def nonNullKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.where(keyCols.map(col(_).isNotNull).reduce(_ && _))

  /** The matched-row payload struct: (__f_ts, __f_<c>...) — one value
   *  whose fields all come from the same build row. */
  private def payloadType(build: DataFrame, buildValueCols: Seq[String]): StructType =
    StructType(StructField("__f_ts", LongType) +:
      buildValueCols.map(c => StructField(s"__f_$c", build.schema(c).dataType)))

  /**
   * As-of (backward) join. For every probe row, the build row with the
   * greatest `buildTsCol` <= the probe's `probeTsCol`, matched per equal
   * `keyCols`; probe rows with no qualifying build row keep nulls
   * (left-join semantics). Output = every probe column, plus
   * `matched_ts` and `matched_<c>` for each requested build value
   * column — all taken from the single matched build row.
   *
   * Ties: a build row and probe row at the SAME timestamp match
   * (inclusive, the ASOF `>=` convention). Among several build rows
   * tying on (key, ts), the one with the greatest md5 digest of its
   * value columns wins — an arbitrary but DETERMINISTIC total order, so
   * the join is a pure function of the input multisets (the same rule
   * that pins [[Packing]]'s duplicate-id order). With `toleranceMicros`,
   * matches older than the tolerance are nulled out — the stale-quote
   * guard of financial as-of joins.
   */
  def asofJoin(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      probeTsCol: String,
      buildTsCol: String,
      buildValueCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(buildValueCols.nonEmpty, "at least one build value column required")
    toleranceMicros.foreach(t =>
      require(t >= 0, s"toleranceMicros must be >= 0, got $t"))
    val probeCols = probe.columns.toSeq

    // Build rows sort BEFORE probe rows at equal ts (inclusive match);
    // equal-(key, ts) build rows order by their value digest — last wins.
    // The whole matched row rides ONE struct (__bv), so ts and values can
    // never tear apart.
    val buildSide = nonNullKeys(build, keyCols).select(
      keyCols.map(col) ++ Seq(
        tsAsLong(build, buildTsCol).as("__ts"),
        lit(0).as("__side"),
        md5(concat_ws("\u0001", buildValueCols.map(c => col(c).cast("string")): _*))
          .as("__tb"),
        lit(null).cast(probe.select(struct(probeCols.map(col): _*)).schema.head.dataType)
          .as("__probe"),
        struct(tsAsLong(build, buildTsCol).as("__f_ts") +:
          buildValueCols.map(c => col(c).as(s"__f_$c")): _*).as("__bv")): _*)
    val probeSide = probe.select(
      keyCols.map(col) ++ Seq(
        tsAsLong(probe, probeTsCol).as("__ts"),
        lit(1).as("__side"),
        lit("").as("__tb"),
        struct(probeCols.map(col): _*).as("__probe"),
        lit(null).cast(payloadType(build, buildValueCols)).as("__bv")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = buildSide.unionByName(probeSide)
      .select(col("__side"), col("__ts"), col("__probe"),
        last(col("__bv"), ignoreNulls = true).over(w).as("__m"))
      .where(col("__side") === 1)

    val fresh = toleranceMicros match {
      case Some(tol) =>
        col("__m").isNotNull && (col("__ts") - col("__m.__f_ts") <= tol)
      case None => col("__m").isNotNull
    }
    carried.select(
      probeCols.map(c => col(s"__probe.$c").as(c)) ++
        Seq(when(fresh, col("__m.__f_ts")).as("matched_ts")) ++
        buildValueCols.map(c => when(fresh, col(s"__m.__f_$c")).as(s"matched_$c")): _*)
  }

  /**
   * Skew-proof as-of join: identical semantics to [[asofJoin]] (the
   * equivalence is spec-pinned on randomized workloads), but the per-key
   * scan splits into TIME BUCKETS so a single hot key parallelizes
   * instead of serializing into one task's sort:
   *
   *  1. the union windows within (key, bucket) — each bucket's rows sort
   *     independently, so a key's work spreads over #buckets tasks;
   *  2. each bucket's CLOSING build row reduces to one summary row via a
   *     plain `max(struct(ts, digest, payload))` aggregate (lexicographic
   *     struct order IS the documented tie rule), and a second window
   *     over those summaries — |buckets| rows per key, not |rows| —
   *     computes every bucket's carry-in (the latest build row of any
   *     EARLIER bucket);
   *  3. probe rows left-join their bucket's carry-in and coalesce the
   *     WHOLE payload struct: in-bucket match wins, else the carry-in —
   *     never a per-column mix of the two.
   *
   * Pick `bucketWidthMicros` so a hot key's per-bucket row count fits a
   * task comfortably; the summary window stays tiny as long as
   * #buckets per key is moderate (a day of micros-stamped quotes at
   * 1-minute buckets is 1 440 summary rows).
   */
  def asofJoinBucketed(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      probeTsCol: String,
      buildTsCol: String,
      buildValueCols: Seq[String],
      bucketWidthMicros: Long,
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(buildValueCols.nonEmpty, "at least one build value column required")
    require(bucketWidthMicros >= 1,
      s"bucketWidthMicros must be >= 1, got $bucketWidthMicros")
    toleranceMicros.foreach(t =>
      require(t >= 0, s"toleranceMicros must be >= 0, got $t"))
    val probeCols = probe.columns.toSeq
    val bucketCol =
      expr(s"(__ts - pmod(__ts, ${bucketWidthMicros}L)) div ${bucketWidthMicros}L")

    val buildSide = nonNullKeys(build, keyCols).select(
      keyCols.map(col) ++ Seq(
        tsAsLong(build, buildTsCol).as("__ts"),
        lit(0).as("__side"),
        md5(concat_ws("\u0001", buildValueCols.map(c => col(c).cast("string")): _*))
          .as("__tb"),
        lit(null).cast(probe.select(struct(probeCols.map(col): _*)).schema.head.dataType)
          .as("__probe"),
        struct(tsAsLong(build, buildTsCol).as("__f_ts") +:
          buildValueCols.map(c => col(c).as(s"__f_$c")): _*).as("__bv")): _*)
    val probeSide = probe.select(
      keyCols.map(col) ++ Seq(
        tsAsLong(probe, probeTsCol).as("__ts"),
        lit(1).as("__side"),
        lit("").as("__tb"),
        struct(probeCols.map(col): _*).as("__probe"),
        lit(null).cast(payloadType(build, buildValueCols)).as("__bv")): _*)
    val tagged = buildSide.unionByName(probeSide).withColumn("__bucket", bucketCol)

    // Phase 1: in-bucket carry — the window partitions by (key, bucket);
    // probe rows hold a null payload, so last(..., ignoreNulls) skips them.
    val wLocal = Window.partitionBy((keyCols :+ "__bucket").map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = tagged
      .select(
        keyCols.map(col) ++
          Seq(col("__side"), col("__ts"), col("__bucket"), col("__probe"),
            last(col("__bv"), ignoreNulls = true).over(wLocal).as("__l")): _*)
      .where(col("__side") === 1)

    // Phase 2: per-(key, bucket) closing build row — ONE summary row per
    // bucket via max(struct(ts, digest, payload)): lexicographic struct
    // comparison applies exactly the (ts, digest) tie rule, no window
    // over the raw rows. Then the carry-in window runs over the compact
    // summaries only, strictly before the current bucket.
    val closings = buildSide.withColumn("__bucket", bucketCol)
      .groupBy((keyCols :+ "__bucket").map(col): _*)
      .agg(max(struct(col("__ts"), col("__tb"), col("__bv").as("__p"))).as("__close"))
      .select(keyCols.map(col) ++
        Seq(col("__bucket"), col("__close.__p").as("__c")): _*)
    val wCarry = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // Carry-ins must exist for every bucket that holds a PROBE row, not
    // just buckets with build rows — and each (key, bucket) must appear
    // EXACTLY ONCE in the carry window's input: a duplicate summary row
    // would tie on the ordering key and put the current bucket's own
    // closing inside the "strictly earlier" frame. Distinct buckets from
    // both sides, then a left join attaches the closings.
    val allBuckets = closings.select((keyCols :+ "__bucket").map(col): _*)
      .unionByName(probeSide.withColumn("__bucket", bucketCol)
        .select((keyCols :+ "__bucket").map(col): _*))
      .distinct()
    val carry = allBuckets
      .join(closings, keyCols :+ "__bucket", "left")
      .select(keyCols.map(col) ++
        Seq(col("__bucket"),
          last(col("__c"), ignoreNulls = true).over(wCarry).as("__p")): _*)

    // Phase 3: coalesce in-bucket and carry-in matches — whole struct,
    // so the matched row can't mix the two sources.
    val joined = local.join(carry, keyCols :+ "__bucket", "left")
      .withColumn("__m", coalesce(col("__l"), col("__p")))
    val fresh = toleranceMicros match {
      case Some(tol) =>
        col("__m").isNotNull && (col("__ts") - col("__m.__f_ts") <= tol)
      case None => col("__m").isNotNull
    }
    joined.select(
      probeCols.map(c => col(s"__probe.$c").as(c)) ++
        Seq(when(fresh, col("__m.__f_ts")).as("matched_ts")) ++
        buildValueCols.map(c => when(fresh, col(s"__m.__f_$c")).as(s"matched_$c")): _*)
  }

  /**
   * As-of FORWARD join: for every probe row, the build row with the
   * SMALLEST `buildTsCol` >= the probe's timestamp (inclusive), per key
   * — "the next event at or after". Expressed as the backward join on
   * NEGATED epoch-micros timestamps (min-future = max-past under
   * negation), so it inherits every backward property verbatim: whole-
   * row struct carry, the greatest-value-digest tie rule among equal-
   * (key, ts) build rows, NULL-key convention, left-join nulls, and —
   * with `bucketWidthMicros` — the skew-proof bucketed machinery.
   * `toleranceMicros` bounds how far in the FUTURE the match may be.
   * `matched_ts` is epoch micros of the matched (future) build row.
   */
  def asofJoinForward(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      probeTsCol: String,
      buildTsCol: String,
      buildValueCols: Seq[String],
      toleranceMicros: Option[Long] = None,
      bucketWidthMicros: Option[Long] = None): DataFrame = {
    val p2 = probe.withColumn("__neg_ts", -tsAsLong(probe, probeTsCol))
    val b2 = build.withColumn("__neg_ts", -tsAsLong(build, buildTsCol))
    val joined = bucketWidthMicros match {
      case Some(w) => asofJoinBucketed(p2, b2, keyCols, "__neg_ts", "__neg_ts",
        buildValueCols, w, toleranceMicros)
      case None => asofJoin(p2, b2, keyCols, "__neg_ts", "__neg_ts",
        buildValueCols, toleranceMicros)
    }
    joined.withColumn("matched_ts", -col("matched_ts")).drop("__neg_ts")
  }

  /**
   * As-of NEAREST join: the build row closest in time to each probe row,
   * either direction, per key — backward and forward runs composed, then
   * ONE boolean picks a side for ALL matched columns (no cross-side
   * tearing). Equal distances resolve BACKWARD (the "prefer what already
   * happened" convention). `toleranceMicros` bounds the distance both
   * ways; `bucketWidthMicros` routes both runs through the bucketed
   * machinery. Cost = two of the backward join's single-shuffle passes.
   */
  def asofJoinNearest(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      probeTsCol: String,
      buildTsCol: String,
      buildValueCols: Seq[String],
      toleranceMicros: Option[Long] = None,
      bucketWidthMicros: Option[Long] = None): DataFrame = {
    val probeCols = probe.columns.toSeq
    val backward = bucketWidthMicros match {
      case Some(w) => asofJoinBucketed(probe, build, keyCols, probeTsCol,
        buildTsCol, buildValueCols, w, toleranceMicros)
      case None => asofJoin(probe, build, keyCols, probeTsCol, buildTsCol,
        buildValueCols, toleranceMicros)
    }
    val renamed = ("matched_ts" -> "__bk_ts") +:
      buildValueCols.map(c => s"matched_$c" -> s"__bk_$c")
    val bwd = renamed.foldLeft(backward) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
    // The forward pass's probe is the backward OUTPUT (probe columns plus
    // the renamed backward match) — rows line up by construction, no
    // synthetic row id needed.
    val both = asofJoinForward(bwd, build, keyCols, probeTsCol, buildTsCol,
      buildValueCols, toleranceMicros, bucketWidthMicros)
    val pts = tsAsLong(both, probeTsCol)
    val useB = col("__bk_ts").isNotNull &&
      (col("matched_ts").isNull ||
        (pts - col("__bk_ts") <= col("matched_ts") - pts))
    both.select(
      probeCols.map(col) ++
        Seq(when(useB, col("__bk_ts")).otherwise(col("matched_ts")).as("matched_ts")) ++
        buildValueCols.map(c =>
          when(useB, col(s"__bk_$c")).otherwise(col(s"matched_$c"))
            .as(s"matched_$c")): _*)
  }

  /**
   * Point-in-interval range join via bucket equi-join. Returns the inner
   * join of `points` and `intervals` where
   * `loCol <= ptCol <= hiCol` (inclusive bounds), with every column of
   * both inputs. `ptCol`/`loCol`/`hiCol` must be numeric (cast
   * timestamps to epoch micros first — `unix_micros`); `extraKeyCols`
   * adds equality predicates (same names on both sides) that ride the
   * same hash join key.
   *
   * Malformed intervals (hi < lo, or null bounds) match nothing, like
   * the predicate itself. Floor division handles negative coordinates
   * correctly (Spark's `div`/`pmod` pair, not `/`+`%`).
   */
  def rangeJoinByBucket(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      extraKeyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    // Floor division in pure LONG arithmetic ((x - pmod) div w): a double
    // floor() would silently lose precision past 2^53 (epoch micros get
    // there in 2255), and bare `div` truncates toward zero on negatives.
    // The expr() only ever sees internal names and a numeric literal.
    def floorDiv(inner: String): Column =
      expr(s"($inner - pmod($inner, ${bucketWidth}L)) div ${bucketWidth}L")
    // sequence() of covered buckets: explode factor = span/width + 1.
    val expl = intervals
      .where(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(hiCol) >= col(loCol))
      .withColumn("__lo_l", col(loCol).cast("long"))
      .withColumn("__hi_l", col(hiCol).cast("long"))
      .withColumn("__bucket",
        explode(sequence(floorDiv("__lo_l"), floorDiv("__hi_l"))))
      .drop("__lo_l", "__hi_l")
    val pts = points
      .withColumn("__pt_l", col(ptCol).cast("long"))
      .withColumn("__bucket", floorDiv("__pt_l"))
      .drop("__pt_l")
    pts.join(expl, Seq("__bucket") ++ extraKeyCols)
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bucket")
  }

  /**
   * Interval-OVERLAP equi-join: pairs of [start, end) intervals (one from
   * each side, same key) that overlap — segment-alignment (which
   * transcript spans overlap which audio defects), shift/incident
   * correlation. The non-equi predicate `s1 < e2 AND s2 < e1` would plan
   * as a nested loop; decomposing BOTH sides onto fixed-width buckets
   * restores a shuffled hash join: a pair can only overlap inside a
   * bucket both touch, and each surviving pair is emitted EXACTLY ONCE —
   * by the bucket containing the overlap's own start (`greatest(s1, s2)`,
   * provably in both sides' bucket sets) — so no distinct pass over the
   * pair set is needed.
   *
   * Cost: explode factor = span/bucketWidth + 1 per interval; size the
   * width near the typical SHORTER side's span (same sizing rule as
   * [[rangeJoinByBucket]]). Invalid intervals (null bounds, end ≤ start)
   * drop. Returns (keys…, id_a, id_b, overlap_start, overlap_end).
   */
  def intervalOverlapJoin(
      a: DataFrame,
      b: DataFrame,
      keyCols: Seq[String],
      aIdCol: String, aStartCol: String, aEndCol: String,
      bIdCol: String, bStartCol: String, bEndCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    def floorDiv(inner: String): Column =
      expr(s"(($inner) - pmod(($inner), ${bucketWidth}L)) div ${bucketWidth}L")
    def prep(df: DataFrame, id: String, sc: String, ec: String,
        tag: String): DataFrame =
      df.select(keyCols.map(col) ++ Seq(col(id).as(s"id_$tag"),
          col(sc).cast("long").as(s"s_$tag"),
          col(ec).cast("long").as(s"e_$tag")): _*)
        .where(col(s"s_$tag").isNotNull && col(s"e_$tag") > col(s"s_$tag"))
        .withColumn("__bucket",
          explode(sequence(floorDiv(s"s_$tag"), floorDiv(s"e_$tag - 1"))))
    prep(a, aIdCol, aStartCol, aEndCol, "a")
      .join(prep(b, bIdCol, bStartCol, bEndCol, "b"),
        keyCols :+ "__bucket")
      .where(col("s_a") < col("e_b") && col("s_b") < col("e_a"))
      .where(col("__bucket") === floorDiv("greatest(s_a, s_b)"))
      .select(keyCols.map(col) ++ Seq(col("id_a"), col("id_b"),
        greatest(col("s_a"), col("s_b")).as("overlap_start"),
        least(col("e_a"), col("e_b")).as("overlap_end")): _*)
  }

  /**
   * Slowly-changing-dimension (SCD type 2) interval build from a change
   * feed: per key, ordered by (ts, tie), NO-OP changes (value identical
   * to the immediately preceding change, null-safe) collapse away, and
   * each surviving change opens a validity interval [valid_from,
   * valid_to) closed by the next surviving change — the last stays open
   * (valid_to null, is_current true). This is the dimension-table shape
   * behind every point-in-time join: the q134 as-of operators LOOK UP
   * the row valid at a fact's timestamp; this operator BUILDS the table
   * those lookups read.
   *
   * The tie column is required, not optional: a change feed can carry
   * equal timestamps (bulk backfills, coarse clocks), and without a
   * total order the collapsed sequence — hence the intervals — would be
   * run-dependent. Scale shape: two per-key windows over the CHANGE
   * feed, which is dimension-sized, not fact-sized; nothing else moves.
   */
  /**
   * Bloom-pruned inner equi-join — the runtime-filter pattern made
   * explicit: the SMALL side's key set compresses to an md5-derived
   * Bloom bitmap (k probe positions per key), the bitmap broadcasts as a
   * literal, and the LARGE side filters MAP-SIDE before its exchange.
   * The result is EXACTLY `large.join(small, key)`: a Bloom false
   * positive only lets a non-matching row reach the join (where it
   * drops); a matching row can never fail its own bits — which is what
   * makes the operator oracle-checkable against the plain join.
   *
   * The regime this exists for: the small side's PAYLOAD is too wide to
   * broadcast (so Spark plans a shuffled join and ships the whole large
   * side), but its KEY SET fits a bitmap — 10⁸ keys at 10 bits/key is a
   * 125 MB literal where the payload would be tens of GB. The shuffle
   * then carries only rows that can match: on selective joins that is
   * the large side's exchange cut by orders of magnitude. `mBits` sizes
   * the false-positive rate (~(1−e^(−kn/m))^k); oversize it — fp rows
   * cost a shuffle slot each, bitmap bits cost nothing comparable.
   *
   * Both key columns must be integral (the silent-null-cast refusal the
   * dedup operators use); NULL keys match nothing, the inner-join rule.
   */
  def bloomPrunedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      mBits: Int,
      k: Int = 3): DataFrame = {
    graft.pipeline.Dedup.requireIntegralId(large, largeKey, "bloomPrunedEquiJoin")
    graft.pipeline.Dedup.requireIntegralId(small, smallKey, "bloomPrunedEquiJoin")
    require(mBits >= 64 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k <= 4, s"k must be in [1, 4], got $k")
    def positions(c: Column): Seq[Column] = (0 until k).map { j =>
      graft.functions.TextHashFunctions.md5_hex_slice_long(
        c.cast("string"), 1 + 8 * j, 8) % mBits
    }
    val posRows = small
      .select(col(smallKey).as("__k")).where(col("__k").isNotNull)
      .select(explode(array(positions(col("__k")): _*)).as("p"))
      .distinct()
      .as(org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    val words = new Array[Long](mBits / 64)
    posRows.foreach(p => words((p >>> 6).toInt) |= 1L << (p & 63))
    val bitmap = typedlit(words.toSeq)
    val probe = positions(col(largeKey)).map { p =>
      // word index via shiftright, not `/ 64` — Spark's `/` on integers
      // is a DOUBLE divide; a shift stays integral and codegen-tight.
      (call_function("shiftright",
        element_at(bitmap,
          call_function("shiftright", p, lit(6)).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L))) === 1L
    }.reduce(_ && _)
    large.where(col(largeKey).isNotNull && probe)
      .join(small, col(largeKey) === col(smallKey))
  }

  def scd2Intervals(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String): DataFrame =
    scd2IntervalsSeq(df, keyCol, tsCol, tieCol, valueCol).drop("__seq")

  /** [[scd2Intervals]] plus the surviving change's per-key ordinal
    * (`__seq`) — the handle [[scd2Merge]] needs to identify the batch
    * HEAD unambiguously even among same-timestamp zero-length intervals,
    * where (valid_from, valid_to) alone cannot order. */
  private def scd2IntervalsSeq(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(keyCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .where(col("__rn") === 1 || !(col("__prev") <=> col(valueCol)))
      .withColumn("__seq", row_number().over(w))
      .withColumn("valid_to", lead(col(tsCol), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))))
      .select(col(keyCol), col(valueCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("__seq"))
  }

  /**
   * Incremental SCD2 maintenance — the nightly dimension merge: a stored
   * [[scd2Intervals]] table absorbs a NEW batch of changes without
   * re-reading the historical change feed. The batch sessionizes into
   * its own intervals; a batch HEAD equal to a key's stored current
   * value collapses (the no-op rule, applied across the boundary); the
   * stored current interval closes at the first surviving batch change;
   * history rows pass through untouched. Merged output == a from-scratch
   * rebuild over the full feed — the equality the gate checks.
   *
   * Contract (the standard append-only CDC watermark): every batch
   * change is strictly later than the key's stored history. A violating
   * batch REFUSES loudly (one compact aggregate probe) — out-of-order
   * backfill must rebuild from the full feed, silently merging it would
   * corrupt validity silently.
   *
   * The built-in probe's watermark is the stored table's SURVIVING rows
   * (max `valid_from` per key) — it cannot see feed rows that
   * [[scd2Intervals]] collapsed as no-ops. A batch change timestamped
   * after the last surviving `valid_from` but before a collapsed
   * trailing no-op passes the probe yet diverges from a full-feed
   * rebuild (the no-op would no longer be a no-op once the batch row
   * sorts before it). Callers whose feed can contain trailing no-ops
   * must persist the feed's true max ts per key and pass it as
   * `feedWatermark` (any frame with `keyCol` and `tsCol` columns, e.g.
   * the feed itself or a stored (key, max ts) sidecar) — the probe then
   * checks the batch against the FEED's history, closing the gap
   * exactly.
   *
   * Scale shape: batch-sized windows, one key-join of the batch against
   * the |keys|-row current slice, one key-join to close currents;
   * stored HISTORY rows stream through a union untouched — the whole
   * point: maintenance cost tracks the batch, not the dimension.
   */
  def scd2Merge(
      stored: DataFrame,
      batch: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      feedWatermark: Option[DataFrame] = None): DataFrame = {
    // Probe against the feed's true per-key max ts when the caller kept
    // one (exact — sees collapsed no-ops), else against the stored
    // table's surviving valid_from (the scaladoc caveat).
    val watermark = feedWatermark
      .map(_.groupBy(col(keyCol)).agg(max(col(tsCol)).as("__smax")))
      .getOrElse(stored
        .groupBy(col(keyCol)).agg(max(col("valid_from")).as("__smax")))
    val violations = watermark
      .join(batch.groupBy(col(keyCol)).agg(min(col(tsCol)).as("__bmin")),
        keyCol)
      .where(col("__bmin") <= col("__smax"))
      .limit(1).count()
    require(violations == 0L,
      "scd2Merge: the batch contains changes at or before some key's " +
        "stored history — rebuild from the full feed instead of merging")
    val bIv = scd2IntervalsSeq(batch, keyCol, tsCol, tieCol, valueCol)
    val cur = stored.where(col("is_current"))
      .select(col(keyCol).as("__k"), col(valueCol).as("__curv"))
    val bKeep = bIv
      .join(cur, col(keyCol) === col("__k"), "left")
      .where(!(col("__seq") === 1 && col("__k").isNotNull &&
        (col(valueCol) <=> col("__curv"))))
      .drop("__k", "__curv", "__seq")
    val firstNew = bKeep.groupBy(col(keyCol))
      .agg(min(col("valid_from")).as("__close"))
    val closedCurrent = stored.where(col("is_current"))
      .join(firstNew, Seq(keyCol), "left")
      .select(col(keyCol), col(valueCol), col("valid_from"),
        coalesce(col("__close"), col("valid_to")).as("valid_to"),
        col("__close").isNull.as("is_current"))
    stored.where(!col("is_current"))
      .unionByName(closedCurrent)
      .unionByName(bKeep)
  }
}
