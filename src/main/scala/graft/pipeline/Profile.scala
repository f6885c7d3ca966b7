package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One-pass table profiling: the data-platform health panel (row counts,
 * nulls, exact distincts, min/max per column) computed in ONE aggregate
 * over ONE scan — at 100 TB a per-column loop of jobs is N full scans of
 * the table, the classic profiler mistake. Min/max render as strings
 * AFTER aggregating on the native type, so ordering is the column's own
 * (numeric, temporal), not lexicographic.
 *
 * Plan shape: Spark evaluates the N exact `countDistinct`s in a single
 * pass via an Expand (×N map-side rows feeding partial aggregates — CPU,
 * not I/O, and no extra scan); the exchange carries only the partial
 * aggregate state. For very wide tables where even map-side expansion
 * hurts, swap the distincts for `approx_count_distinct` — the plan keeps
 * its single-scan shape and drops the Expand.
 */
object Profile {

  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    // Internal aggregate names are INDEX-based and the unpivot is pure
    // Column API (explode of an array of structs — same Expand-free plan
    // shape as stack()): a user column named `a"b` or `a``b` can never
    // break a generated SQL parse because no user name is ever
    // interpolated into SQL text.
    val perCol: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"__nn_$i"),
        countDistinct(col(c)).as(s"__nd_$i"),
        min(col(c)).cast("string").as(s"__mn_$i"),
        max(col(c)).cast("string").as(s"__mx_$i"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), perCol: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("cname"),
        col(s"__nn_$i").as("n_nonnull"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__mn_$i").as("min_value"),
        col(s"__mx_$i").as("max_value"))
    }
    row.select(col("n_rows"), explode(array(entries: _*)).as("__p"))
      .select(col("__p.cname").as("col_name"),
        col("n_rows"),
        (col("n_rows") - col("__p.n_nonnull")).as("n_nulls"),
        col("__p.n_distinct").as("n_distinct"),
        col("__p.min_value").as("min_value"),
        col("__p.max_value").as("max_value"))
  }

  /**
   * Per-group winsorization — the feature-prep TRANSFORM beside
   * [[madOutlierReport]]'s flags: values clip to the group's
   * [loPermille, hiPermille] histogram-rule quantiles (the q73/q112
   * type-1 rule, no float interpolation), so one glitched sensor value
   * can't stretch a downstream normalization. Exact integers end to
   * end: micro quantization, histogram cuts, integer clamp — replays
   * bit-for-bit.
   *
   * Scale shape: the cuts come from a (key, value)-histogram window
   * (one row per DISTINCT value); the per-row pass is one broadcast
   * join against the |keys|-row cut table. NULL values are excluded
   * (nothing to clamp — the madOutlierReport convention).
   */
  def winsorizeReport(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      valueCol: String,
      loPermille: Int = 50,
      hiPermille: Int = 950): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(loPermille > 0 && hiPermille <= 1000 && loPermille < hiPermille,
      s"need 0 < lo < hi <= 1000, got ($loPermille, $hiPermille)")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(keyCols.map(col) :+ col(idCol).as("__id") :+
        round(col(valueCol).cast("double") * lit(1000000.0)).cast("long")
          .as("__v"): _*)
      .where(col("__v").isNotNull)
    val counts = base.groupBy((keyCols :+ "__v").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Window.partitionBy(keyCols.map(col): _*)
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(n))
    def cut(p: Int, out: String): DataFrame =
      cum.where(col("__cum") >= expr(s"($p * __n + 999) div 1000"))
        .groupBy(keyCols.map(col): _*).agg(min(col("__v")).as(out))
    base.join(broadcast(cut(loPermille, "lo_micro")), keyCols)
      .join(broadcast(cut(hiPermille, "hi_micro")), keyCols)
      .select(keyCols.map(col) ++ Seq(
        col("__id").as(idCol),
        col("__v").as("value_micro"),
        col("lo_micro"), col("hi_micro"),
        greatest(col("lo_micro"), least(col("hi_micro"), col("__v")))
          .as("clipped_micro")): _*)
  }

  /**
   * Per-group equal-population quantile binning — the feature
   * DISCRETIZER ([[psiDriftReport]]'s reference-binning step exposed
   * standalone): each row gets the bin index of its value among `bins`
   * equal-population buckets cut by the group's own histogram-rule
   * quantiles (the q73/q112 rule, no float interpolation). Exact
   * integers end to end — micro quantization, integer cut rule, bin =
   * count of cuts strictly below — so assignments replay bit-for-bit
   * on any engine, which float-interpolated discretizers never do.
   * NULL values are excluded.
   *
   * Scale shape: cuts come from a (key, value)-histogram window (one
   * row per DISTINCT value); the per-row pass is one broadcast join
   * against the |keys|-row cuts table — same plan as the winsorize/PSI
   * family.
   */
  def quantileBins(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      valueCol: String,
      bins: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    import org.apache.spark.sql.expressions.Window
    val ks = keyCols.map(col)
    val base = df.select(ks :+ col(idCol).as("__id") :+
        round(col(valueCol).cast("double") * lit(1000000.0)).cast("long")
          .as("__v"): _*)
      .where(col("__v").isNotNull)
    val counts = base.groupBy(ks :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(ks: _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Window.partitionBy(ks: _*)
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(n))
    val ps = (1 until bins).map(i => i * 1000 / bins).distinct
    val pDf = df.sparkSession.createDataFrame(ps.map(p => Tuple1(p.toLong)))
      .toDF("__p")
    val cuts = cum.crossJoin(broadcast(pDf))
      .filter(col("__cum") >= expr("(__p * __n + 999) div 1000"))
      .groupBy(ks :+ col("__p"): _*).agg(min(col("__v")).as("__cut"))
      .groupBy(ks: _*).agg(sort_array(collect_list(col("__cut"))).as("__cuts"))
    base.join(broadcast(cuts), keyCols)
      .select(ks ++ Seq(col("__id").as(idCol),
        col("__v").as("value_micro"),
        size(filter(col("__cuts"), c => col("__v") > c)).as("bin")): _*)
  }

  /**
   * Population stability index (PSI) between two corpus slices — the
   * standard tabular drift gate ("did this column's distribution move
   * between snapshots"), per group: bin the REFERENCE slice (a) into
   * `bins` equal-population bins by its own histogram-rule quantile
   * cuts (the q73/q112 rule — no float interpolation), count both
   * slices into those bins with +1 Laplace smoothing (an empty bin on
   * either side stays finite and deterministic instead of epsilon-
   * patched), and sum (p−q)·ln(p/q).
   *
   * Exactness: values quantize ONCE to integer micro; the per-bin ln
   * ratio is computed on the exact cross-multiplied integers
   * pn = (na+1)(NB+bins), qn = (nb+1)(NA+bins) and rounded ONCE to
   * micro-nats (the q107 seam); terms are (pn−qn)·lnm in DECIMAL(38,0);
   * the final PSI is one truncating division by the common denominator
   * (NA+bins)(NB+bins) — bit-for-bit replayable, and rounding can never
   * flip a term's sign (pn>qn ⟺ ln>0), so PSI stays ≥ 0.
   *
   * Groups absent from the reference slice are omitted (no reference
   * bins — nothing to compare against). Scale shape: quantile cuts come
   * from a (key, value)-histogram window (one row per DISTINCT value);
   * the per-row pass is one broadcast join against the |keys|-row cuts
   * table plus a (key, bin) count with map-side partials; the PSI
   * aggregate sees bins·|keys| rows.
   */
  def psiDriftReport(
      a: DataFrame,
      b: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      bins: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    import org.apache.spark.sql.expressions.Window
    val ks = keyCols.map(col)
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(ks :+
          round(col(valueCol).cast("double") * lit(1000000.0)).cast("long")
            .as("__v"): _*)
        .where(col("__v").isNotNull)
        .withColumn("__t", lit(tag))
    val both = side(a, 0).unionByName(side(b, 1))
    val counts = both.where(col("__t") === 0)
      .groupBy(ks :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(ks: _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Window.partitionBy(ks: _*)
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(n))
    val ps = (1 until bins).map(i => i * 1000 / bins).distinct
    val pDf = a.sparkSession.createDataFrame(ps.map(p => Tuple1(p.toLong)))
      .toDF("__p")
    val cuts = cum.crossJoin(broadcast(pDf))
      .filter(col("__cum") >= expr("(__p * __n + 999) div 1000"))
      .groupBy(ks :+ col("__p"): _*).agg(min(col("__v")).as("__cut"))
      .groupBy(ks: _*).agg(sort_array(collect_list(col("__cut"))).as("__cuts"))
    val binned = both.join(broadcast(cuts), keyCols)
      .withColumn("__bin", size(filter(col("__cuts"), c => col("__v") > c)))
    val binCounts = binned.groupBy(ks :+ col("__bin"): _*)
      .agg(sum(when(col("__t") === 0, 1L).otherwise(0L)).as("__na"),
        sum(when(col("__t") === 1, 1L).otherwise(0L)).as("__nb"))
    val frame = cuts.select(ks: _*)
      .withColumn("__bin", explode(sequence(lit(0), lit(bins - 1))))
    val filled = frame.join(binCounts, keyCols :+ "__bin", "left")
      .select(ks ++ Seq(col("__bin"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb")): _*)
    val totals = filled.groupBy(ks: _*)
      .agg(sum(col("__na")).as("__ta"), sum(col("__nb")).as("__tb"))
    filled.join(totals, keyCols)
      .withColumn("__pn",
        (col("__na") + 1).cast("decimal(38,0)") * (col("__tb") + bins))
      .withColumn("__qn",
        (col("__nb") + 1).cast("decimal(38,0)") * (col("__ta") + bins))
      .withColumn("__lnm", expr(
        "CAST(round(ln(CAST(__pn AS DOUBLE) / CAST(__qn AS DOUBLE)) * 1e6, 0) AS BIGINT)"))
      .withColumn("__term", (col("__pn") - col("__qn")) * col("__lnm"))
      .groupBy(ks: _*)
      .agg(max(col("__ta")).as("n_a"), max(col("__tb")).as("n_b"),
        sum(col("__term")).as("__s"))
      .withColumn("psi_micro", expr(
        s"CAST(__s div (CAST(n_a + $bins AS DECIMAL(38,0)) " +
          s"* CAST(n_b + $bins AS DECIMAL(38,0))) AS BIGINT)"))
      .select(ks ++ Seq(col("n_a"), col("n_b"), col("psi_micro")): _*)
  }

  /**
   * Foreign-key integrity check — the cross-table half of profiling
   * ("every lineitem names a real order"), run BEFORE a join silently
   * drops orphans or a left join silently fabricates NULLs. One row:
   * child row count, NULL-key rows, orphan rows (non-null keys absent
   * from the parent), and distinct orphan keys.
   *
   * Scale shape: the parent reduces to its DISTINCT key set (map-side
   * partial) and the orphan check is one anti-join on the compact key —
   * child payloads never move, and there is no driver-side set. Both
   * keys must be integral (the silent-null-cast refusal the dedup
   * operators use).
   */
  /**
   * Robust per-group outlier flags by median/MAD — the numeric-metadata
   * screen (corrupt durations, impossible byte counts, sensor glitches)
   * where mean/stddev would let one huge outlier inflate its own
   * threshold and mask itself. Each value is flagged when
   * |x − median| > sigmas · 1.4826 · MAD (1.4826 scales MAD to σ under
   * normality).
   *
   * Exactness: values quantize ONCE to integer micro units (the q138
   * seam), the median is the q73/q112 histogram rule (smallest value
   * with cumulative count ≥ ⌈n/2⌉ — a type-1 quantile, no float
   * interpolation), the MAD is the same rule over |x − median|, and the
   * flag is the cross-multiplied integer inequality
   * dev·10000 > mad·sigmas·14826 — no float mean/stddev anywhere, so
   * flags replay bit-for-bit. A MAD of 0 (over half the group identical)
   * flags ANY deviation — the strictest reading, documented rather than
   * patched with an epsilon.
   *
   * Scale shape: both medians come from (key, value)-histogram windows —
   * map-side combined counts, windows see one row per DISTINCT value,
   * never per input row; the per-row pass is two compact key-joins (AQE
   * broadcasts the |keys|-row median tables). NULL values are excluded
   * (nothing to test).
   */
  def madOutlierReport(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      valueCol: String,
      sigmas: Int = 3): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(sigmas > 0, s"sigmas must be positive, got $sigmas")
    import org.apache.spark.sql.expressions.Window
    def histMedian(in: DataFrame, vCol: String, out: String): DataFrame = {
      val counts = in.groupBy((keyCols :+ vCol).map(col): _*)
        .agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(keyCols.map(col): _*).orderBy(vCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val n = Window.partitionBy(keyCols.map(col): _*)
      counts.withColumn("__cum", sum(col("__c")).over(w))
        .withColumn("__n", sum(col("__c")).over(n))
        .where(col("__cum") >= expr("(500 * __n + 999) div 1000"))
        .groupBy(keyCols.map(col): _*)
        .agg(min(col(vCol)).as(out))
    }
    val base = df.select(keyCols.map(col) :+ col(idCol).as("__id") :+
        round(col(valueCol).cast("double") * lit(1000000.0)).cast("long")
          .as("__v"): _*)
      .where(col("__v").isNotNull)
    val med = histMedian(base, "__v", "med_micro")
    val withMed = base.join(med, keyCols)
      .withColumn("__dev", abs(col("__v") - col("med_micro")))
    val mad = histMedian(withMed, "__dev", "mad_micro")
    withMed.join(mad, keyCols)
      .select(keyCols.map(col) ++ Seq(
        col("__id").as(idCol),
        col("__v").as("value_micro"),
        col("med_micro"),
        col("mad_micro"),
        (col("__dev") * 10000L >
          col("mad_micro") * (sigmas * 14826L)).as("is_outlier")): _*)
  }

  /**
   * Theil–Sen robust trend per key: the MEDIAN of all pairwise slopes —
   * the trend read that one glitched day cannot bend, where least
   * squares follows the outlier (the robust-statistics sibling of
   * [[madOutlierReport]], for the time axis). Input points are
   * (key, t, value); value quantizes ONCE to integer micro; each pair's
   * slope is the exact truncating `((v2−v1)·1000) div (t2−t1)` (milli-
   * micro per t-unit — the ×1000 keeps resolution through the integer
   * div); the median is the q73/q112 histogram rule over slope values.
   * Everything replays bit-for-bit.
   *
   * Scale shape: the pair stage is a per-key self-join — O(n²) in the
   * key's POINT COUNT by construction (the estimator is defined on all
   * pairs). This is for AGGREGATED series (daily/hourly buckets:
   * 30–720 points → 10³–10⁵ pairs per key), never raw events; the
   * operator REFUSES keys beyond `maxPoints` loudly rather than
   * quietly running a quadratic on corpus-scale input.
   */
  def theilSenTrend(
      df: DataFrame,
      keyCols: Seq[String],
      tCol: String,
      valueCol: String,
      maxPoints: Int = 10000): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(keyCols.map(col) :+ col(tCol).cast("long").as("__t") :+
        round(col(valueCol).cast("double") * lit(1000000.0)).cast("long")
          .as("__v"): _*)
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val sizes = base.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
    val tooBig = sizes.where(col("__n") > maxPoints).limit(1).collect()
    require(tooBig.isEmpty,
      s"theilSenTrend: a key has more than $maxPoints points — aggregate " +
        "the series into buckets first; all-pairs on raw events is the " +
        "quadratic this refusal exists to stop")
    val l = base.select(keyCols.map(col) :+ col("__t").as("__t1") :+
      col("__v").as("__v1"): _*)
    val r = base.select(keyCols.map(col) :+ col("__t").as("__t2") :+
      col("__v").as("__v2"): _*)
    val slopes = l.join(r, keyCols).where(col("__t1") < col("__t2"))
      .select(keyCols.map(col) :+
        expr("((__v2 - __v1) * 1000) div (__t2 - __t1)").as("__s"): _*)
    val counts = slopes.groupBy((keyCols :+ "__s").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Window.partitionBy(keyCols.map(col): _*)
    counts.withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__np", sum(col("__c")).over(n))
      .where(col("__cum") >= expr("(500 * __np + 999) div 1000"))
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("__s")).as("slope_milli_micro"),
        max(col("__np")).as("n_pairs"))
  }

  /**
   * Exact mutual information between two categorical columns — the
   * "does this feature carry signal about that label" number, and the
   * redundancy screen before adding a dimension to a report. Same
   * integer discipline as the PMI/JS family: one ln per DISTINCT
   * (a, b) cell, computed on the exact integer ratio n_ab·N/(n_a·n_b)
   * and rounded ONCE to micro-nats; the weighted sum n_ab·lnm runs in
   * DECIMAL(38,0); one truncating division by N at the end. MI ≥ 0 up
   * to the per-cell rounding (each term's sign matches its exact
   * counterpart: lnm flips sign only with the ratio). NULL categories
   * count as categories (absence is information).
   *
   * Scale shape: three map-side-combined count aggregates (cells,
   * marginals) joined on the |cells|-row table; nothing corpus-sized
   * past the first aggregate.
   */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(
      coalesce(col(aCol).cast("string"), lit("<NULL>")).as("__a"),
      coalesce(col(bCol).cast("string"), lit("<NULL>")).as("__b"))
    val cells = base.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__nab"))
    val ma = base.groupBy(col("__a")).agg(count(lit(1)).as("__na"))
    val mb = base.groupBy(col("__b")).agg(count(lit(1)).as("__nb"))
    val tot = base.agg(count(lit(1)).as("__N"))
    cells.join(ma, "__a").join(mb, "__b").crossJoin(broadcast(tot))
      .withColumn("__lnm", expr(
        "CAST(round(ln((CAST(__nab AS DOUBLE) * CAST(__N AS DOUBLE)) / " +
          "(CAST(__na AS DOUBLE) * CAST(__nb AS DOUBLE))) * 1e6, 0) AS BIGINT)"))
      .agg(max(col("__N")).as("n_rows"),
        count(lit(1)).as("n_cells"),
        sum(col("__nab").cast("decimal(38,0)") * col("__lnm")).as("__s"))
      .withColumn("mi_micro",
        expr("CAST(__s div CAST(n_rows AS DECIMAL(38,0)) AS BIGINT)"))
      .select(col("n_rows"), col("n_cells"), col("mi_micro"))
  }

  /**
   * Keyed snapshot diff — the table-to-table change report (replication
   * audit, pre-merge review): rows ADDED, REMOVED, or CHANGED between
   * two snapshots by key, with the changed column names spelled out.
   * Unchanged rows are omitted (at 100 TB they are the table). One full
   * outer join on the key; per-column null-safe comparison; the column
   * list is a map-side concat. Keys must be unique per side — duplicate
   * keys make "the row changed" ill-posed; the requirement is the
   * caller's (it holds for any primary-keyed snapshot).
   */
  def snapshotDiff(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one compare column required")
    val al = a.select(col(keyCol).as("__k") +:
      cols.map(c => col(c).as(s"__a_$c")): _*)
    val bl = b.select(col(keyCol).as("__bk") +:
      cols.map(c => col(c).as(s"__b_$c")): _*)
    val joined = al.join(bl, col("__k") === col("__bk"), "full_outer")
    val changed = concat_ws(",", cols.map(c =>
      when(!(col(s"__a_$c") <=> col(s"__b_$c")), lit(c))): _*)
    joined.select(
        coalesce(col("__k"), col("__bk")).as(keyCol),
        when(col("__bk").isNull, lit("removed"))
          .when(col("__k").isNull, lit("added"))
          .when(changed =!= "", lit("changed")).as("status"),
        when(col("__k").isNotNull && col("__bk").isNotNull, changed)
          .otherwise(lit("")).as("changed_cols"))
      .where(col("status").isNotNull)
  }

  /**
   * Order-independent table checksum — the replication/migration
   * verifier: per-row 60-bit md5 digest over the canonicalized column
   * tuple, folded three independent ways (COUNT, XOR, SUM mod 2⁶¹−1) so
   * a collision in one fold is caught by the others. Comparing two
   * 100-TB replicas costs one scan each and three numbers over the wire;
   * any partitioning, file layout, or row order produces the same
   * triple.
   *
   * Canonicalization is explicit: every column casts to string and NULL
   * becomes a sentinel BEFORE concat — `concat_ws` silently drops nulls,
   * which would checksum ('a', NULL, 'b') equal to ('a', 'b'). The
   * separator guards column-boundary ambiguity for values that don't
   * contain it; pick columns accordingly or pre-escape.
   */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    val canon = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("<NULL>"))): _*)
    val digest =
      graft.functions.TextHashFunctions.md5_hex_slice_long(canon, 1, 15)
    df.select(digest.as("__d"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(expr("bit_xor(__d)"), lit(0L)).as("xor_digest"),
        expr("CAST(coalesce(sum(CAST(__d AS DECIMAL(38,0))), 0) " +
          "% 2305843009213693951 AS BIGINT)").as("sum_digest_mod"))
  }

  def fkIntegrityReport(
      child: DataFrame,
      parent: DataFrame,
      childKey: String,
      parentKey: String): DataFrame = {
    Dedup.requireIntegralId(parent, parentKey, "fkIntegrityReport")
    Dedup.requireIntegralId(child, childKey, "fkIntegrityReport")
    val ck = child.select(col(childKey).cast("long").as("__k"))
    val pk = parent.select(col(parentKey).cast("long").as("__pk"))
      .where(col("__pk").isNotNull).distinct()
    val base = ck.agg(count(lit(1)).as("n_rows"),
      sum(when(col("__k").isNull, 1L).otherwise(0L)).as("null_keys"))
    val orphans = ck.where(col("__k").isNotNull)
      .join(pk, col("__k") === col("__pk"), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("orphan_rows"),
        coalesce(countDistinct(col("__k")), lit(0L)).as("orphan_keys"))
    broadcast(base).crossJoin(broadcast(orphans))
  }

  /**
   * k-anonymity / l-diversity audit (Sweeney, 2002; Machanavajjhala et
   * al., 2007) — the privacy gate a training-data release runs before
   * shipping user-derived records: group rows by the quasi-identifier
   * columns and report, per equivalence class, its size and the number
   * of distinct sensitive values, with violation flags for `class_size
   * < k` (re-identification risk) and `distinct_sensitive < l`
   * (attribute-disclosure risk). Suppression/generalization decisions
   * key off this table; `violates_k`/`violates_l` are INT 0/1 so
   * downstream risk totals are plain sums.
   *
   * One aggregation over one scan: shuffle on the quasi keys with
   * map-side combine; the exact `countDistinct` rides the same exchange
   * (one Expand, no extra scan — the [[tableProfile]] plan shape). At
   * 100 TB the output is one row per equivalence CLASS, not per record.
   */
  def kAnonymityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .withColumn("violates_k",
        when(col("class_size") < k, lit(1)).otherwise(lit(0)))
      .withColumn("violates_l",
        when(col("distinct_sensitive") < l, lit(1)).otherwise(lit(0)))
  }

  /**
   * Deterministic keyed pseudonymization: replaces an identifier with
   * `md5(salt || '|' || value)` — joinability across tables that share
   * the salt survives, the raw identifier does not travel. Pure
   * map-side Column (codegen, zero shuffle). Not encryption: treat the
   * salt as a secret and rotate it per release.
   */
  def pseudonymize(c: Column, salt: String): Column =
    md5(concat(lit(salt + "|"), c.cast("string")))
}
