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
}
