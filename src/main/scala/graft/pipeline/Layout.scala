package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data layout: interleave the bits of two scan
 * dimensions so that range-partitioning on ONE derived key co-locates
 * rows that are close in BOTH dimensions. The point at 100 TB: a table
 * laid out by `repartitionByRange(zvalue)` + per-file min/max statistics
 * (every columnar format keeps them) lets a two-dimensional box predicate
 * prune to O(perimeter) files, where a single-column sort prunes one
 * dimension and scans everything for the other — the Delta/Iceberg
 * OPTIMIZE ZORDER rationale, reproduced as plain Spark expressions.
 *
 * Everything is integer bit arithmetic (`shiftright`/`&`/`shiftleft`
 * sums — no UDF, codegen-friendly, and bit-for-bit replayable in any
 * engine with 64-bit ints), so the layout decision itself is
 * oracle-checkable: the per-bucket extent table IS the file-statistics
 * table a real lakehouse write would produce.
 */
object Layout {

  /**
   * Morton interleave of two already-bucketed non-negative dimensions
   * (each in [0, 2^bits)): bit i of x lands at position 2i, bit i of y
   * at 2i+1. 2·bits shift-mask-shift terms summed — constant-folded,
   * whole-stage-codegen'd, no branching.
   */
  def zValue2(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** `v` scaled into [0, 2^bits) given an inclusive max — integer
    * width-scaling (truncating `div`, never SQL's double `/`), the
    * bucketing a z-layout applies to raw keys. */
  def scaleToBits(v: Column, maxInclusive: Column, bits: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.Bridge.expression(
          v.cast("long") * lit(1L << bits)),
        org.apache.spark.sql.graft.Bridge.expression(
          maxInclusive.cast("long") + lit(1L)),
        evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))

  /**
   * The file-statistics table of a z-ordered write: bucket rows by
   * equal-width ranges of the z-value (`buckets` files), and report each
   * bucket's row count and per-dimension min/max extent — exactly what a
   * columnar footer would expose to a scan planner. Input dimensions must
   * already sit in [0, 2^bits); the operator REFUSES loudly otherwise
   * (one bounded 1-row aggregate — silent wraparound would corrupt the
   * curve).
   *
   * Output: (bucket, n_rows, x_min, x_max, y_min, y_max), one row per
   * non-empty bucket. The scale shape is one map-side projection + one
   * groupBy(bucket) — the extents of a 100 TB table are `buckets` rows.
   */
  def zOrderExtents(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 8,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val lim = 1L << bits
    val bounds = df.agg(
      min(col(xCol)).as("xlo"), max(col(xCol)).as("xhi"),
      min(col(yCol)).as("ylo"), max(col(yCol)).as("yhi")).head()
    require(!bounds.anyNull &&
      bounds.getAs[Number]("xlo").longValue() >= 0 &&
      bounds.getAs[Number]("ylo").longValue() >= 0 &&
      bounds.getAs[Number]("xhi").longValue() < lim &&
      bounds.getAs[Number]("yhi").longValue() < lim,
      s"zOrderExtents: dimensions must be non-null in [0, $lim); got " +
        s"x=[${bounds.get(0)}, ${bounds.get(1)}] y=[${bounds.get(2)}, " +
        s"${bounds.get(3)}] — scale with scaleToBits first")
    val zMax = lim * lim // exclusive: z in [0, 2^(2*bits))
    df.select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .withColumn("__z", zValue2(col("__x"), col("__y"), bits))
      .withColumn("bucket", expr(s"(__z * $buckets) div ${zMax}L"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("__x").as("x_min"), max("__x").as("x_max"),
        min("__y").as("y_min"), max("__y").as("y_max"))
  }

  /**
   * The scan-planning payoff of [[zOrderExtents]]: given a file-statistics
   * (extent) table and an inclusive box predicate, decide per file whether
   * its extents CAN contain matches — interval overlap on both dimensions,
   * exactly the footer-stats test a lakehouse scan planner runs — and
   * report one row: files/rows total vs scanned, and the scanned-row share
   * in exact permille. False positives are possible (extents overestimate
   * content), false negatives are not — pruning never loses a row, which
   * is why the decision needs only the `buckets`-row extent table, never
   * the data.
   *
   * This is the layout-comparison number: run it against the z-order
   * extents and against a single-column-sort layout's extents and the
   * permille pair IS the case for rewriting 100 TB z-ordered.
   */
  def pruneReport(
      extents: DataFrame,
      xLo: Long, xHi: Long,
      yLo: Long, yHi: Long): DataFrame = {
    require(xLo <= xHi && yLo <= yHi,
      s"empty box: x=[$xLo,$xHi] y=[$yLo,$yHi]")
    val scan = col("x_max") >= xLo && col("x_min") <= xHi &&
      col("y_max") >= yLo && col("y_min") <= yHi
    extents.agg(
        count(lit(1)).as("files_total"),
        sum(when(scan, 1L).otherwise(0L)).as("files_scanned"),
        sum(col("n_rows")).as("rows_total"),
        sum(when(scan, col("n_rows")).otherwise(0L)).as("rows_scanned"))
      .withColumn("scan_permille",
        expr("rows_scanned * 1000 div rows_total"))
  }
}
