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
    val perCol: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), perCol: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `nn_$c`, `nd_$c`, `mn_$c`, `mx_$c`"
    }.mkString(", ")
    row.select(col("n_rows"),
        expr(s"stack(${cols.length}, $stackArgs) AS " +
          "(cname, n_nonnull, n_distinct, min_value, max_value)"))
      .select(col("cname").as("col_name"),
        col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"),
        col("min_value"),
        col("max_value"))
  }
}
