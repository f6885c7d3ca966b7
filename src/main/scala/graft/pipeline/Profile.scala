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
