package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Shared optimizer-statistics probes for the operators that size their
 * parallelism or auto-tune from plan stats alone — NEVER an extra job (at
 * 100 TB a count() pass is a full scan). Callers layer their own
 * bytes-per-row model on top of [[boundedSizeInBytes]]: the right divisor
 * depends on what the relation's sizeInBytes measures (in-memory widths vs
 * compressed on-disk bytes), which only the call site knows.
 */
private[graft] object PlanStats {

  /** Exact row count when the optimized plan carries one. */
  def rowCount(df: DataFrame): Option[Long] =
    df.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong)

  /** Plan `sizeInBytes` when it is a real measurement — unknown relations
   *  report the huge `defaultSizeInBytes` sentinel, which must never be
   *  inverted into a row estimate. */
  def boundedSizeInBytes(df: DataFrame): Option[BigInt] = {
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size > 0 && size < (BigInt(1L) << 50)) Some(size) else None
  }

  /** Scale-adaptive scan spreading for CPU-heavy map pipelines (guide §2.5
   *  input skew): an unsplittable input (single parquet row group, gzip
   *  dump) yields fewer scan tasks than cores and serializes the expensive
   *  per-row work downstream. When a SCAN-SHAPED frame (no shuffle in the
   *  lineage — probing `.rdd` through a shuffle would execute its stages
   *  under AQE) supplies fewer splits than `parts`, one round-robin
   *  exchange of the (small, by construction) input unlocks full map
   *  parallelism; inputs that already carry ≥ `parts` splits pass through
   *  untouched, so at scale this is a no-op. Values are unchanged — only
   *  row placement. Use only where downstream per-row work dwarfs one pass
   *  over the input; for light maps the exchange costs more than the
   *  serialism it removes (measured both ways, round 8 and round 18). */
  def spreadScan(df: DataFrame, parts: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.{logical => l}
    val plan = df.queryExecution.optimizedPlan
    val hasShuffleUpstream = plan.exists {
      case _: l.Join | _: l.Aggregate | _: l.Window | _: l.Sort |
          _: l.RepartitionOperation | _: l.Distinct | _: l.Deduplicate => true
      case _: l.GlobalLimit | _: l.LocalLimit | _: l.Offset => true
      case _ => false
    }
    if (hasShuffleUpstream) df
    else if (df.rdd.getNumPartitions < parts) df.repartition(parts)
    else df
  }
}
