package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Explicit skew tooling for the joins AQE cannot fix: AQE's skew-join
 * splitter only rescues SORT-MERGE joins whose skewed side can be
 * sub-split at shuffle-block granularity; a hot build key in a broadcast-
 * ineligible hash join, or a key so hot one task still drowns after
 * splitting, needs SALTING — spread the hot side over `salt` synthetic
 * sub-keys and replicate the other side across all of them, so the hot
 * key's rows land on `salt` tasks instead of one.
 */
object Skew {

  /**
   * Inner equi-join with a salted key: `left` (the LARGE, possibly skewed
   * side) gets a deterministic per-row salt derived from `leftIdCol`
   * (xxhash64 — layout- and run-independent, so the plan is reproducible);
   * `right` (the smaller side, but too big or too hot to broadcast)
   * replicates each row across all `salt` sub-keys. The join result is
   * EXACTLY the plain `left.join(right, key)` — salting changes the
   * partitioning arithmetic, never the semantics — which is what makes the
   * operator oracle-checkable against the unsalted join.
   *
   * Cost model: right side inflates ×salt through its exchange, in return
   * for the hot key spreading over `salt` reducers. Worth it when
   * `max_key_rows / salt` still dominates the replicated-right cost —
   * i.e. genuine power-law key skew, the common case for per-domain or
   * per-language joins in a web corpus.
   */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftIdCol: String,
      salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(leftIdCol)), lit(salt.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(replicatedRight, Seq(keyCol, "__salt")).drop("__salt")
  }

  /**
   * Key-concentration diagnostic — the "will this groupBy/join skew?"
   * number to read BEFORE picking a salt factor or a partitioning:
   * one row with the total, distinct-key count, the hottest key's share,
   * the top-10 keys' share, and the hottest key's multiple of the mean
   * (all exact integer permille). `max_over_mean_permille` IS the
   * speedup ceiling a perfectly balanced plan leaves on the table: a
   * key at 40× the mean caps a 64-way shuffle at ~40× one task's work.
   *
   * Scale shape: one key aggregate whose partial counts collapse
   * map-side; everything after runs on the |keys|-row count table (the
   * top-10 is a bounded TakeOrdered, ties by key ascending — never a
   * full sort). Null keys are excluded (they route to one partition but
   * most writers drop or coalesce them; count them separately if they
   * matter).
   */
  def keyConcentrationReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.select(col(keyCol).cast("string").as("__k"))
      .where(col("__k").isNotNull)
      .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(eager = false) // feeds the totals AND the top-10
    val totals = counts.agg(sum(col("__c")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("__c")).as("__max"))
    val top = counts.orderBy(desc("__c"), asc("__k")).limit(10)
      .agg(sum(col("__c")).as("__topsum"))
    broadcast(totals).crossJoin(broadcast(top))
      .select(col("n_rows"), col("n_keys"),
        expr("__max * 1000 div n_rows").as("top1_permille"),
        expr("__topsum * 1000 div n_rows").as("top10_permille"),
        // The product runs in DECIMAL(38,0) (the rollingAnomalies/psi
        // convention): max_count × n_keys × 1000 passes 2^63 well before
        // 100-TB key spaces do, and int64 would wrap silently under
        // LEGACY eval while the oracle's HUGEINT keeps going.
        expr("CAST(CAST(__max AS DECIMAL(38,0)) * n_keys * 1000 div n_rows" +
          " AS BIGINT)").as("max_over_mean_permille"))
  }
}
