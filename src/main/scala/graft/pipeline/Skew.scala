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
}
