package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Blocking + scoring record linkage: match a dirty feed (OCR'd invoices,
 * crawled product listings, user-typed entities) against a canonical
 * catalog. The classic two-stage shape (Fellegi–Sunter lineage, the
 * Dedoop/record-linkage-survey architecture):
 *
 *   1. BLOCK — join only within a cheap equality key (brand, zip,
 *      phonetic code…). This is what makes linkage survive 100 TB: the
 *      all-pairs comparison space |dirty|·|catalog| never materializes;
 *      each block's candidate set is bounded by the block's catalog side,
 *      and the join is an ordinary hash equi-join on the blocking key.
 *   2. SCORE — exact Levenshtein edit distance on the name within the
 *      block (`functions.levenshtein`, codegen'd — identical algorithm in
 *      DuckDB, so scores replay bit-for-bit), keep candidates within
 *      `maxDistance`, and pick each dirty row's best match by
 *      (distance ASC, catalog id ASC) — a deterministic window, no floats.
 *
 * Unmatched dirty rows (no candidate within `maxDistance`, or an
 * unknown blocking key) are RETAINED with a null match and distance —
 * linkage's yield/reject split is the operator's whole point for a
 * curation audit, so dropping them silently would hide the reject rate.
 *
 * Skew note: a pathological blocking key (half the catalog in one block)
 * degrades to quadratic within that block — the standard mitigation is a
 * finer key; this operator REFUSES (IllegalArgumentException) when any
 * single catalog block exceeds `maxBlockSize`, making the degradation
 * loud instead of silent (the [[Dedup]] bucket-cap discipline).
 */
object Linkage {

  /**
   * Link `dirty` rows to their best `catalog` match within shared
   * `blockCol` blocks, by Levenshtein distance on `nameCol` (≤
   * `maxDistance`). Output: every dirty row's (dirtyIdCol, blockCol,
   * dirty name, matched catalog idCol (null if none), matched name,
   * distance).
   */
  def linkByEditDistance(
      dirty: DataFrame,
      dirtyIdCol: String,
      catalog: DataFrame,
      catalogIdCol: String,
      nameCol: String,
      blockCol: String,
      maxDistance: Int = 2,
      maxBlockSize: Long = 100000L): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    val cat = catalog.select(
      col(blockCol).as("__blk"),
      col(catalogIdCol).as("__cid"),
      col(nameCol).as("__cname"))
      .where(col("__blk").isNotNull && col("__cname").isNotNull)
    val oversized = cat.groupBy("__blk").agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxBlockSize)
      .orderBy(col("__n").desc).limit(1).collect()
    require(oversized.isEmpty, {
      val r = oversized.head
      s"linkByEditDistance: catalog block '${r.get(0)}' holds ${r.getLong(1)} " +
        s"rows (> maxBlockSize=$maxBlockSize); scoring inside it is " +
        "quadratic — refine the blocking key or raise maxBlockSize explicitly"
    })
    val d = dirty.select(
      col(dirtyIdCol).as("__did"),
      col(blockCol).as("__blk"),
      col(nameCol).as("__dname"))
    val scored = d
      .join(cat, Seq("__blk"), "left")
      .withColumn("__dist",
        when(col("__cname").isNotNull,
          levenshtein(col("__dname"), col("__cname"))).cast("int"))
      .withColumn("__cand",
        col("__dist").isNotNull && col("__dist") <= maxDistance)
    // Null distance/id (an empty block's left-join miss) sorts LAST on
    // both engines via an explicit null-rank term — Spark's bare ASC is
    // nulls-FIRST, DuckDB's nulls-LAST, so raw nulls here would diverge.
    // Among all-null rows the residual order is irrelevant: every one
    // yields the same unmatched output row.
    val best = Window.partitionBy(col("__did"))
      .orderBy(col("__cand").desc,
        col("__dist").isNull.asc, col("__dist").asc,
        col("__cid").isNull.asc, col("__cid").asc)
    scored
      .withColumn("__rk", row_number().over(best))
      .where(col("__rk") === 1)
      .select(
        col("__did").as(dirtyIdCol),
        col("__blk").as(blockCol),
        col("__dname").as("dirty_name"),
        when(col("__cand"), col("__cid")).as("matched_id"),
        when(col("__cand"), col("__cname")).as("matched_name"),
        when(col("__cand"), col("__dist")).as("distance"))
  }

  /**
   * Deterministic typo injection for linkage drills/specs: deletes the
   * character at 0-based position `seedCol mod length` when
   * `seedCol mod 3 != 0` (a third of the rows stay clean — exact matches
   * must link at distance 0). Pure column arithmetic, replayable in SQL
   * (`substr` prefix + suffix in any engine).
   */
  def injectTypos(nameCol: String, seedCol: String): Column =
    when(col(seedCol) % 3 === 0 || length(col(nameCol)) <= 1, col(nameCol))
      .otherwise(expr(
        s"concat(substring($nameCol, 1, cast($seedCol % length($nameCol) as int)), " +
          s"substring($nameCol, cast($seedCol % length($nameCol) as int) + 2))"))
}
