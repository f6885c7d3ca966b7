package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
 *      block (`functions.levenshtein` in its THRESHOLD form — banded DP,
 *      O(len·maxDistance) with early exit, behind a length-difference
 *      gate; for every surviving candidate the value equals DuckDB's
 *      full levenshtein, so scores replay bit-for-bit), keep candidates
 *      within `maxDistance`, and pick each dirty row's best match by
 *      (distance ASC, catalog id ASC) — a struct-min aggregate, no
 *      floats, no window. Scoring runs once per DISTINCT (block, name)
 *      pair, not per row pair — names repeat heavily in real feeds.
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
    // The best-match sort key casts the catalog id to long (a string id
    // would silently null-cast and corrupt the struct-min ordering).
    Dedup.requireIntegralId(catalog, catalogIdCol, "linkByEditDistance")
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
    // Scoring runs over the DISTINCT name space, not the row space (the
    // q20 content-keyed discipline): real feeds and catalogs repeat
    // names heavily, and edit distance depends only on the strings —
    // scoring each (block, dirty name) × (block, catalog name) pair once
    // and joining the verdict back is output-identical and bounds the
    // quadratic by DISTINCT names per block (worst case — all names
    // unique — it degrades to exactly the row-pair cost plus two cheap
    // distinct aggregates). The catalog side pre-resolves each name to
    // its minimal id: the global (distance ASC, id ASC) best over rows
    // equals the best over names of (distance, min id within name).
    val dn = d.select(col("__blk"), col("__dname")).distinct()
    val cn = cat.groupBy(col("__blk"), col("__cname"))
      .agg(min(col("__cid").cast("long")).as("__mcid"))
    // Two further pruning layers, both output-invariant: a length gate
    // (edit distance is bounded below by the length difference) and the
    // THRESHOLD form of levenshtein (banded DP, O(len·maxDistance) per
    // pair with early exit, −1 past the bound — vs the full O(len²)
    // matrix). Pruned pairs were never candidates; every non-candidate
    // yields the identical unmatched output row.
    val scored = dn
      .join(cn, Seq("__blk"), "left")
      .withColumn("__dist",
        when(col("__cname").isNotNull &&
            abs(length(col("__dname")) - length(col("__cname")))
              <= maxDistance,
          levenshtein(col("__dname"), col("__cname"), maxDistance))
          .cast("int"))
      .withColumn("__cand",
        col("__dist").isNotNull && col("__dist") >= 0 &&
          col("__dist") <= maxDistance)
    // Best-match selection is ONE aggregate, not a window: min over a
    // struct whose leading fields are the (distance, id) sort key as
    // longs, with non-candidates pushed to Long.MaxValue so any real
    // candidate beats them (lexicographic struct order IS the tie rule,
    // the q137 convention), and map-side partials reduce each task to
    // one best-so-far row per name before anything crosses the
    // exchange. The trailing name field never decides between different
    // answers: distinct catalog names have distinct min ids, so a full
    // (distance, id) tie only happens between all-MaxValue unmatched
    // rows, whose output is null either way.
    val best = scored
      .withColumn("__dk",
        when(col("__cand"), col("__dist").cast("long"))
          .otherwise(Long.MaxValue))
      .withColumn("__ck",
        when(col("__cand"), col("__mcid")).otherwise(Long.MaxValue))
      .groupBy(col("__blk"), col("__dname"))
      .agg(min(struct(col("__dk"), col("__ck"), col("__cname"))).as("__b"))
    d.join(best, Seq("__blk", "__dname"), "left")
      .select(
        col("__did").as(dirtyIdCol),
        col("__blk").as(blockCol),
        col("__dname").as("dirty_name"),
        when(col("__b.__dk") =!= Long.MaxValue, col("__b.__ck"))
          .as("matched_id"),
        when(col("__b.__dk") =!= Long.MaxValue, col("__b.__cname"))
          .as("matched_name"),
        when(col("__b.__dk") =!= Long.MaxValue, col("__b.__dk").cast("int"))
          .as("distance"))
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
