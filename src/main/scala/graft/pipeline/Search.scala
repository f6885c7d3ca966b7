package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Inverted-index corpus search: the audit tool every big-corpus pipeline
 * grows ("which documents contain these terms?") without a full-text scan
 * per question. The index is DISTINCT (token, id) POSTING ROWS — never
 * per-token arrays: a `collect_list` posting for a stopword would put one
 * token's billions of ids into a single row/task, the classic inverted-
 * index skew trap. Rows partition and compress like any table, and a
 * conjunctive query is hash-joins on the token key.
 *
 * Lifecycle follows the persisted-index convention (MinHash q103, IVF
 * q104, chunk ledger q125): build once from the corpus, write as parquet
 * (bucket by `token` via the q99 machinery when queries are frequent),
 * answer every later question from the stored rows with no corpus rescan.
 */
object Search {

  /** Distinct (token, id) posting rows. One explode + one distinct whose
   *  partial aggregation collapses repeats map-side. */
  def buildInvertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("token"))
      .distinct()

  /** Per-token document frequencies of a posting table — the statistics
   *  side of the index (stopword caps, rarest-first query planning). */
  def documentFrequencies(index: DataFrame): DataFrame =
    index.groupBy("token").agg(count(lit(1)).as("df_count"))

  /**
   * Conjunctive (AND) query: ids whose documents contain EVERY term.
   * The filter keeps only the query terms' posting rows — data volume is
   * the sum of the matched posting lists, not the corpus — then one
   * aggregate per id demands all terms present. Terms are deduplicated;
   * an empty term list is refused rather than returning the corpus.
   */
  def searchConjunctive(index: DataFrame, terms: Seq[String]): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "at least one search term required")
    index.filter(col("token").isin(ts: _*))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === ts.length)
      .select(col("id"))
  }
}
