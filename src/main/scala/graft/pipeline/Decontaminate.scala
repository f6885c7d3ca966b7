package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, functions => F}

import graft.functions.SketchFunctions

/**
 * Benchmark decontamination: remove training documents that share any word
 * n-gram with a held-out evaluation set, the standard pretraining hygiene
 * pass (GPT-3 appendix C / PaLM-style 8-gram overlap).
 *
 * Shape at 100 TB: the corpus side is the 100 TB; the benchmark side is a
 * few MB of eval sets. So the plan must never shuffle the corpus by gram:
 * the benchmark's distinct grams are collected into a broadcast hash set,
 * each corpus document's grams stream through a broadcast semi-join
 * map-side (the explode is pipelined into the join — gram rows are never
 * materialized to a shuffle), and only the matched document ids (bounded by
 * the benchmark's true overlap, not corpus size) reach an exchange for the
 * final anti-join. AQE turns that anti-join into a broadcast too when the
 * contaminated set is small — the common case.
 *
 * Grams are compared as 64-bit `xxhash64` values ([[graft.functions
 * .SketchExpressions HashedNgrams]]: one byte pass per document —
 * tokenize, hash, slide — measured 20-30× the interpreted
 * `transform`+`slice`+`array_join` chain, and corpus-side gram CPU is the
 * term that scales with the 100 TB). The tradeoff is one-sided: a hash
 * collision can only OVER-drop (an innocent document matching an eval
 * gram's hash), never keep a contaminated one, and the expected number of
 * false drops is |corpus grams| × |eval grams| / 2⁶⁴ — ~5·10⁻⁴ documents
 * at 10¹⁰ corpus grams × 10⁶ eval grams. [[wordGrams]] exposes the exact
 * string grams for audits of specific documents.
 */
object Decontaminate {

  /** Distinct lowercased word n-grams of `text` as strings (exact audit
   *  path; the operator itself joins on [[hashedGrams]]); fewer than `n`
   *  tokens → empty array (a document shorter than the window can't be
   *  contaminated by it). */
  def wordGrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = TextAnalysis.tokens(lower(text))
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(F.slice(toks, i + 1, lit(n)), " "))))
  }

  /** Distinct hashed lowercased word n-grams — value-equivalent to
   *  `transform(wordGrams(text, n), g -> xxhash64-of-tokens(g))` but one
   *  byte pass, no per-gram string materialization. */
  def hashedGrams(text: Column, n: Int): Column =
    array_distinct(SketchFunctions.hashed_ngrams(lower(text), n))

  /** Ids of `df` documents sharing at least one word n-gram with
   *  `benchmark`. One distinct-aggregation shuffle over matched ids only. */
  def contaminatedIds(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8): DataFrame = {
    val benchGrams = broadcast(
      benchmark
        .select(explode(hashedGrams(col(benchTextCol), n)).as("gram"))
        .distinct())
    df.select(col(idCol), explode(hashedGrams(col(textCol), n)).as("gram"))
      .join(benchGrams, Seq("gram"), "left_semi")
      .select(idCol)
      .distinct()
  }

  /** `df` minus every document overlapping `benchmark` by an n-gram. */
  def decontaminate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 8): DataFrame =
    df.join(
      contaminatedIds(df, idCol, textCol, benchmark, benchTextCol, n),
      Seq(idCol),
      "left_anti")
}
