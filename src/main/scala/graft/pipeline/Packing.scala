package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-sequence packing: the step between a cleaned document corpus and
 * fixed-length model inputs. Both industry-standard variants, both
 * deterministic (and therefore DuckDB-oracle-checkable) given a shard
 * column and an id ordering:
 *
 *  - [[packConcat]] — concat-and-chunk (GPT-style pretraining): per shard,
 *    documents concatenate into one token stream in id order and the stream
 *    is cut every `budget` tokens; documents may SPAN sequence boundaries
 *    (the attention mask, not the packing, separates them). Pure window
 *    arithmetic — one shuffle on the shard key, no stateful scan.
 *  - [[packGreedy]] — greedy no-split packing (T5/"packed examples" style):
 *    a document joins the current sequence iff it fits, else opens a new
 *    one; an oversized document (tokens > budget) gets a sequence of its
 *    own. Inherently a sequential scan per shard — implemented as a
 *    sorted-group stream with O(1) state, so a shard of any length packs
 *    without materializing in memory.
 *
 * Scale shape: both variants shuffle once on `shardCol` and scan linearly.
 * Shards are the parallelism unit — pick a key with enough cardinality for
 * the cluster (a hash bucket of the id works); packing quality only needs
 * shards big enough to amortize tail waste. Token counts use
 * [[TextAnalysis.tokenCount]] (whitespace tokens; null text counts 0).
 *
 * Determinism: every variant orders documents within a shard by
 * `(id, md5(text))` — the digest tiebreak makes the output well-defined
 * even when a shard holds DUPLICATE ids (without it, the scan/window peer
 * order is whatever the sort happened to produce, so sequence assignment
 * could differ run to run on legal input). Rows that tie on BOTH id and
 * text are interchangeable — either order yields the same output rows —
 * so the result is deterministic as a multiset in every case. md5 is used
 * (not xxhash64) because the DuckDB oracles must replay the exact same
 * order, and both engines agree on md5's lowercase-hex string form.
 */
object Packing {

  private def tokenCountOf(textCol: String): Column =
    coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0)).cast("long")

  /** Stable within-id tiebreak; see class doc. Null text ties with empty
    * text — both count 0 tokens and contribute "" to packed output, so the
    * ambiguity is harmless. */
  private def tiebreakOf(textCol: String): Column =
    md5(coalesce(col(textCol).cast("string"), lit("")))

  /**
   * Concat-and-chunk packing. Returns one row per document:
   * (id, shard, n_tokens, start_seq, start_off, end_seq) — the sequence
   * index the document starts in, its token offset there, and the sequence
   * it ends in (== start_seq unless it spans a cut; empty docs end where
   * they start).
   */
  def packConcat(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    // The window runs over the RENAMED projection below. Explicit ROWS
    // frame: the default RANGE frame includes all PEERS of the current id,
    // so duplicate ids within a shard would double-count each other's
    // tokens in cum_before. The md5 tiebreak (class doc) then pins which
    // of two same-id documents concatenates first, making cum_before a
    // pure function of the input multiset rather than of sort luck.
    val w = Window.partitionBy(col("shard")).orderBy(col("id"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("id"), col(shardCol).as("shard"),
        tokenCountOf(textCol).as("n_tokens"), tiebreakOf(textCol).as("tb"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .select(col("id"), col("shard"), col("n_tokens"),
        expr(s"cum_before div $budget").as("start_seq"),
        (col("cum_before") % budget).as("start_off"),
        when(col("n_tokens") > 0,
          expr(s"(cum_before + n_tokens - 1) div $budget"))
          .otherwise(expr(s"cum_before div $budget")).as("end_seq"))
  }

  /**
   * Greedy no-split packing, materialized: the model-ready sequences
   * themselves. Returns one row per packed sequence —
   * (shard, seq_idx, text, n_tokens, n_docs) — where `text` is the
   * member documents' text joined with single spaces in id order (null
   * text joins as empty). Same single sorted-group scan as [[packGreedy]]:
   * document text moves through exactly ONE shuffle and sequences emit
   * incrementally from the stream, so task memory is O(one sequence), not
   * O(shard) — the assignment never materializes separately and there is
   * no join-back for the text.
   */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val slim = df.select(col(idCol).cast("long").as("id"),
      col(shardCol).cast("string").as("shard"),
      coalesce(col(textCol).cast("string"), lit("")).as("text"),
      tokenCountOf(textCol).as("tc"), tiebreakOf(textCol).as("tb"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seq_idx", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_docs", org.apache.spark.sql.types.LongType)))
    slim.groupByKey((r: Row) => r.getString(1))(Encoders.STRING)
      .flatMapSortedGroups(col("id"), col("tb")) { (shard: String, rows: Iterator[Row]) =>
        new Iterator[Row] {
          private var seqIdx = -1L
          private var used = 0L
          private var docs = 0L
          private val sb = new java.lang.StringBuilder
          private var pending: Row = _
          override def hasNext: Boolean = pending != null || rows.hasNext || docs > 0
          override def next(): Row = {
            var emitted: Row = null
            while (emitted == null && (pending != null || rows.hasNext)) {
              val r = if (pending != null) pending else rows.next()
              pending = null
              val tc = r.getLong(3)
              if (docs == 0 || used + tc <= budget) {
                if (docs > 0) sb.append(' ')
                sb.append(r.getString(2))
                used += tc
                docs += 1
                if (seqIdx < 0) seqIdx = 0
              } else {
                // overflow: close the current sequence, replay r next call
                emitted = Row(shard, seqIdx, sb.toString, used, docs)
                pending = r
                sb.setLength(0); used = 0L; docs = 0L; seqIdx += 1
              }
            }
            if (emitted != null) emitted
            else if (docs > 0) { // stream drained: flush the open sequence
              val last = Row(shard, seqIdx, sb.toString, used, docs)
              sb.setLength(0); used = 0L; docs = 0L
              last
            } else throw new NoSuchElementException("group exhausted")
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /**
   * Greedy no-split packing. Returns (id, shard, n_tokens, seq_idx): the
   * 0-based sequence index within the shard. The scan is
   * `flatMapSortedGroups` over (shard → rows sorted by id): one shuffle,
   * one pass, two longs of state per shard regardless of shard size.
   */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      budget: Long): DataFrame =
    packGreedySlim(df.select(col(idCol).cast("long").as("id"),
      col(shardCol).cast("string").as("shard"), tokenCountOf(textCol).as("tc"),
      tiebreakOf(textCol).as("tb")), budget)

  /**
   * [[packGreedy]] over PRECOMPUTED token counts — the variant a real
   * tokenizer feeds: `nTokensCol` carries the count (e.g.
   * [[TextAnalysis.bpeTokenCounts]] under a stored merge table) instead
   * of the whitespace estimate, and `tiebreakCol` supplies the
   * within-id determinism digest (pass the text column to keep the
   * class-doc `(id, md5(text))` ordering contract). Null counts pack
   * as 0 tokens. Same one-shuffle sorted-group scan, same output shape.
   */
  def packGreedyByCount(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      shardCol: String,
      budget: Long,
      tiebreakCol: String): DataFrame =
    packGreedySlim(df.select(col(idCol).cast("long").as("id"),
      col(shardCol).cast("string").as("shard"),
      coalesce(col(nTokensCol).cast("long"), lit(0L)).as("tc"),
      tiebreakOf(tiebreakCol).as("tb")), budget)

  /**
   * [[packGreedy]] emitting the TRAINER-facing instance rows: each packed
   * document also carries `tok_offset` — its starting token position
   * inside its (shard, seq_idx) sequence, i.e. the running in-sequence
   * cursor the greedy scan already holds before admitting the document.
   * This is the table a data loader actually reads to slice training
   * sequences; offsets come from the SAME single scan that packs (no
   * second window pass), so sequence boundaries and Σ n_tokens replay
   * exactly.
   */
  def packGreedyWithOffsets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      budget: Long): DataFrame =
    packGreedySlim(df.select(col(idCol).cast("long").as("id"),
      col(shardCol).cast("string").as("shard"), tokenCountOf(textCol).as("tc"),
      tiebreakOf(textCol).as("tb")), budget, withOffsets = true)

  /** The shared greedy scan over (id, shard, tc, tb) rows. */
  private def packGreedySlim(
      slim: DataFrame,
      budget: Long,
      withOffsets: Boolean = false): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val baseFields = Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seq_idx", org.apache.spark.sql.types.LongType))
    val outSchema = org.apache.spark.sql.types.StructType(
      if (withOffsets) baseFields :+ org.apache.spark.sql.types.StructField(
        "tok_offset", org.apache.spark.sql.types.LongType)
      else baseFields)
    val shardIdx = 1
    slim.groupByKey((r: Row) => r.getString(shardIdx))(Encoders.STRING)
      .flatMapSortedGroups(col("id"), col("tb")) { (shard: String, rows: Iterator[Row]) =>
        var seq = -1L
        var used = 0L
        var first = true // the first document always opens sequence 0
        rows.map { r =>
          val tc = r.getLong(2)
          // `used` never exceeds budget here, so `used + tc` cannot overflow
          // for any budget a caller can satisfy with real token counts
          if (first || used + tc > budget) {
            seq += 1
            used = 0L
            first = false
          }
          val off = used
          used += tc
          if (withOffsets) Row(r.getLong(0), shard, tc, seq, off)
          else Row(r.getLong(0), shard, tc, seq)
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /**
   * Padding-waste report: the cost of NOT length-bucketing. Per shard,
   * documents batch `batchSize` at a time under two orderings — `arrival`
   * (id order, what a naive loader does) and `sorted` (token-count order,
   * length-bucketed) — and every batch pads each member to the batch max,
   * the way a fixed-shape training step does. One output row per
   * (shard, strategy): document/batch counts, real token volume, padded
   * volume, and waste in integer permille of the padded volume (exact
   * integer division — no float seam between engines). The gap between the
   * two rows is the padding reclaimed by length-bucketing alone; the
   * packing operators ([[packGreedy]]/[[packConcat]]) reclaim the rest.
   *
   * Scale shape: one shuffle on the shard key per strategy (the two
   * windows sort differently, so they cannot share one exchange's sort
   * order), each feeding a streaming `row_number` and two compact
   * aggregates — per-batch then per-shard rows only, never text. Ordering
   * ties break by the class-doc `(id, md5(text))` rule, so both batch
   * assignments are well-defined functions of the input multiset.
   */
  def paddingWasteReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val base = df.select(col(idCol).as("id"), col(shardCol).as("shard"),
      tokenCountOf(textCol).as("n_tokens"), tiebreakOf(textCol).as("tb"))
    def strategyReport(strategy: String, order: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(col("shard")).orderBy(order: _*)
      base
        .withColumn("rn", row_number().over(w))
        .withColumn("batch", expr(s"(rn - 1) div $batchSize"))
        .groupBy(col("shard"), col("batch"))
        .agg(count(lit(1)).as("bn"), sum(col("n_tokens")).as("bt"),
          max(col("n_tokens")).as("bm"))
        .groupBy(col("shard"))
        .agg(sum(col("bn")).as("n_docs"),
          count(lit(1)).as("n_batches"),
          sum(col("bt")).as("total_tokens"),
          sum(col("bm") * col("bn")).as("padded_tokens"))
        .withColumn("strategy", lit(strategy))
    }
    strategyReport("arrival", Seq(col("id"), col("tb")))
      .unionByName(strategyReport("sorted",
        Seq(col("n_tokens"), col("id"), col("tb"))))
      .withColumn("waste_permille",
        when(col("padded_tokens") === 0, lit(0L))
          .otherwise(expr("(padded_tokens - total_tokens) * 1000 div padded_tokens")))
      .select(col("shard"), col("strategy"), col("n_docs"), col("n_batches"),
        col("total_tokens"), col("padded_tokens"), col("waste_permille"))
  }
}
