package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hashed-feature document classification and importance weighting — the
 * model-based data-selection steps of an LLM curation pipeline:
 *
 *  - [[nbTrainHashed]] / [[nbScoreHashed]]: a multinomial Naive Bayes
 *    quality classifier over hash-bucketed token features, the
 *    linear-classifier filter shape of CCNet (Wenzek et al., 2020) and
 *    the GPT-3 WebText quality filter (Brown et al., 2020, App. A) with
 *    fastText's hashing trick (Joulin et al., 2017) bounding the model
 *    to `buckets` rows regardless of corpus size.
 *  - [[dsirLogRatios]]: per-document importance weights from hashed
 *    BIGRAM features — Data Selection via Importance Resampling (Xie et
 *    al., 2023): ln p_target(g) − ln p_raw(g) summed over a document's
 *    grams, both distributions add-one smoothed over the same bucket
 *    space. Compose with `Sampling.selectByTokenBudget` for the
 *    budgeted selection step.
 *
 * Scale design: training and the DSIR gram tables shuffle only
 * (bucket → partial counts) — `buckets` distinct keys with map-side
 * combine, independent of corpus size. Scoring is ZERO-shuffle: the
 * trained table (≤ buckets+1 rows, the bounded-collect convention)
 * broadcasts as an array literal and every document scores map-side
 * inside one whole-stage-codegen projection. Nothing here grows with
 * the corpus except the embarrassingly parallel scans.
 *
 * Determinism: buckets come from md5 (the q97 hashing convention), the
 * only `ln()` calls are rounded ONCE per distinct bucket to integer
 * micro-nats at fit time, and every per-document number is integer
 * arithmetic after that — so a DuckDB replay of the same expressions
 * agrees bit-for-bit and a stored model can never drift from a refit.
 */
object Classify {

  /**
   * md5 hash bucket of a token — exactly [[Similarity.hashEmbed]]'s
   * bucket arithmetic (first 8 hex chars as a long, mod `buckets`), so
   * every hashed-feature operator in the repo shares one replayable
   * formula: `('0x' || substr(md5(tok), 1, 8))::BIGINT % buckets`.
   */
  def tokenBucket(tok: Column, buckets: Int): Column =
    (graft.functions.TextHashFunctions.md5_hex_slice_long(tok, 1, 8)
      % buckets).cast("int")

  private def requireBuckets(buckets: Int): Unit =
    require(buckets >= 2 && buckets <= (1 << 22),
      s"buckets must be in [2, 2^22], got $buckets — the model table is " +
        "broadcast/collected, so it must stay driver-bounded")

  /**
   * Fit the NB weight table: one row per hash bucket plus a `bucket = -1`
   * prior row. Columns `(bucket, c_pos, c_neg, llr_micro)`:
   *
   *  - `c_pos`/`c_neg` — token-occurrence counts per class (document
   *    counts on the prior row),
   *  - `llr_micro` — `round((ln((c_pos+1)/(n_pos+B)) −
   *    ln((c_neg+1)/(n_neg+B))) · 1e6)`, the add-one-smoothed
   *    log-likelihood ratio in integer micro-nats; on the prior row
   *    `round(ln((d_pos+1)/(d_neg+1)) · 1e6)`.
   *
   * Every bucket in `[0, buckets)` is present even when no token hashed
   * into it (the smoothed LLR of an unseen bucket is still a real model
   * weight), so scoring never needs a fallback path. A `bucket = -2`
   * metadata row carries the bucket COUNT in `llr_micro` — the count is
   * the serve-time hash modulus, and persisting it explicitly lets
   * [[nbScoreHashed]] refuse a truncated stored table instead of
   * silently rebucketing every document against a smaller modulus.
   * `labelCol` is any deterministic boolean Column over `df`'s rows
   * (e.g. a curated-source allowlist — the CCNet "Wikipedia as target"
   * shape).
   *
   * One exchange: `buckets` distinct keys with map-side combine.
   */
  def nbTrainHashed(
      df: DataFrame,
      textCol: String,
      labelCol: Column,
      buckets: Int): DataFrame = {
    requireBuckets(buckets)
    val occ = df
      .select(labelCol.cast("boolean").as("y"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(col("y"), tokenBucket(col("tok"), buckets).as("bucket"))
    val counts = occ.groupBy("bucket").agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("y"), 0L).otherwise(1L)).as("c_neg"))
    val totals = counts.agg(
      coalesce(sum("c_pos"), lit(0L)).as("n_pos"),
      coalesce(sum("c_neg"), lit(0L)).as("n_neg"))
    val grid = df.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
    val weights = grid.join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_pos", "c_neg"))
      .crossJoin(broadcast(totals))
      .withColumn("llr_micro", expr(
        s"CAST(round((ln((c_pos + 1) / CAST(n_pos + $buckets AS DOUBLE)) - " +
          s"ln((c_neg + 1) / CAST(n_neg + $buckets AS DOUBLE))) * 1e6, 0) " +
          "AS BIGINT)"))
      .select("bucket", "c_pos", "c_neg", "llr_micro")
    val prior = df
      .agg(sum(when(labelCol.cast("boolean"), 1L).otherwise(0L)).as("d_pos"),
        sum(when(labelCol.cast("boolean"), 0L).otherwise(1L)).as("d_neg"))
      .select(lit(-1).as("bucket"), col("d_pos").as("c_pos"),
        col("d_neg").as("c_neg"),
        expr("CAST(round(ln((d_pos + 1) / CAST(d_neg + 1 AS DOUBLE)) * 1e6, 0) " +
          "AS BIGINT)").as("llr_micro"))
    val countRow = df.sparkSession.range(1)
      .select(lit(-2).as("bucket"), lit(0L).as("c_pos"), lit(0L).as("c_neg"),
        lit(buckets.toLong).as("llr_micro"))
    weights.unionByName(prior).unionByName(countRow)
  }

  /**
   * Score documents against a fitted (possibly STORED) weight table —
   * the serve half of the classifier lifecycle. `weights` is a
   * [[nbTrainHashed]]-shaped table; it is collected (bounded: ≤
   * buckets+1 rows by construction) and scoring runs map-side with NO
   * shuffle: the LLR array rides the plan as a literal and each
   * document folds its own token buckets inside codegen.
   *
   * Output per input row: `(id, n_tokens, nb_sum_micro, nb_mean_micro,
   * predicted)` where `nb_sum_micro` is the summed LLR over token
   * occurrences (0 for token-less docs), `nb_mean_micro` the
   * truncating-div per-token mean (NULL for token-less docs — the
   * length-invariant CCNet score), and `predicted` is
   * `1` iff `nb_sum_micro + prior_micro > 0` (the MAP decision).
   */
  /** Validate a collected model grid against its persisted bucket count
    * (the `bucket = -2` metadata row): count row present, every bucket in
    * [0, count) present exactly once. The bucket count is the hash
    * modulus at serve time, so a partial, truncated, or otherwise
    * corrupted stored table would silently rebucket every document;
    * fail fast instead. `declared` is the -2 row's payload. */
  private def requireDenseGrid(
      buckets: Array[Int], declared: Option[Long], what: String): Int = {
    require(declared.isDefined,
      s"$what table lacks its bucket-count metadata row (bucket = -2) — " +
        "refit with the current trainer or re-persist the model")
    val n = declared.get
    require(n >= 2 && n <= (1 << 22), s"$what declared bucket count $n " +
      "out of the [2, 2^22] model range — corrupted metadata row")
    require(buckets.length == n && buckets.toSet.size == n &&
        buckets.forall(b => b >= 0 && b < n),
      s"$what table is not the dense [0, ${n - 1}] grid its metadata " +
        s"declares (${buckets.length} rows, ${buckets.toSet.size} " +
        "distinct) — the bucket count is the serve-time hash modulus, " +
        "so a partial, truncated, or corrupted stored model would " +
        "silently mis-bucket every document")
    n.toInt
  }

  def nbScoreHashed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame): DataFrame = {
    val rows = weights.select("bucket", "llr_micro").collect()
    val buckets = requireDenseGrid(
      rows.map(_.getInt(0)).filter(_ >= 0),
      rows.find(_.getInt(0) == -2).map(_.getLong(1)), "NB weight")
    val priorMicro = rows.find(_.getInt(0) == -1).map(_.getLong(1)).getOrElse(0L)
    val llr = new Array[Long](buckets)
    rows.foreach(r => if (r.getInt(0) >= 0) llr(r.getInt(0)) = r.getLong(1))
    val llrLit = lit(llr)
    // NULL text yields a NULL token array (tokens()'s empty-array guard
    // only fires on non-NULL input) — coalesce both derived numbers so
    // token-less documents score as (0 tokens, 0 sum), the same rows the
    // SQL replay's left join + coalesce produces.
    val toks = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol).as("id"), toks.as("toks"))
      .select(col("id"),
        coalesce(size(col("toks")), lit(0)).as("n_tokens"),
        coalesce(
          aggregate(
            transform(col("toks"), t => tokenBucket(t, buckets)),
            lit(0L),
            (acc, b) => acc + element_at(llrLit, b + 1)),
          lit(0L)).as("nb_sum_micro"))
      .select(col("id"), col("n_tokens"), col("nb_sum_micro"),
        when(col("n_tokens") > 0,
          expr("nb_sum_micro DIV n_tokens")).as("nb_mean_micro"),
        when(col("nb_sum_micro") + lit(priorMicro) > 0, lit(1))
          .otherwise(lit(0)).as("predicted"))
  }

  /**
   * DSIR importance weights (Xie et al., 2023) from hashed BIGRAM
   * features: for each document, `dsir_micro = Σ_grams λ(bucket(g))`
   * where `λ(b) = round((ln((c_t(b)+1)/(n_t+B)) −
   * ln((c_r(b)+1)/(n_r+B))) · 1e6)` — target counts over the rows where
   * `targetLabel` holds, raw counts over ALL rows, both add-one
   * smoothed over the same `buckets` space and rounded once per
   * distinct bucket. Output: `(id, n_bigrams, dsir_micro,
   * dsir_mean_micro)` with the truncating-div per-gram mean (NULL when
   * the document has < 2 tokens) — rank on the mean to keep selection
   * length-invariant, then feed `Sampling.selectByTokenBudget` for the
   * resampling step at a token budget.
   *
   * Same scale contract as [[nbTrainHashed]]: the gram table exchanges
   * `buckets` keys; per-document scoring joins occurrences to the
   * broadcast λ table and aggregates by document id.
   */
  /** A document's hashed-bigram bucket array — the ONE feature extractor
    * both the DSIR fit and serve paths run (fit explodes it, serve folds
    * it map-side), so stored-λ scoring can never drift from a refit. */
  private def bigramBuckets(textCol: String, buckets: Int): Column = {
    val toks = TextAnalysis.tokens(col(textCol))
    // slice length clamps at 0: a 0/1-token document has no bigrams (the
    // empty array), never a negative-length slice error.
    val len = greatest(size(toks) - 1, lit(0))
    transform(
      zip_with(
        slice(toks, lit(1), len),
        slice(toks, lit(2), len),
        (a, b) => concat(a, lit(" "), b)),
      bg => tokenBucket(bg, buckets))
  }

  /**
   * Fit the DSIR λ table ONCE — the persist-once half of the fit/serve
   * lifecycle (the q234 stored-model convention). One row per bucket in
   * `[0, buckets)` — DENSE, so a later batch's unseen grams score
   * through the same smoothed weights instead of a fallback path —
   * plus a `bucket = -2` metadata row carrying the bucket count in
   * `lambda_micro` (the serve-time modulus guard, as [[nbTrainHashed]]):
   * `(bucket, c_t, c_r, lambda_micro)` with `lambda_micro =
   * round((ln((c_t+1)/(n_t+B)) − ln((c_r+1)/(n_r+B))) · 1e6)` — target
   * counts over `targetLabel` rows, raw counts over ALL rows, micro-nat
   * integers rounded once per bucket at fit time.
   *
   * One exchange of `buckets` keys with map-side combine, regardless of
   * corpus size.
   */
  def dsirFitLambda(
      df: DataFrame,
      textCol: String,
      targetLabel: Column,
      buckets: Int): DataFrame = {
    requireBuckets(buckets)
    dsirFitFromFeatures(
      df.select(targetLabel.cast("boolean").as("y"),
        bigramBuckets(textCol, buckets).as("bks")),
      buckets)
  }

  /** [[dsirFitLambda]] over an already-extracted (y, bks) feature frame —
    * the shared-scan entry point: [[dsirLogRatios]] materializes the
    * hashed-bigram arrays once and both the fit (explode) and the serve
    * (fold) read that frame instead of re-tokenizing and re-hashing the
    * corpus. */
  private def dsirFitFromFeatures(feats: DataFrame, buckets: Int): DataFrame = {
    val occ = feats.select(col("y"), explode(col("bks")).as("bucket"))
    val counts = occ.groupBy("bucket").agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("c_t"),
      count(lit(1)).as("c_r"))
    val totals = counts.agg(
      coalesce(sum("c_t"), lit(0L)).as("n_t"),
      coalesce(sum("c_r"), lit(0L)).as("n_r"))
    val grid = feats.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
    grid.join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_t", "c_r"))
      .crossJoin(broadcast(totals))
      .withColumn("lambda_micro", expr(
        s"CAST(round((ln((c_t + 1) / CAST(n_t + $buckets AS DOUBLE)) - " +
          s"ln((c_r + 1) / CAST(n_r + $buckets AS DOUBLE))) * 1e6, 0) " +
          "AS BIGINT)"))
      .select("bucket", "c_t", "c_r", "lambda_micro")
      .unionByName(feats.sparkSession.range(1)
        .select(lit(-2).as("bucket"), lit(0L).as("c_t"), lit(0L).as("c_r"),
          lit(buckets.toLong).as("lambda_micro")))
  }

  /**
   * Score documents against a fitted (possibly STORED) λ table — the
   * serve half, shaped exactly like [[nbScoreHashed]]: the table is
   * collected (bounded: `buckets` rows by construction, dense-grid
   * validated so a corrupted store fails fast instead of silently
   * rebucketing), the λ array rides the plan as a literal, and every
   * document folds its own bigram buckets inside one codegen projection
   * — ZERO shuffle, nothing grows with the corpus.
   *
   * Output per input row: `(id, n_bigrams, dsir_micro, dsir_mean_micro)`
   * with the truncating-div per-gram mean (NULL when the document has
   * < 2 tokens).
   */
  def dsirScoreHashed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lambda: DataFrame): DataFrame = {
    val (buckets, lamLit) = collectLambda(lambda)
    dsirScoreFromFeatures(
      df.select(col(idCol).as("id"),
        bigramBuckets(textCol, buckets).as("bks")),
      lamLit)
  }

  /** Collect + dense-grid-validate a λ table into its literal array form
    * (bounded: `buckets` rows by construction). */
  private def collectLambda(lambda: DataFrame): (Int, Column) = {
    val rows = lambda.select("bucket", "lambda_micro").collect()
    val buckets = requireDenseGrid(
      rows.map(_.getInt(0)).filter(_ >= 0),
      rows.find(_.getInt(0) == -2).map(_.getLong(1)), "DSIR lambda")
    val lam = new Array[Long](buckets)
    rows.foreach(r => if (r.getInt(0) >= 0) lam(r.getInt(0)) = r.getLong(1))
    (buckets, lit(lam))
  }

  /** The λ-literal fold over an already-extracted (id, bks) frame. */
  private def dsirScoreFromFeatures(feats: DataFrame, lamLit: Column)
    : DataFrame =
    feats
      .select(col("id"),
        coalesce(size(col("bks")).cast("long"), lit(0L)).as("n_bigrams"),
        coalesce(
          aggregate(col("bks"), lit(0L),
            (acc, b) => acc + element_at(lamLit, b + 1)),
          lit(0L)).as("dsir_micro"))
      .withColumn("dsir_mean_micro",
        when(col("n_bigrams") > 0, expr("dsir_micro DIV n_bigrams")))

  /** Fit-then-score in one call — kept as the one-shot API for ad-hoc
    * runs. The hashed-bigram feature arrays are extracted ONCE and
    * materialized (lazy localCheckpoint); the fit explodes that frame and
    * the serve folds it — previously both halves re-tokenized and
    * re-md5-hashed every bigram of the corpus (two full feature passes,
    * the dominant CPU of the q235 path). Values are identical. At very
    * large scale, stage the feature frame to a scratch parquet table
    * instead of executor memory. */
  def dsirLogRatios(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetLabel: Column,
      buckets: Int): DataFrame = {
    requireBuckets(buckets)
    val feats = df.select(col(idCol).as("id"),
        targetLabel.cast("boolean").as("y"),
        bigramBuckets(textCol, buckets).as("bks"))
      .localCheckpoint(eager = false)
    val (_, lamLit) = collectLambda(dsirFitFromFeatures(feats, buckets))
    dsirScoreFromFeatures(feats, lamLit)
  }
}
