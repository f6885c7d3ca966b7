package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, key-stable sampling and split assignment.
 *
 * A 100-TB training pipeline cannot use `df.sample()` for held-out splits:
 * its output depends on partitioning and run order, so a re-run (or a
 * recomputed lineage after executor loss) silently reassigns rows. These
 * operators derive the decision purely from a stable key — the same row
 * lands in the same split on every run, on any cluster layout, and a
 * document's assignment can be recomputed from its id alone (no membership
 * table to join). Everything is a map-side expression: no shuffle, no state.
 *
 * The bucket function is the low 32 bits of md5 of (key string ++ salt),
 * reduced mod `buckets` — md5 rather than xxhash64 so external systems
 * (and the DuckDB oracle) can replicate the exact assignment.
 */
object Sampling {

  val DefaultBuckets = 1000000

  /** Stable bucket in [0, buckets) from a non-null key. Change `salt` to
   *  draw an independent assignment (e.g. per-epoch subsampling). */
  def hashBucket(key: Column, buckets: Int = DefaultBuckets, salt: String = ""): Column =
    graft.functions.TextHashFunctions.md5_hex_slice_long(
      concat(key.cast("string"), lit(salt)), 25, 8) % buckets

  /** Keep a deterministic `fraction` of rows, keyed by `keyCol`. */
  def sampleByHash(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.filter(hashBucket(col(keyCol), DefaultBuckets, salt) <
      math.round(fraction * DefaultBuckets))
  }

  /**
   * Assign each row to a named split by cumulative weight ranges over the
   * bucket space — e.g. `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`.
   * Weights must sum to 1 (±1e-9); ranges are half-open and exhaustive, so
   * every row gets exactly one split.
   */
  def assignSplits(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = "",
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0), "split weights must be non-negative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val bucket = hashBucket(col(keyCol), DefaultBuckets, salt)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * DefaultBuckets))
    // Last range is `otherwise`, so rounding can never leave a row unassigned.
    val expr = splits.init.zip(bounds.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), hi)) =>
        val cond = bucket < hi
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }
    val assigned = expr.fold(lit(splits.head._1))(_.otherwise(lit(splits.last._1)))
    df.withColumn(splitCol, assigned)
  }

  /**
   * Mixture reweighting: keep a different deterministic fraction of rows
   * per `keyCol` value — upweight code, downweight boilerplate domains,
   * rebalance languages. Pure map-side: the fraction lookup folds into a
   * when-chain (no join), and membership is the same key-stable md5 bucket
   * as [[sampleByHash]], so for one salt the kept sets are NESTED across
   * fraction changes — raising a source's weight only adds rows, never
   * reshuffles which ones survive. Keys absent from `fractions` keep
   * `defaultFraction` (1.0 = pass through).
   */
  def sampleByKeyFractions(
      df: DataFrame,
      keyCol: String,
      fractions: Map[String, Double],
      idCol: String,
      defaultFraction: Double = 1.0,
      salt: String = ""): DataFrame = {
    require((fractions.values.toSeq :+ defaultFraction).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0,1]")
    val bucket = hashBucket(col(idCol), DefaultBuckets, salt)
    val cut = fractions.foldLeft(Option.empty[Column]) { case (acc, (k, f)) =>
      val cond = col(keyCol) === lit(k)
      val v = lit(math.round(f * DefaultBuckets))
      Some(acc.fold(when(cond, v))(_.when(cond, v)))
    }.fold(lit(math.round(defaultFraction * DefaultBuckets)): Column)(
      _.otherwise(lit(math.round(defaultFraction * DefaultBuckets))))
    df.filter(bucket < cut)
  }

  /**
   * Frequency capping: keep at most `maxPerKey` rows per `keyCol` value —
   * the per-domain cap a web-corpus pipeline applies so one giant crawl
   * host can't dominate the training mix. Which rows survive is
   * deterministic and layout-independent: rows rank by their md5 bucket
   * (then by `orderCol` to break ties), so re-runs keep the same winners
   * and changing `salt` draws an independent cap. One shuffle, keyed by
   * `keyCol`, feeding a windowed rank that Spark evaluates streaming per
   * partition (no buffering beyond the run of one key).
   *
   * Skew defense for 100 TB (`skewThinFactor` > 0): a single pathological
   * key (one domain = half the crawl) serializes into one window task. The
   * option counts rows per key (one compact map-side-combined agg), and for
   * keys exceeding `skewThinFactor × maxPerKey` rows pre-filters to the
   * rows whose bucket falls below `⌈buckets × skewThinFactor × maxPerKey /
   * n⌉` — a PREFIX of the window's own ascending-bucket ranking, so
   * whenever at least `maxPerKey` rows survive the thin, the winners are
   * bit-for-bit the winners of the unthinned window. Expected survivors
   * per heavy key = `max(skewThinFactor × maxPerKey, n / buckets)` — the
   * threshold cannot drop below one bucket, so past `n = buckets ×
   * skewThinFactor × maxPerKey` rows the bound grows again at slope
   * 1/buckets (a 10¹⁰-row key still leaves only ~10⁴ rows for the window
   * task at the default 10⁶ buckets); under-selection odds decay
   * as exp(-F(1-1/F)²·maxPerKey/2) by Chernoff — < 2·10⁻⁸ per heavy key at
   * the recommended F = 20 even for maxPerKey = 1. Unskewed keys (and rows
   * with a null bucket, which rank first and must always reach the window)
   * pass through untouched, so their survivors are identical by
   * construction.
   */
  def capPerKey(
      df: DataFrame,
      keyCol: String,
      maxPerKey: Int,
      orderCol: String,
      salt: String = "",
      skewThinFactor: Int = 0): DataFrame = {
    require(maxPerKey >= 1, s"maxPerKey must be >= 1, got $maxPerKey")
    require(skewThinFactor == 0 || skewThinFactor >= 8,
      s"skewThinFactor must be 0 (off) or >= 8 (under-selection odds), got $skewThinFactor")
    import org.apache.spark.sql.expressions.Window
    val bucket = hashBucket(col(orderCol), DefaultBuckets, salt)
    val input =
      if (skewThinFactor == 0) df
      else {
        val bound = skewThinFactor.toLong * maxPerKey
        // No broadcast() hint: one row per heavy key is usually tiny, and
        // AQE will broadcast it from runtime stats — but "heavy" is
        // unbounded (per-domain capping of a web corpus can flag 10^8+
        // keys), and a forced broadcast of an unbounded build side is a
        // driver-OOM/8-GB-limit cliff at exactly the scale this option
        // exists for. A big heavy set degrades to a shuffled join instead.
        val heavy =
          df.groupBy(col(keyCol).as("__thin_k"))
            .agg(count(lit(1)).as("__thin_n"))
            .filter(col("__thin_n") > bound)
        df.join(heavy, col(keyCol) <=> col("__thin_k"), "left")
          .filter(col("__thin_n").isNull || bucket.isNull ||
            bucket < ceil(lit(DefaultBuckets.toDouble) * bound / col("__thin_n")))
          .drop("__thin_k", "__thin_n")
      }
    val w = Window.partitionBy(col(keyCol)).orderBy(bucket, col(orderCol))
    input.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= maxPerKey)
      .drop("__rank")
  }

  /** Exact integer square root: floor(sqrt(n)), corrected so the result is
   * exact even where a double sqrt would misround near perfect squares.
   * Comparisons go through division (`w > n/w` ⟺ `w² > n` for w ≥ 1) so
   * the correction never squares a candidate — `(w+1)²` overflows Long
   * when n approaches Long.MaxValue. */
  private[pipeline] def isqrt(n: Long): Long = {
    require(n >= 0, s"isqrt of negative $n")
    var w = math.floor(math.sqrt(n.toDouble)).toLong.min(3037000499L).max(0L)
    while (w > 0 && w > n / w) w -= 1
    while (w + 1 <= n / (w + 1)) w += 1
    w
  }

  /**
   * Temperature-weighted mixture sampling: keep fractions per key
   * proportional to `n_key^α / n_key` with α = 1/2, normalized so the
   * expected kept volume is `budgetPermille/1000` of the corpus — the
   * standard multilingual/multi-source LM reweighting (upweight small
   * sources, damp giant ones) with the temperature fixed at the sqrt
   * point. Every threshold is computed in EXACT integer arithmetic
   * (integer sqrt, BigInt products, one floor division), so the kept set
   * is bit-reproducible on any engine, any partition layout, any
   * summation order — no float pow, no float sum over sources.
   *
   * Execution shape: one map-side-combined count per key collects to the
   * driver (|keys| rows — mixture keys are languages/sources/domains
   * groups, expected ≤ thousands; same bounded-collect convention as the
   * eval-gram table, and like it the collect REFUSES loudly past
   * `maxKeys` — a caller who keyed the mixture by near-distinct content
   * would otherwise OOM the driver silently). Small key sets fold into a
   * codegen'd when-chain; larger ones ride a broadcast threshold table.
   * Membership is the same salt-keyed md5 bucket as [[sampleByHash]], so
   * kept sets are NESTED across budget changes for one salt. Null keys
   * drop (threshold 0).
   */
  def sampleByTemperature(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      budgetPermille: Int = 500,
      salt: String = "",
      maxKeys: Int = 1000000): DataFrame = {
    require(budgetPermille >= 0 && budgetPermille <= 1000,
      s"budgetPermille must be in [0,1000], got $budgetPermille")
    require(maxKeys >= 1, s"maxKeys must be >= 1, got $maxKeys")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__n"))
      .limit(maxKeys + 1)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    require(counts.length <= maxKeys,
      s"sampleByTemperature found more than $maxKeys distinct mixture keys " +
        s"in '$keyCol' — temperature weights are per-source/language/domain " +
        "group arithmetic, not per-document; key by a coarse group column, " +
        "or raise maxKeys to accept the driver-side table explicitly.")
    if (counts.isEmpty) return df.filter(lit(false))
    val m = BigInt(DefaultBuckets)
    val total = counts.map(_._2).sum
    val budget = BigInt(total) * budgetPermille / 1000
    val weights = counts.map { case (k, n) => (k, n, BigInt(isqrt(n))) }
    val sw = weights.map(_._3).sum
    val thresholds: Array[(String, Long)] = weights.map { case (k, n, w) =>
      val thr = (budget * w * m / (sw * BigInt(n))) min m
      k -> thr.toLong
    }
    val bucket = hashBucket(col(idCol), DefaultBuckets, salt)
    if (thresholds.length <= 64) {
      val cut = thresholds.foldLeft(Option.empty[Column]) { case (acc, (k, thr)) =>
        val cond = col(keyCol).cast("string") === lit(k)
        Some(acc.fold(when(cond, lit(thr)))(_.when(cond, lit(thr))))
      }.get.otherwise(lit(0L))
      df.filter(bucket < cut)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val thrDf = broadcast(thresholds.toSeq.toDF("__k", "__thr"))
      df.join(thrDf, col(keyCol).cast("string") === col("__k"), "inner")
        .filter(bucket < col("__thr"))
        .drop("__k", "__thr")
    }
  }

  /**
   * Deterministic pre-training corpus shuffle: a total order (and explicit
   * `shuffle_pos` rank) from the salt-keyed md5 of the document id —
   * reproducible across runs, partition layouts and engines, unlike
   * `orderBy(rand())`. Different salts give independent epoch orders.
   *
   * The rank is computed WITHOUT a global-order window (which would funnel
   * the corpus through one task): rows bucket by the md5's first two hex
   * chars (256 buckets, aligned with the full-key order since the prefix
   * is the key's high byte); a 256-row cumulative histogram gives each
   * bucket's global offset (broadcast back); ranks within a bucket come
   * from a `partitionBy(bucket)` window — parallel across 256 buckets,
   * each holding ~1/256 of the corpus. `shuffle_pos = offset + rank − 1`,
   * exactly `row_number() OVER (ORDER BY key, id) − 1`. Ties on the full
   * key (duplicate ids) break by `idCol`, keeping the order
   * run-deterministic on any input.
   */
  def shuffleOrder(df: DataFrame, idCol: String, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    val keyed = df.withColumn("__k", key)
      .withColumn("__b", substring(col("__k"), 1, 2))
    val hist = keyed.groupBy("__b").agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__b", "__offset")
    val wb = Window.partitionBy(col("__b")).orderBy(col("__k"), col(idCol))
    keyed.join(broadcast(hist), Seq("__b"))
      .withColumn("shuffle_pos", col("__offset") + row_number().over(wb) - 1)
      .drop("__k", "__b", "__offset")
  }

  /**
   * Rendezvous (highest-random-weight) shard routing: each key lands on
   * the shard maximizing md5(key|shard) — the stateless consistent-
   * placement rule behind cache/worker routing: REMOVING a shard
   * reassigns only that shard's own keys (every other key's winning
   * weight is untouched), and adding one steals ~1/(S+1) of keys from
   * everyone evenly. No ring state, no driver table — pure map-side
   * expression, S digests per row folded by a struct max (ties, at
   * md5-collision probability, break toward the lexicographically
   * larger shard name — deterministic either way).
   */
  def rendezvousAssign(
      df: DataFrame,
      keyCol: String,
      shards: Seq[String],
      salt: String = ""): DataFrame = {
    require(shards.nonEmpty, "at least one shard required")
    require(shards.distinct.size == shards.size, s"duplicate shards: $shards")
    val scored = shards.map { sh =>
      struct(
        graft.functions.TextHashFunctions.md5_hex_slice_long(
          concat(col(keyCol).cast("string"), lit("|"), lit(sh), lit(salt)),
          1, 15).as("w"),
        lit(sh).as("shard"))
    }
    df.withColumn("shard",
      (if (scored.length == 1) scored.head else greatest(scored: _*))
        .getField("shard"))
  }

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES): the
   * k rows with the largest u^(1/w) — equivalently ln(u)/w, the form used
   * here — where u derives from md5(salt|id), not an RNG. Inclusion
   * probability tracks the weight column exactly as the classic
   * reservoir algorithm's, but the "reservoir" is a distributed
   * TakeOrdered: each partition keeps its local top-k candidates and the
   * driver merges k-sized heads — no shuffle of data rows, no sequential
   * scan dependency, replayable on any engine.
   *
   * Determinism seam: u = (h + 1) / 2^52 from the md5's first 52 bits
   * (never 0, so ln is finite), the key rounds ONCE per row to integer
   * micro-nats (the q107 convention), ties break on id ascending.
   * Non-positive and null weights are excluded (a zero weight cannot be
   * sampled; a negative one is a data bug surfaced by the count drop,
   * not silently clamped).
   */
  def weightedSampleNoReplacement(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "ws"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    Dedup.requireIntegralId(df, idCol, "weightedSampleNoReplacement")
    val h = graft.functions.TextHashFunctions.md5_hex_slice_long(
      concat(lit(salt), lit("|"), col("id").cast("string")), 1, 13)
    df.select(col(idCol).cast("long").as("id"),
        col(weightCol).cast("double").as("__w"))
      .where(col("id").isNotNull && col("__w") > 0.0)
      .withColumn("key_micro",
        round(log((h + lit(1L)).cast("double") / lit(4503599627370496.0))
          / col("__w") * lit(1000000.0)).cast("long"))
      .orderBy(desc("key_micro"), asc("id"))
      .limit(k)
      .select(col("id"), col("key_micro"))
  }

  /**
   * Largest-remainder (Hamilton) apportionment: split an EXACT global
   * sample `budget` across the values of `keyCol` proportionally to
   * stratum size. Each stratum gets `floor(budget·n/N)` seats; the
   * leftover seats (< number of strata) go to the largest fractional
   * remainders, ties broken by key ascending — so the table sums to
   * exactly `budget` whenever `budget ≤ N`, which hash-fraction sampling
   * ([[sampleByHash]]) cannot promise. All arithmetic is exact — the
   * `budget·n` products run in DECIMAL(38,0), division is integral — so
   * the allocation is engine- and layout-independent.
   *
   * Returns one row per stratum: (key, n, alloc). Execution: one
   * map-side-combined count per key, then window/rollup arithmetic over
   * that |keys|-row table only (strata are languages/sources/domains —
   * the global window never sees corpus rows; same convention as the
   * vocabulary and histogram operators). Null keys are excluded.
   */
  def proportionalAllocation(
      df: DataFrame,
      keyCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__N"))
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("__q", expr(s"CAST($budget AS DECIMAL(38,0)) * n"))
      .withColumn("base", expr("__q div __N"))
      .withColumn("__rem", expr("CAST(__q % __N AS BIGINT)"))
    val wRank = Window.orderBy(col("__rem").desc, col("key").asc)
    val ranked = quotas.withColumn("__rk", row_number().over(wRank))
    val baseSum = ranked.agg(sum(col("base")).as("__SB"))
    ranked.crossJoin(broadcast(baseSum))
      .withColumn("alloc", col("base") +
        when(col("__rk") <= lit(budget) - col("__SB"), 1L).otherwise(0L))
      .select(col("key"), col("n"), col("alloc"))
  }

  /**
   * WEIGHTED largest-remainder apportionment — the mixture-construction
   * primitive behind DoReMi/temperature-style domain reweighting applied
   * EXACTLY: split `budget` training slots across the values of `keyCol`
   * proportionally to n_k · w_k (stratum size × its declared mixture
   * weight), floor quotas + largest-remainder top-ups, ties by key
   * ascending. Unlike [[proportionalAllocation]] (w ≡ 1), the result is
   * a TARGET, not a cap: a low-resource stratum whose weighted share
   * exceeds its size is upsampled with repetition (alloc > n — the
   * standard epoch-repetition semantics of mixture training), so no n_k
   * cap applies. Weights are integer mixture parts (scale to micro-units
   * for fractional ratios); strata absent from `weights` get weight 0 —
   * never allocated, still reported. All arithmetic runs in
   * DECIMAL(38,0), so Σ alloc = budget exactly whenever any
   * positive-weight stratum exists, on any engine and any layout.
   *
   * Returns one row per stratum: (key, n, w, alloc). Execution: one
   * map-side-combined count per key, a broadcast join against the
   * |weights|-row table, then window/rank arithmetic over the
   * |keys|-row table only — the global window never sees corpus rows
   * (the [[proportionalAllocation]] shape). Null keys are excluded.
   */
  def weightedAllocation(
      df: DataFrame,
      keyCol: String,
      weights: Map[String, Long],
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(weights.values.forall(_ >= 0),
      s"mixture weights must be >= 0, got $weights")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = weights.toSeq.toDF("key", "w")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(wDf), Seq("key"), "left")
      .withColumn("w", coalesce(col("w"), lit(0L)))
      .withColumn("__mass", expr("CAST(n AS DECIMAL(38,0)) * w"))
    // Zero total mass (no stratum carries positive weight): every floor
    // quota and every remainder is 0, and the top-up guard below keeps
    // the leftover from leaking into zero-weight strata. The unpartitioned
    // windows run over the |keys|-row quota table only — never corpus rows.
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = counts
      .withColumn("__mt", sum(col("__mass")).over(wAll))
      .withColumn("__q", expr(s"CAST($budget AS DECIMAL(38,0)) * __mass"))
      .withColumn("base",
        when(col("__mt") > 0, expr("__q div __mt")).otherwise(lit(0L)))
      .withColumn("__rem",
        when(col("__mt") > 0, expr("__q % __mt"))
          .otherwise(lit(0).cast("decimal(38,0)")))
    val wRank = Window.orderBy(col("__rem").desc, col("key").asc)
    quotas.withColumn("__rk", row_number().over(wRank))
      .withColumn("__SB", sum(col("base")).over(wAll))
      .withColumn("alloc", (col("base") +
        when(col("__mt") > 0 &&
          col("__rk") <= lit(budget) - col("__SB"), 1L).otherwise(0L))
        .cast("long"))
      .select(col("key"), col("n"), col("w"), col("alloc"))
  }

  /**
   * Exact stratified sample: keep precisely [[proportionalAllocation]]'s
   * per-stratum seat count, winners chosen by the [[capPerKey]] ranking
   * rule (salted md5 bucket, then `idCol`) — deterministic, layout-
   * independent, and a different `salt` draws an independent sample.
   * Exactly `budget` rows survive whenever `budget ≤` corpus size and ids
   * are unique per stratum. Determinism requires that uniqueness: rows
   * DUPLICATING an id tie on the full ranking key, so which of them takes
   * a boundary seat is sort-order luck — the packing-operator defect
   * class; dedup ids first (or fold a content digest into `idCol`) if the
   * input can hold duplicates. One broadcast of the |keys|-row allocation
   * table plus one window shuffle on `keyCol`; rows with null keys drop
   * (they were never allocated seats).
   */
  def sampleProportional(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      budget: Long,
      salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alloc = proportionalAllocation(df, keyCol, budget)
      .select(col("key").as("__ak"), col("alloc").as("__alloc"))
    val bucket = hashBucket(col(idCol), DefaultBuckets, salt)
    val w = Window.partitionBy(col(keyCol)).orderBy(bucket, col(idCol))
    df.join(broadcast(alloc), col(keyCol).cast("string") === col("__ak"), "inner")
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= col("__alloc"))
      .drop("__ak", "__alloc", "__rank")
  }

  /**
   * The [[weightedAllocation]] mixture MATERIALIZED as an exact
   * repetition manifest: each row of a stratum gets an integer
   * `multiplicity` — `alloc div n` epochs for everyone, plus one more
   * for the `alloc mod n` rows ranking first under the salted md5
   * bucket rule ([[capPerKey]]'s winner order, so the manifest is
   * deterministic and layout-independent, and a different `salt` draws
   * an independent repetition pattern). Σ multiplicity per stratum =
   * its allocation exactly; Σ over the corpus = `budget` whenever any
   * positive-weight stratum exists. Rows with multiplicity 0 (the
   * un-topped remainder of a downsampled stratum, or any zero-weight
   * stratum) are dropped — the output IS the training mix.
   *
   * This is the artifact a mixture-training run consumes: upsampled
   * strata repeat (alloc > n — epoch repetition), downsampled strata
   * keep their salted-rank winners, and the whole table replays on any
   * engine. Same determinism caveat as [[sampleProportional]]: keep
   * ids unique per stratum. One broadcast of the |keys|-row allocation
   * plus one window shuffle on `keyCol`.
   */
  def sampleWeightedMixture(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      weights: Map[String, Long],
      budget: Long,
      salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alloc = weightedAllocation(df, keyCol, weights, budget)
      .select(col("key").as("__ak"), col("n").as("__an"),
        col("alloc").as("__alloc"))
    // Per-stratum rank via the sharded prefix (the shuffleOrder /
    // selectByTokenBudget boundary pattern): strata are languages/domains
    // — a handful of values — so a rank window partitioned by the key
    // alone would funnel the corpus through |keys| sort tasks. Bucket
    // values are uniform on [0, 10⁶), so 500 ORDERED bucket-range shards
    // per stratum give (key, shard) windows of ~n/(|keys|·500) rows and
    // the global rank reassembles EXACTLY as broadcast per-(key, shard)
    // prefix offsets + the in-shard rank — bit-identical to the
    // single-window rank, at |keys|×500-task parallelism.
    val bucket = hashBucket(col(idCol), DefaultBuckets, salt)
    val based = df
      .join(broadcast(alloc), col(keyCol).cast("string") === col("__ak"), "inner")
      .withColumn("__bk", bucket)
      .withColumn("__sh", expr(s"__bk DIV ${DefaultBuckets / 500}"))
    val offs = based.groupBy(col("__ak").as("__ok"), col("__sh").as("__osh"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__c")).over(Window.partitionBy(col("__ok"))
          .orderBy(col("__osh")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__ok"), col("__osh"), col("__off"))
    val wShard = Window.partitionBy(col("__ak"), col("__sh"))
      .orderBy(col("__bk"), col(idCol))
    based
      .join(broadcast(offs),
        col("__ak") === col("__ok") && col("__sh") === col("__osh"))
      .withColumn("__rank", col("__off") + row_number().over(wShard))
      .withColumn("multiplicity",
        expr("__alloc DIV __an") +
          when(col("__rank") <= col("__alloc") % col("__an"), 1L).otherwise(0L))
      .filter(col("multiplicity") > 0)
      .drop("__ak", "__an", "__alloc", "__bk", "__sh", "__ok", "__osh",
        "__off", "__rank")
  }

  /**
   * Curriculum/budget selection: admit documents in (`scoreCol` DESC,
   * `idCol` ASC) order while the running token total stays within
   * `budget` — i.e. the longest prefix of the quality ordering whose
   * cumulative `tokenCol` ≤ budget. The stage that turns "best 10B tokens"
   * into a concrete keep set.
   *
   * The naive plan — a global `sum(tokens) OVER (ORDER BY score DESC, id)`
   * — funnels the whole corpus through ONE task (an unpartitioned window
   * collapses to a single partition). Instead the prefix boundary is found
   * on the per-score histogram:
   *
   *   1. aggregate tokens per distinct score (map-side combined; the
   *      histogram is |distinct scores| rows);
   *   2. running totals over the histogram locate the single boundary
   *      score class where the prefix crosses the budget (1-row result,
   *      broadcast back via the established 1-row crossJoin convention).
   *      The running total itself is SHARDED (the [[shuffleOrder]] /
   *      [[systematicPpsSample]] prefix-sum recipe): histogram rows
   *      bucket by score range into ≤ 2¹⁶ coarse bins, per-bin totals
   *      broadcast as offsets, and the in-bin cumulative window runs
   *      `partitionBy(bin)` — so a NEAR-DISTINCT score column (q235's
   *      micro-nat means: one class per document) never funnels the
   *      histogram through one task;
   *   3. classes strictly above the boundary admit wholly with NO window
   *      at all; the within-class cumulative sum that settles the boundary
   *      class runs under `partitionBy(score)` — parallel across scores,
   *      and only the boundary class's result is ever used.
   *
   * Scores and tokens must be integral (exact thresholds, engine-portable);
   * the per-class tiebreak by `idCol` makes the kept set run-deterministic
   * under duplicate scores — provided `idCol` is unique (duplicate
   * (score, id) pairs would make the boundary-class cut tie-order-
   * dependent, the exact defect the packing operators guard against). Total ≤ budget → everything admits (boundary
   * null). Skew note: step 3's shuffle keys by score — a corpus where one
   * score class dominates inherits that class's skew, but only rank
   * arithmetic (no text) crosses the wire.
   */
  def selectByTokenBudget(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      scoreCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType)
        .contains(df.schema(scoreCol).dataType),
      s"selectByTokenBudget: scoreCol '$scoreCol' must be integral " +
        s"(got ${df.schema(scoreCol).dataType}) — the documented exact-" +
        "threshold contract, and the range-bin prefix shards key on it")
    import org.apache.spark.sql.expressions.Window
    // Checkpointed lazily: the histogram feeds both its own (lo, hi)
    // range probe and the binned cumulative — one aggregation pass.
    val hist = df.groupBy(col(scoreCol).as("__s"))
      .agg(sum(col(tokenCol)).as("__t"))
      .localCheckpoint(eager = false)
    // Sharded descending prefix sum over the histogram: score-range bins
    // keep the mapping monotonic (ordering by (bin DESC, score DESC) ==
    // score DESC), per-bin offsets broadcast, in-bin windows parallel.
    // DECIMAL(38,0) keeps the bin arithmetic exact at any score span.
    val mm = hist.agg(min(col("__s").cast("long")),
      max(col("__s").cast("long"))).head()
    val (lo, hi) =
      if (mm.isNullAt(0)) (0L, 0L) else (mm.getLong(0), mm.getLong(1))
    val width = (((BigInt(hi) - BigInt(lo)) >> 16) + 1).toLong
    val bin = floor((col("__s").cast("decimal(38,0)") -
        lit(lo).cast("decimal(38,0)")) /
        lit(width).cast("decimal(38,0)")).cast("long").as("__bin")
    val histB = hist.select(col("__s"), col("__t"), bin)
    val offs = histB.groupBy("__bin").agg(sum("__t").as("__bt"))
      .withColumn("__boff",
        coalesce(sum(col("__bt")).over(Window.orderBy(col("__bin").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bin", "__boff")
    val wInBin = Window.partitionBy(col("__bin")).orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = histB.join(broadcast(offs), "__bin")
      .withColumn("__cum", col("__boff") + sum(col("__t")).over(wInBin))
      .withColumn("__before", col("__cum") - col("__t"))
      .agg(
        max(when(col("__before") <= budget && col("__cum") > budget, col("__s")))
          .as("__b_score"),
        max(when(col("__before") <= budget && col("__cum") > budget, col("__before")))
          .as("__b_base"))
    val wClass = Window.partitionBy(col(scoreCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.crossJoin(broadcast(boundary))
      .withColumn("__run", sum(col(tokenCol)).over(wClass))
      .where(col("__b_score").isNull ||
        col(scoreCol) > col("__b_score") ||
        (col(scoreCol) === col("__b_score") &&
          col("__run") <= lit(budget) - col("__b_base")))
      .drop("__b_score", "__b_base", "__run")
  }

  /**
   * Systematic PPS (probability-proportional-to-size) sampling: draw
   * EXACTLY `k` units (with multiplicity) where each unit's expected draw
   * count is `k·w/W` — the token-weighted corpus draw ("sample documents
   * proportional to token count") behind mixture construction and
   * weighted eval subsets. Classic systematic PPS: lay the units on a
   * 0..W weight line in a salt-shuffled deterministic order, take the k
   * positions `p_m = (m·W) div k` (m = 0..k−1), and a unit is drawn once
   * per position inside its [cum, cum+w) span. A unit heavier than W/k
   * can be drawn multiple times — that's the with-replacement semantics
   * of classic PPS, reported in `multiplicity` rather than hidden.
   *
   * Returns the sampled rows only: (id, weight, multiplicity ≥ 1), with
   * Σ multiplicity = k exactly (the positions partition among spans —
   * spec-pinned). All arithmetic is integer; the `cum·k` products run in
   * DECIMAL(38,0), so the sample is exact and engine-replayable at any
   * W·k magnitude.
   *
   * Scale shape: the weight line is the [[shuffleOrder]] trick — 256
   * md5-prefix buckets, per-bucket weight totals → broadcast prefix
   * offsets → in-bucket cumulative window — so no single-task global
   * window ever sees the corpus. Zero-weight units are excluded (they
   * can never be drawn). Determinism caveat (the [[sampleProportional]]
   * convention): duplicate ids with DIFFERENT weights make the span
   * order tie-dependent; keep ids unique.
   */
  def systematicPpsSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Long,
      salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .select(col(idCol).as("id"), col(weightCol).cast("long").as("weight"))
      .where(col("weight") > 0)
      .withColumn("__k", md5(concat_ws("|", lit(salt), col("id").cast("string"))))
      .withColumn("__b", substring(col("__k"), 1, 2))
    val buckets = keyed.groupBy("__b").agg(sum(col("weight")).as("__bw"))
    val hist = buckets
      .withColumn("__offset",
        coalesce(sum(col("__bw")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__b", "__offset")
    val total = buckets.agg(sum(col("__bw")).as("__W"))
    val wb = Window.partitionBy(col("__b"))
      .orderBy(col("__k"), col("id").cast("string"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(hist), Seq("__b"))
      .crossJoin(broadcast(total))
      .withColumn("__cb", col("__offset") + sum(col("weight")).over(wb) - col("weight"))
      .withColumn("__ce", col("__cb") + col("weight"))
      // #positions in [cb, ce): ceil(ce·k/W) − ceil(cb·k/W), exact in
      // DECIMAL(38,0); ce ≤ W caps the upper term at k by construction
      .withColumn("multiplicity", expr(
        s"""CAST((CAST(__ce AS DECIMAL(38,0)) * $k + __W - 1) div __W
           |   - (CAST(__cb AS DECIMAL(38,0)) * $k + __W - 1) div __W
           | AS BIGINT)""".stripMargin))
      .where(col("multiplicity") > 0)
      .select(col("id"), col("weight"), col("multiplicity"))
  }
}
