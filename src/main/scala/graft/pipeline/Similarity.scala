package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{CentroidFunctions, TopKFunctions, VectorFunctions}

/**
 * Similarity search over embedding columns (`array<float>`).
 *
 * Three paths, all designed so the corpus is never cross-joined and never
 * shuffled whole:
 *  - brute-force cosine top-k — exact; queries are broadcast, the corpus
 *    streams map-side once, and a bounded-heap partial aggregate
 *    ([[graft.functions.TopKByScore]]) reduces each task to k rows before the
 *    only (tiny) shuffle
 *  - sign-LSH (random hyperplane) near-pairs — candidates from an equi-join
 *    on compact bucket keys; each pair is emitted by its *first* agreeing
 *    hash table so no distinct is needed, and vectors are joined back only
 *    for candidate ids (the shuffle moves ids + 8-byte buckets, not vectors)
 *  - IVF top-k — centroids from driver-side k-means on a bounded sample;
 *    cell assignment is a map-side argmax expression (zero shuffle), probes
 *    are broadcast, so the whole search is map-side + one k-row aggregate
 */
object Similarity {

  /** Native single-pass dot product of two numeric array columns, in double. */
  def dot(a: Column, b: Column): Column = VectorFunctions.vec_dot(a, b)

  /** L2 norm of an array column, in double. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity of two array columns (0 where either norm is 0). */
  def cosine(a: Column, b: Column): Column = VectorFunctions.vec_cosine(a, b)

  /** Explodes a top-k struct array into (query_id, rank, neighbor_id, sim) rows. */
  private def explodeTopK(grouped: DataFrame): DataFrame =
    grouped.select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("nb.neighbor_id").as("neighbor_id"), col("nb.sim").as("sim"))

  /**
   * Exact top-k nearest neighbors by cosine for each query row. `queries` is
   * broadcast; the corpus streams map-side through the scan and each task
   * reduces to a k-entry heap per query before the final aggregate shuffle
   * (O(tasks × |queries| × k) rows). Ties broken by corpus id.
   */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      corpusIdCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(corpusIdCol).as("neighbor_id"), col(vecCol).as("cv"))
    val grouped = c.join(q, col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id")
      .agg(TopKFunctions.topk_by_score(
        cosine(col("qv"), col("cv")), col("neighbor_id"), k).as("topk"))
    explodeTopK(grouped)
  }

  /**
   * Approximate near-neighbor pairs: candidates share a sign-LSH bucket in at
   * least one of `tables` independent hash tables, then exact cosine ≥
   * `threshold` re-ranking. Each pair is produced only by its first agreeing
   * table (computed from the per-table bucket arrays both sides already
   * carry), so the bucket join needs no deduplication and never moves
   * vectors; candidate ids join the vectors back afterwards.
   *
   * Recall tuning: detection probability per table is p^numPlanes with
   * p = 1 - acos(sim)/π; defaults (6 planes × 64 tables) give ≥ 0.999 at
   * sim 0.5 and ≈ 0.99 at sim 0.42.
   */
  def lshNearPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numPlanes: Int = 6,
      tables: Int = 64,
      seed: Long = 0xc0ffee00L): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val withBuckets = base.select(col("id"),
      CentroidFunctions.sign_lsh_buckets(col("v"), tables, numPlanes, dim, seed).as("bs"))
    val exploded = withBuckets
      .select(col("id"), col("bs"), posexplode(col("bs")).as(Seq("t", "b")))

    // Pair emitted only where t is the FIRST table whose buckets agree:
    // no earlier position in the two bucket arrays matches.
    val noEarlierAgreement =
      size(filter(slice(zip_with(col("l.bs"), col("r.bs"), (x, y) => x === y),
        lit(1), col("l.t")), p => p)) === 0

    val candidates = exploded.as("l").join(exploded.as("r"),
        col("l.t") === col("r.t") && col("l.b") === col("r.b") &&
          col("l.id") < col("r.id") && noEarlierAgreement)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))

    candidates
      .join(base.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /**
   * Deterministic k-means (cosine assignment, Lloyd) on a bounded id-ordered
   * sample collected to the driver — centroid training state is nlist × dim
   * doubles, so the sample pass is the only data touch and the model ships
   * inside the assignment expression.
   */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      sampleSize: Int = 4096,
      iters: Int = 10): Array[Array[Double]] = {
    val sample = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy("id").limit(sampleSize)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "empty corpus")
    val k = math.min(nlist, sample.length)
    val dim = sample(0).length

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 0.0 else d / den
    }

    // Deterministic init: evenly-strided sample rows (farthest-first seeding
    // was tried and picks outliers on near-uniform data, hurting recall).
    val stride = math.max(1, sample.length / k)
    var cents = Array.tabulate(k)(i => sample(math.min(i * stride, sample.length - 1)).clone())

    var it = 0
    while (it < iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestSim = Double.NegativeInfinity; var c = 0
        while (c < k) {
          val s = cos(v, cents(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else { val m = sums(c); var i = 0; while (i < dim) { m(i) /= counts(c); i += 1 }; m }
      }
      it += 1
    }
    cents
  }

  /**
   * IVF (inverted-file) approximate top-k: the corpus is bucketed by nearest
   * centroid via a map-side argmax expression over the (broadcast-sized)
   * centroid matrix — zero shuffle — and each query probes its `nprobe`
   * nearest cells. Probes are broadcast into the corpus scan, so the whole
   * search is map-side work plus one bounded-heap aggregate; no corpus-wide
   * shuffle anywhere in the plan.
   */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      corpusIdCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val cents = kmeansCentroids(corpus, corpusIdCol, vecCol, nlist)

    val assigned = corpus
      .select(col(corpusIdCol).as("c_id"), col(vecCol).as("c_v"))
      .withColumn("cell", CentroidFunctions.nearest_centroid(col("c_v"), cents))

    val probes = queries
      .select(col(queryIdCol).as("query_id"), col(vecCol).as("q_v"))
      .withColumn("cell",
        explode(CentroidFunctions.nearest_cells(col("q_v"), cents, nprobe)))

    val grouped = assigned.join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("c_id"))
      .groupBy("query_id")
      .agg(TopKFunctions.topk_by_score(
        cosine(col("q_v"), col("c_v")), col("c_id"), k).as("topk"))
    explodeTopK(grouped)
  }

  /**
   * Exact all-pairs cosine ≥ threshold (for oracle-checkable small inputs or
   * within-block verification). Quadratic; block before calling at scale.
   */
  def bruteForceNearPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    base.as("l").join(base.as("r"), col("l.id") < col("r.id"))
      .withColumn("sim", cosine(col("l.v"), col("r.v")))
      .filter(col("sim") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("sim"))
  }
}
