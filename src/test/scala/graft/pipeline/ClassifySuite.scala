package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class ClassifySuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta alpha gamma", true),
    (1L, "alpha beta delta", true),
    (2L, "zeta eta theta zeta", false),
    (3L, "eta theta iota kappa", false),
    (4L, "alpha zeta", false),
    (5L, "", false),
    (6L, null.asInstanceOf[String], true)
  ).toDF("id", "text", "y")

  test("nbTrainHashed: full grid, counts, prior row, smoothed LLR sign") {
    val B = 16
    val w = Classify.nbTrainHashed(docs, "text", col("y"), B).collect()
    assert(w.length === B + 2)
    val byBucket = w.map(r => r.getInt(0) -> r).toMap
    assert(byBucket.contains(-1), "prior row present")
    assert(byBucket(-2).getLong(3) === B.toLong, "bucket-count row present")
    // prior: 3 positive docs (incl. the null-text one), 4 negative
    assert(byBucket(-1).getLong(1) === 3L)
    assert(byBucket(-1).getLong(2) === 4L)
    assert(byBucket(-1).getLong(3) ===
      math.round(math.log(4.0 / 5.0) * 1e6))
    // occurrence totals: 7 positive tokens, 10 negative
    val nPos = w.filter(_.getInt(0) >= 0).map(_.getLong(1)).sum
    val nNeg = w.filter(_.getInt(0) >= 0).map(_.getLong(2)).sum
    assert(nPos === 7L && nNeg === 10L)
    // an empty bucket still gets the smoothed LLR of (0, 0) counts
    val empty = w.find(r => r.getInt(0) >= 0 &&
      r.getLong(1) == 0L && r.getLong(2) == 0L)
    empty.foreach { r =>
      val exp = math.round(
        (math.log(1.0 / (nPos + B)) - math.log(1.0 / (nNeg + B))) * 1e6)
      assert(r.getLong(3) === exp)
    }
    // every LLR is the closed form of its own counts
    w.filter(_.getInt(0) >= 0).foreach { r =>
      val exp = math.round(
        (math.log((r.getLong(1) + 1.0) / (nPos + B)) -
          math.log((r.getLong(2) + 1.0) / (nNeg + B))) * 1e6)
      assert(r.getLong(3) === exp, s"bucket ${r.getInt(0)}")
    }
  }

  test("nbScoreHashed: map-side sums equal a brute-force replay; nulls safe") {
    val B = 16
    val w = Classify.nbTrainHashed(docs, "text", col("y"), B)
    val got = Classify.nbScoreHashed(docs, "id", "text", w)
      .orderBy("id").collect()
    assert(got.length === 7)
    // brute force on the driver with the SAME collected weights
    val rows = w.collect()
    val prior = rows.find(_.getInt(0) == -1).get.getLong(3)
    val llr = rows.filter(_.getInt(0) >= 0)
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    def bucket(tok: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h, 16) % B).toInt
    }
    docs.collect().foreach { d =>
      val id = d.getLong(0)
      val text = Option(d.getString(1)).getOrElse("")
      val toks = if (text.trim.isEmpty) Array.empty[String]
        else text.trim.split("\\s+")
      val sum = toks.map(t => llr(bucket(t))).sum
      val g = got.find(_.getLong(0) == id).get
      assert(g.getInt(1) === toks.length, s"n_tokens id=$id")
      assert(g.getLong(2) === sum, s"nb_sum id=$id")
      if (toks.nonEmpty) assert(g.getLong(3) === sum / toks.length)
      else assert(g.isNullAt(3))
      assert(g.getInt(4) === (if (sum + prior > 0) 1 else 0))
    }
    // the positive-vocabulary doc classifies positive, the negative one negative
    val g0 = got.find(_.getLong(0) == 0L).get
    val g2 = got.find(_.getLong(0) == 2L).get
    assert(g0.getInt(4) === 1 && g2.getInt(4) === 0)
  }

  test("nbScoreHashed scoring plan has no shuffle") {
    val w = Classify.nbTrainHashed(docs, "text", col("y"), 16)
    val plan = Classify.nbScoreHashed(docs, "id", "text", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free scoring:\n$plan")
  }

  test("dsirLogRatios: bigram log-ratio sums match a driver replay") {
    val B = 32
    val got = Classify.dsirLogRatios(docs, "id", "text", col("y"), B)
      .orderBy("id").collect()
    assert(got.length === 7)
    def bucket(bg: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h, 16) % B).toInt
    }
    val all = docs.collect().map { d =>
      val toks = Option(d.getString(1)).map(_.trim).filter(_.nonEmpty)
        .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
      (d.getLong(0), d.getBoolean(2),
        toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq)
    }
    val occ = all.flatMap { case (_, y, bgs) => bgs.map(b => (y, bucket(b))) }
    val nT = occ.count(_._1).toLong
    val nR = occ.length.toLong
    val byB = occ.groupBy(_._2)
    val lam = byB.map { case (b, os) =>
      b -> math.round((math.log((os.count(_._1) + 1.0) / (nT + B)) -
        math.log((os.length + 1.0) / (nR + B))) * 1e6)
    }
    all.foreach { case (id, _, bgs) =>
      val g = got.find(_.getLong(0) == id).get
      assert(g.getLong(1) === bgs.length.toLong, s"n_bigrams id=$id")
      val sum = bgs.map(b => lam(bucket(b))).sum
      assert(g.getLong(2) === sum, s"dsir id=$id")
      if (bgs.nonEmpty) assert(g.getLong(3) === sum / bgs.length)
      else assert(g.isNullAt(3))
    }
    // target-vocabulary docs rank above non-target ones on the mean
    val mean = got.filter(!_.isNullAt(3)).map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(mean(0L) > mean(2L) && mean(1L) > mean(3L))
  }

  test("kAnonymityReport flags small and homogeneous classes") {
    val rows = Seq(
      // class ("a", 0): 3 rows, 3 users — violates k=4, not l=2
      ("a", 0L, 1L), ("a", 0L, 2L), ("a", 0L, 3L),
      // class ("a", 1): 5 rows, 1 user — violates l, not k
      ("a", 1L, 9L), ("a", 1L, 9L), ("a", 1L, 9L), ("a", 1L, 9L), ("a", 1L, 9L),
      // class ("b", 0): 4 rows, 2 users — violates neither
      ("b", 0L, 1L), ("b", 0L, 1L), ("b", 0L, 2L), ("b", 0L, 2L)
    ).toDF("seg", "day", "uid")
    val rep = Profile.kAnonymityReport(rows, Seq("seg", "day"), "uid", k = 4, l = 2)
      .orderBy("seg", "day").collect()
    assert(rep.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getInt(4), r.getInt(5))).toSeq === Seq(
      ("a", 0L, 3L, 3L, 1, 0),
      ("a", 1L, 5L, 1L, 0, 1),
      ("b", 0L, 4L, 2L, 0, 0)))
  }

  test("pseudonymize is deterministic, salt-sensitive, and join-preserving") {
    val df = Seq((1L, "u1"), (2L, "u1"), (3L, "u2")).toDF("id", "u")
    val p = df.select(col("id"), Profile.pseudonymize(col("u"), "s1").as("pu"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(p(1L) === p(2L))
    assert(p(1L) !== p(3L))
    val p2 = df.select(Profile.pseudonymize(col("u"), "s2").as("pu"))
      .collect().map(_.getString(0))
    assert(!p2.contains(p(1L)), "different salt must re-key")
  }

  test("dsirFitLambda: dense grid; stored-table scoring == one-shot refit") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", true),
      (2L, "lorem ipsum dolor sit amet consectetur", false),
      (3L, "the quick brown cat", true),
      (4L, "zz yy xx ww vv", false),
      (5L, "single", false),
      (6L, null.asInstanceOf[String], false)
    ).toDF("id", "text", "y")
    val lam = Classify.dsirFitLambda(docs, "text", col("y"), buckets = 32)
    val rows = lam.collect()
    assert(rows.length === 33) // 32 bucket rows + the count metadata row
    assert(rows.map(_.getInt(0)).filter(_ >= 0).sorted.toSeq === (0 until 32))
    assert(rows.find(_.getInt(0) == -2).get.getLong(3) === 32L)
    // Serve from the materialized table == the one-shot fit-and-score,
    // including a FRESH batch with bigrams the fit never saw (they score
    // through the dense grid's smoothed weights, no fallback path).
    val batch = Seq((10L, "the quick zebra gallops"), (11L, "totally novel grams here"))
      .toDF("id", "text")
    val served = Classify.dsirScoreHashed(batch, "id", "text", lam)
      .orderBy("id").collect().toSeq
    val refit = Classify.dsirScoreHashed(batch, "id", "text",
        Classify.dsirFitLambda(docs, "text", col("y"), buckets = 32))
      .orderBy("id").collect().toSeq
    assert(served === refit)
    assert(served.forall(_.getLong(1) > 0))
    // one-shot API == fit∘score composition on the fit corpus itself
    val oneShot = Classify.dsirLogRatios(docs, "id", "text", col("y"), 32)
      .orderBy("id").collect().toSeq
    val composed = Classify.dsirScoreHashed(docs, "id", "text", lam)
      .orderBy("id").collect().toSeq
    assert(oneShot === composed)
    // null text / single token: 0 bigrams, null mean
    assert(oneShot.find(_.getLong(0) == 6L).get.getLong(1) === 0L)
    assert(oneShot.find(_.getLong(0) == 5L).get.isNullAt(3))
  }

  test("corrupted stored model grids fail fast (dense-grid validation)") {
    val docs = Seq((1L, "a b c", true), (2L, "d e f", false)).toDF("id", "text", "y")
    val lam = Classify.dsirFitLambda(docs, "text", col("y"), buckets = 16)
    val holed = lam.where(col("bucket") =!= 7)
    val e1 = intercept[IllegalArgumentException] {
      Classify.dsirScoreHashed(docs, "id", "text", holed)
    }
    assert(e1.getMessage.contains("dense"))
    val nb = Classify.nbTrainHashed(docs, "text", col("y"), buckets = 16)
    val e2 = intercept[IllegalArgumentException] {
      Classify.nbScoreHashed(docs, "id", "text", nb.where(col("bucket") =!= 3))
    }
    assert(e2.getMessage.contains("dense"))
    // truncated-top corruption (the silently-changed-modulus hazard)
    val e3 = intercept[IllegalArgumentException] {
      Classify.nbScoreHashed(docs, "id", "text", nb.where(col("bucket") < 12))
    }
    assert(e3.getMessage.contains("dense"))
  }
}
