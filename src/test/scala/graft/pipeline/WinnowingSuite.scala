package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class WinnowingSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fps(
      docs: Seq[(Long, String)], k: Int = 3, w: Int = 4): Map[Long, Set[(Int, Long)]] =
    TextAnalysis.winnowingFingerprints(
        docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  /** Scala replay of robust winnowing over the same md5-60 gram hashes. */
  private def replay(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val toks = text.trim.split("\\s+").toSeq.filter(_ => text.trim.nonEmpty)
    if (toks.size < k) return Set.empty
    val hashes = toks.sliding(k).map { g =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }.toVector
    val gn = hashes.size
    (1 to math.max(1, gn - w + 1)).map { start =>
      val end = math.min(start + w - 1, gn)
      val window = (start to end).map(p => (hashes(p - 1), -p))
      val (h, np) = window.min
      (-np, h)
    }.toSet
  }

  test("fingerprints equal the rightmost-min replay, doc by doc") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "a b c d e f g h i j k l m n o p",
      3L -> "x x x x x x x x", // all grams identical: rightmost-tie path
      4L -> "alpha beta gamma") // exactly k tokens: one gram, one window
    val got = fps(docs)
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) === replay(text, 3, 4), s"doc $id")
    }
  }

  test("guarantee: a shared run of >= k+w-1 tokens shares a fingerprint") {
    val core = "one two three four five six seven eight nine ten"
    val a = 1L -> s"prefix junk words here $core"
    val b = 2L -> s"$core totally different tail content now"
    val got = fps(Seq(a, b))
    val sharedHashes =
      got(1L).map(_._2).intersect(got(2L).map(_._2))
    assert(sharedHashes.nonEmpty,
      "winnowing guarantee violated: no common fingerprint for a shared 10-token run")
  }

  test("short, empty, and null-ish docs degrade as documented") {
    // below k tokens: no row; in [k, k+w-2]: exactly one window
    val got = fps(Seq(10L -> "a b", 11L -> "a b c d", 12L -> "", 13L -> "   "))
    assert(!got.contains(10L) && !got.contains(12L) && !got.contains(13L))
    assert(got(11L).size === 1)
  }

  test("identical docs produce identical fingerprint sets") {
    val text = "repeatable content stream for dedup checks over winnowing"
    val got = fps(Seq(1L -> text, 2L -> text))
    assert(got(1L) === got(2L))
  }
}
