package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AhoCorasick
import graft.functions.TextPolicyFunctions.{contains_any_phrase, normalize_text}
import graft.xml.SparkTestSession

class TextPolicySuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- normalize_text ----

  test("normalize_text: NFC + lowercase + whitespace collapse + trim") {
    val df = Seq(
      ("CAFÉ  Du\tMonde\n"),       // decomposed accent, mixed whitespace
      ("  \t leading and trailing \r"),
      ("already clean"),
      ("")
    ).toDF("t").select(normalize_text(col("t")).as("n"))
    val out = df.as[String].collect()
    assert(out(0) === "café du monde") // é precomposed (NFC)
    assert(out(1) === "leading and trailing")
    assert(out(2) === "already clean")
    assert(out(3) === "")
  }

  test("normalize_text: null in, null out; vertical tab NOT treated as whitespace") {
    val df = Seq(Option.empty[String], Some("ab")).toDF("t")
      .select(normalize_text(col("t")).as("n"))
    val out = df.collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getString(0) === "ab") // \x0B preserved (RE2 parity)
  }

  test("normalize_text is idempotent") {
    val inputs = Seq("CAFÉ x", " A  B ", "mixed\tCASE\n", "ümlaut Ünïon")
    val once = inputs.toDF("t").select(normalize_text(col("t")).as("n")).as[String].collect()
    val twice = once.toSeq.toDF("t").select(normalize_text(col("t")).as("n")).as[String].collect()
    assert(once.toSeq === twice.toSeq)
  }

  // ---- AhoCorasick: unit-level vs brute force ----

  private def bruteContains(text: String, phrases: Seq[String]): Boolean =
    phrases.exists(text.contains)

  test("aho-corasick matches brute force on random texts and overlapping phrases") {
    val rnd = new Random(42)
    val alphabet = "abc"
    val phrases = Seq("ab", "abc", "bca", "cab", "aab", "ccc", "abcabc")
    val ac = new AhoCorasick(phrases)
    (0 until 500).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(3))).mkString
      val got = ac.containsAny(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      assert(got === bruteContains(text, phrases), s"text='$text'")
    }
  }

  test("aho-corasick: dictionary-suffix phrases are found (terminal via fail links)") {
    // "her" ends inside a walk that is mid-"mother" — the suffix link must fire.
    val ac = new AhoCorasick(Seq("mother", "her"))
    assert(ac.containsAny(org.apache.spark.unsafe.types.UTF8String.fromString("xmothx her")))
    assert(ac.containsAny(org.apache.spark.unsafe.types.UTF8String.fromString("smothering")))
    assert(!ac.containsAny(org.apache.spark.unsafe.types.UTF8String.fromString("hero".take(2))))
  }

  test("contains_any_phrase column matches a contains() chain on a corpus") {
    val rnd = new Random(9)
    val words = Seq("key", "agg", "row", "scan", "slow", "fast", "table", "merge")
    val docs = (0 until 300).map { i =>
      (i.toLong, Seq.fill(4 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val phrases = Seq("slow scan", "fast merge", "agg row scan")
    val viaAc = docs.select(col("doc_id"),
      contains_any_phrase(col("text"), phrases).as("b"))
    val viaChain = docs.select(col("doc_id"),
      phrases.map(p => col("text").contains(p)).reduce(_ || _).as("b"))
    assert(viaAc.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq ===
      viaChain.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq)
  }
}
