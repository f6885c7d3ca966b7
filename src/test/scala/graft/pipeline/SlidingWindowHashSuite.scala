package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashFunctions
import graft.xml.SparkTestSession

/**
 * The one-pass sliding-window hasher behind
 * [[Dedup.repeatedPassageSpans]]: position/stride mapping, the
 * equal-window ⇒ equal-hash contract the span join relies on, code-point
 * (not UTF-16 unit) indexing, and edge shapes (short text, null,
 * exact-length text).
 */
class SlidingWindowHashSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hashesOf(text: String, w: Int, stride: Int): Seq[Long] = {
    val df = Seq(Tuple1(text)).toDF("text")
    df.select(TextHashFunctions.sliding_window_hashes(col("text"), w, stride)
        .as("h"))
      .head().getSeq[Long](0)
  }

  test("window count and identical-window equality at stride") {
    val t = "abcdefabcdefabcdef" // len 18
    val hs = hashesOf(t, 6, 6)   // windows at 0, 6, 12 — all "abcdef"
    assert(hs.length == 3)
    assert(hs.distinct.length == 1)
  }

  test("equal windows across documents hash equal; unequal differ") {
    val passage = "P" * 32 // exactly windowLen chars
    val a = hashesOf("xxxx" + passage + "yyyy", 32, 1)
    val b = hashesOf("zz" + passage + "qq", 32, 1)
    // the shared 32-char window appears at offset 4 in a, 2 in b
    assert(a(4) == b(2))
    assert(a(0) != b(0))
  }

  test("matches the naive per-window recomputation (pos i maps to i*stride)") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val w = 8; val stride = 3
    val hs = hashesOf(t, w, stride)
    assert(hs.length == (t.length - w) / stride + 1)
    hs.zipWithIndex.foreach { case (h, i) =>
      val window = t.substring(i * stride, i * stride + w)
      // hashing the isolated window (stride 1, exact length) must agree
      assert(hashesOf(window, w, 1) == Seq(h),
        s"window at ${i * stride} disagrees with isolated hash")
    }
  }

  test("code-point indexing: supplementary chars count once") {
    // U+1F600 is 2 UTF-16 units but one code point; 4 cps total
    val t = "a😀b😀" // a 😀 b 😀
    val hs = hashesOf(t, 2, 2)
    assert(hs.length == 2) // windows [a😀], [b😀]
    // same two-cp windows built standalone agree
    assert(hashesOf("a😀", 2, 1) == Seq(hs(0)))
    assert(hashesOf("b😀", 2, 1) == Seq(hs(1)))
  }

  test("short text yields empty array; exact-length text yields one") {
    assert(hashesOf("abc", 4, 1).isEmpty)
    assert(hashesOf("abcd", 4, 1).length == 1)
    val df = Seq(Tuple1(null: String)).toDF("text")
    val r = df.select(TextHashFunctions.sliding_window_hashes(
      col("text"), 4, 1).as("h")).head()
    assert(r.isNullAt(0))
  }

  /** The previous implementation's algorithm, verbatim: JDK String
    * code-point walk + FNV-1a/fmix64 per window — the parity reference
    * for the byte-walking rewrite. */
  private def referenceHashes(t: String, w: Int, stride: Int): Seq[Long] = {
    val n = t.codePointCount(0, t.length)
    if (n < w) return Seq.empty
    val cps = new Array[Int](n)
    var ci = 0; var k = 0
    while (ci < t.length) {
      val cp = t.codePointAt(ci); cps(k) = cp; k += 1
      ci += Character.charCount(cp)
    }
    (0 to (n - w) / stride).map { i =>
      var h = 0xcbf29ce484222325L
      var j = i * stride
      while (j < i * stride + w) { h = (h ^ cps(j)) * 0x100000001b3L; j += 1 }
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      h
    }
  }

  test("byte-walk decode matches the String code-point reference") {
    val texts = Seq(
      "plain ascii text with spaces",
      "héllo wörld ünïcode two-byte",  // 2-byte seqs
      "日本語のテキスト", // 3-byte seqs
      "mix 😀 of 4-byte 🚀 and ascii",
      "߿ࠀ� boundary code points 𐀀")
    for (t <- texts; w <- Seq(2, 5); st <- Seq(1, 3)) {
      assert(hashesOf(t, w, st) == referenceHashes(t, w, st),
        s"text=$t w=$w stride=$st")
    }
  }

  test("malformed UTF-8 falls back to the JDK replacement decode") {
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq(
      Array[Byte]('a', 'b', 0xc3.toByte, 'x', 'y', 'z'),     // truncated 2-byte
      Array[Byte]('a', 0xed.toByte, 0xa0.toByte, 0x80.toByte, 'b', 'c'), // surrogate
      Array[Byte](0xc0.toByte, 0xaf.toByte, 'q', 'r', 's'),  // overlong
      Array[Byte]('x', 'y', 0xff.toByte, 'z', 'w'))          // invalid lead
    for (bytes <- cases) {
      val u = UTF8String.fromBytes(bytes)
      val got = graft.functions.SlidingWindowHashUtil.compute(u, 2, 1)
        .toLongArray().toSeq
      assert(got == referenceHashes(u.toString, 2, 1), u.toString)
    }
  }

  test("repeatedPassageReport over the new hasher: planted copy detected") {
    val passage = "SHARED-PASSAGE-" + ("x" * 64)
    val docs = Seq(
      (1L, "aaa " + passage + " bbb"),
      (2L, "ccc " + passage + " ddd"),
      (3L, "nothing in common here at all, completely distinct text body"))
      .toDF("doc_id", "text")
    val rep = Dedup.repeatedPassageReport(docs, "doc_id", "text",
        windowLen = 32, stride = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rep(1L) > 0 && rep(2L) > 0)
    assert(rep(3L) == 0)
  }
}
