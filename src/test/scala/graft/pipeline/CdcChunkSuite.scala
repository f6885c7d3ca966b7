package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CdcChunks, TextHashFunctions}
import graft.xml.SparkTestSession

/**
 * Content-defined chunking: structural invariants (chunks tile the text,
 * length bounds hold), the locality property that is CDC's entire reason
 * to exist (an edit only perturbs nearby chunks; fixed blocking shifts
 * everything after it), and the report's aggregation arithmetic.
 */
class CdcChunkSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunksOf(text: String, maskBits: Int = 4, minLen: Int = 8,
      maxLen: Int = 64): Seq[(Int, Int, String)] = {
    val df = Seq(Tuple1(text)).toDF("text")
    df.select(explode(TextHashFunctions.cdc_chunks(col("text"), maskBits, minLen, maxLen)).as("c"))
      .select(col("c.idx"), col("c.len"), col("c.hash"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
  }

  // deterministic pseudo-random text, no java Random needed
  private def synth(n: Int, seed: Int): String = {
    val sb = new StringBuilder
    var x = seed
    (0 until n).foreach { _ =>
      x = (x * 48271) % 2147483647
      sb.append(('a' + (x % 26)).toChar)
    }
    sb.toString
  }

  test("chunks tile the text: lens sum to length, bounds hold, idx dense") {
    val t = synth(500, 7)
    val cs = chunksOf(t)
    assert(cs.map(_._2).sum === t.length)
    assert(cs.map(_._1) === cs.indices)
    cs.init.foreach { case (_, len, _) =>
      assert(len >= 8 && len <= 64, s"interior chunk len $len out of bounds")
    }
    assert(cs.last._2 <= 64)
    // identical input -> identical chunking (pure function of content)
    assert(chunksOf(t) === cs)
  }

  test("maxLen forces cuts; repeated content yields repeated chunk hashes") {
    // maskBits=30 ~ never a natural cut, so every chunk is maxLen-forced
    val cs = chunksOf("a" * 10, maskBits = 30, minLen = 1, maxLen = 4)
    assert(cs.map(_._2) === Seq(4, 4, 2))
    assert(cs(0)._3 === cs(1)._3)       // both are md5("aaaa")
    assert(cs(0)._3 !== cs(2)._3)
  }

  test("locality: chunks before an edit are untouched; chunks re-align after it") {
    val a = synth(400, 11)
    val tail1 = synth(300, 22)
    val tail2 = synth(300, 33)
    val c1 = chunksOf(a + tail1)
    val c2 = chunksOf(a + tail2)
    // boundary decisions depend only on content up to the boundary, so the
    // chunk sequences agree while they end inside the shared prefix
    val ends1 = c1.scanLeft(0)(_ + _._2).tail
    val shared = c1.zip(c2).zip(ends1).takeWhile { case (_, e) => e <= a.length }
    assert(shared.nonEmpty, "no chunk completed inside the 400-char shared prefix")
    shared.foreach { case ((x, y), _) => assert(x === y) }
    // an INSERTION at the front: content-defined boundaries re-synchronize,
    // so a long common suffix of chunk hashes survives — the exact failure
    // mode of fixed-width blocking, where every downstream block shifts
    val t = a + tail1
    val ins = chunksOf("XYZ" + t)
    val suffixShared = c1.map(_._3).reverse.zip(ins.map(_._3).reverse)
      .takeWhile { case (x, y) => x == y }.length
    assert(suffixShared >= 3,
      s"chunking failed to re-align after a front insertion ($suffixShared shared)")
  }

  test("empty and null text are safe; unicode code points count once") {
    val df = Seq(Tuple1(""), Tuple1(null.asInstanceOf[String])).toDF("text")
    val out = df.select(TextHashFunctions.cdc_chunks(col("text"), 4, 8, 64).as("c"))
      .collect()
    assert(out(0).getSeq[Any](0).isEmpty)
    assert(out(1).isNullAt(0))
    // astral-plane char (surrogate pair) counts one code point, not two
    val emoji = "😀" // U+1F600
    val cs = chunksOf(emoji * 5, maskBits = 30, minLen = 1, maxLen = 2)
    assert(cs.map(_._2) === Seq(2, 2, 1))
  }

  test("gear constants match the SQL formula ('0x' || substr(md5('gear'||c),1,15))") {
    // independent recomputation through BigInteger parsing of the hex
    Seq(97, 0x1F600, 32, 10).foreach { cp =>
      val hex = CdcChunks.md5Hex("gear" + cp.toString).substring(0, 15)
      assert(CdcChunks.gear(cp) === java.lang.Long.parseLong(hex, 16))
    }
  }

  test("cdcTransferDiff: identical is fully reused, disjoint fully new, edits partial") {
    val t = synth(400, 9)
    val u = synth(400, 10)
    val v1 = Seq((0L, t, "s")).toDF("doc_id", "text", "source")
    def diff(newTexts: Seq[String]) = {
      val v2 = newTexts.zipWithIndex.map { case (x, i) => (i.toLong, x, "s") }
        .toDF("doc_id", "text", "source")
      TextAnalysis.cdcTransferDiff(v1, v2, "text", Seq("source"),
        maskBits = 4, minLen = 8, maxLen = 64).collect().head
    }
    val same = diff(Seq(t))
    assert(same.getLong(2) === same.getLong(1))      // all chunks reused
    assert(same.getLong(6) === 1000L)                // full permille reuse
    val disjoint = diff(Seq(u))
    assert(disjoint.getLong(2) === 0L && disjoint.getLong(6) === 0L)
    // a tail edit: CDC locality keeps the untouched prefix's chunks reused
    val edited = diff(Seq(t + " edited tail"))
    assert(edited.getLong(2) > 0L, "prefix chunks should re-align and reuse")
    assert(edited.getLong(5) > 0L, "the edited tail must produce new chunks")
    assert(edited.getLong(6) > 0L && edited.getLong(6) < 1000L)
  }

  test("cdcReuseAgainstLedger: zero-shuffle probe matches ledger membership") {
    val t = synth(400, 13)
    val u = synth(400, 14)
    val corpus = Seq((0L, t)).toDF("id", "text")
    val ledger = TextAnalysis.cdcLedgerHashes(
      TextAnalysis.cdcChunkLedger(corpus, "text", 4, 8, 64))
    val probe = Seq((10L, t), (11L, u), (12L, t + " tail edit"), (13L, ""))
      .toDF("id", "text")
    val out = TextAnalysis.cdcReuseAgainstLedger(probe, "id", "text", ledger, 4, 8, 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val k = chunksOf(t).length
    assert(out(10L) === ((k.toLong, k.toLong, Some(1000L))))  // identical: all reused
    assert(out(11L)._2 === 0L)                                 // unrelated: none
    assert(out(12L)._2 > 0L && out(12L)._2 < out(12L)._1)      // edit: partial
    assert(out(13L) === ((0L, 0L, None)))                      // chunkless: null rate
    // the probe is a pure map plan: no exchange, no join
    val plan = TextAnalysis.cdcReuseAgainstLedger(probe, "id", "text", ledger, 4, 8, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"probe must stay map-side:\n$plan")
  }

  test("cdcChunkReport: hand-checked duplication arithmetic") {
    // two identical docs + one unique: the identical pair's chunks all
    // duplicate, so n_chunks = 2·k + m, distinct = k + m
    val t = synth(300, 5)
    val u = synth(300, 6)
    val df = Seq((0L, t, "s"), (1L, t, "s"), (2L, u, "s")).toDF("doc_id", "text", "source")
    val k = chunksOf(t).length
    val m = chunksOf(u).length
    val r = TextAnalysis.cdcChunkReport(df, "text", Seq("source"),
      maskBits = 4, minLen = 8, maxLen = 64).collect().head
    assert(r.getLong(1) === 2L * k + m)
    assert(r.getLong(2) === k.toLong + m) // distinct (synth streams differ)
    assert(r.getLong(3) === 900L)
    assert(r.getLong(4) === (r.getLong(1) - r.getLong(2)) * 1000 / r.getLong(1))
  }
}
