package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class CorpusAnalyticsSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- removeBoilerplateLines ----

  private def boiler = Seq(
    (0L, "unique zero\ncookie banner\nmore zero"),
    (1L, "unique one\ncookie banner"),
    (2L, "unique two\ncookie banner"),
    (3L, "cookie banner\n\n  \nunique three"),  // empty + blank lines survive
    (4L, "only unique content here"),
    (5L, "")                                     // empty doc -> cleaned ""
  ).toDF("doc_id", "text")

  test("boilerplate lines vanish everywhere; order, blanks, empty docs survive") {
    val out = TextAnalysis.removeBoilerplateLines(boiler, "doc_id", "text", maxDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "unique zero\nmore zero")
    assert(out(1L) === "unique one")
    assert(out(2L) === "unique two")
    assert(out(3L) === "\n  \nunique three") // blank/whitespace lines kept
    assert(out(4L) === "only unique content here")
    assert(out(5L) === "")
  }

  test("boilerplate threshold is strict: df == maxDocs is kept") {
    val out = TextAnalysis.removeBoilerplateLines(boiler, "doc_id", "text", maxDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "unique one\ncookie banner") // df=4, not > 4
  }

  test("boilerplate match is on trimmed content but emits the original line") {
    val docs = Seq(
      (0L, "  padded banner  \nkeep me"),
      (1L, "padded banner\nother"),
      (2L, "\tpadded banner\nmore")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text", maxDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(0L -> "keep me", 1L -> "other", 2L -> "more"))
  }

  test("doc repeating a boilerplate line many times counts once toward df") {
    val docs = Seq(
      (0L, "spam\nspam\nspam\nreal"),   // 3 occurrences, 1 doc
      (1L, "alpha"),
      (2L, "beta")
    ).toDF("doc_id", "text")
    // df(spam)=1, not 3: must survive maxDocs=2
    val out = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text", maxDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "spam\nspam\nspam\nreal")
  }

  // ---- sourceOverlapMatrix ----

  test("source overlap counts distinct shared contents per sorted pair") {
    val docs = Seq(
      (0L, "shared alpha", "a"),
      (1L, "shared alpha", "b"),   // alpha: a,b
      (2L, "shared alpha", "b"),   // duplicate within b: counted once
      (3L, "shared beta", "a"),
      (4L, "shared beta", "c"),    // beta: a,c
      (5L, "shared gamma", "a"),
      (6L, "shared gamma", "b"),
      (7L, "shared gamma", "c"),   // gamma: a,b,c -> three pairs
      (8L, "lonely", "a")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlapMatrix(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("a", "b") -> 2L,  // alpha, gamma
      ("a", "c") -> 2L,  // beta, gamma
      ("b", "c") -> 1L)) // gamma
  }

  // ---- hexHashNearDupPairs ----

  test("hex-hash near-dup pairs equal quadratic brute force at radius <= 3") {
    val rnd = new scala.util.Random(17)
    // 60 base hashes; half get 0-3 random bit flips applied to a clone, so
    // near pairs at every radius 0..3 (and far pairs) all occur.
    val bases = Seq.fill(60)(rnd.nextLong())
    val rows = bases.zipWithIndex.flatMap { case (h, i) =>
      val mutated = (0 until rnd.nextInt(4)).foldLeft(h)((v, _) => v ^ (1L << rnd.nextInt(64)))
      Seq((i.toLong * 2, f"$h%016x"), (i.toLong * 2 + 1, f"$mutated%016x"))
    }
    val df = rows.toDF("id", "hx")
    val got = Dedup.hexHashNearDupPairs(df, "id", "hx", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      ham = java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(ha, 16) ^ java.lang.Long.parseUnsignedLong(hb, 16))
      if ham <= 3 // radius <= 3 always band-collides (pigeonhole)
    } yield (a, b, ham)).toSet
    assert(got === brute)
    assert(brute.exists(_._3 > 0), "fixture should contain true NEAR (nonzero) pairs")
  }

  test("hex-hash near-dup: each pair emitted exactly once despite multi-band collisions") {
    // identical hashes collide on all 4 bands; emission must still be single
    val df = Seq((1L, "00ff00ff00ff00ff"), (2L, "00ff00ff00ff00ff"), (3L, "00ff00ff00ff00ff"))
      .toDF("id", "hx")
    val out = Dedup.hexHashNearDupPairs(df, "id", "hx", maxHamming = 0).collect()
    assert(out.length === 3) // (1,2),(1,3),(2,3) once each
  }

  test("hex-hash near-dup: all-identical corpus pairs stream through the collapse") {
    // 5000 byte-identical hashes: the banded join sees ONE node; the
    // 12,497,500 output pairs stream from chained generators.
    val df = spark.range(0, 5000).selectExpr("id", "'00ff00ff00ff00ff' AS hx")
    val n = Dedup.hexHashNearDupPairs(df, "id", "hx", 0).count()
    assert(n === 5000L * 4999 / 2)
  }

  // ---- corpusDiff ----

  test("corpusDiff classifies added/removed/retained distinct contents per group") {
    val v1 = Seq(
      (0L, "kept", "a"),
      (1L, "kept", "a"),      // duplicate content within a side: distinct
      (2L, "dropped", "a"),
      (3L, "edited v1", "a"),
      (4L, "mover", "a"),     // moves a -> b: removed from a, added to b
      (5L, null.asInstanceOf[String], "a"), // null text excluded
      (6L, "gone group", "c") // group only in old
    ).toDF("doc_id", "text", "source")
    val v2 = Seq(
      (10L, "kept", "a"),
      (11L, "edited v2", "a"),
      (12L, "brand new", "a"),
      (13L, "mover", "b")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.corpusDiff(v1, v2, "text", Seq("source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // a: added = edited v2 + brand new; removed = dropped + edited v1 +
    // mover; retained = kept
    assert(out("a") === (2L, 3L, 1L))
    assert(out("b") === (1L, 0L, 0L))
    assert(out("c") === (0L, 1L, 0L))
  }

  test("corpusDiff of a corpus against itself retains everything") {
    val docs = Seq((0L, "x", "a"), (1L, "y", "a"), (2L, "x", "b"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.corpusDiff(docs, docs, "text", Seq("source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === Map("a" -> (0L, 0L, 2L), "b" -> (0L, 0L, 1L)))
  }

  test("source overlap is empty when no content crosses sources") {
    val docs = Seq(
      (0L, "x", "a"), (1L, "y", "b"), (2L, "z", "c")
    ).toDF("doc_id", "text", "source")
    assert(Dedup.sourceOverlapMatrix(docs, "text", "source").count() === 0)
  }

  // ---- lexicalDiversity ----

  test("lexical diversity: hand-computed tokens, bigrams, permille ratios") {
    val docs = Seq(
      (0L, "the cat sat", "a"),   // bigrams: "the cat", "cat sat"
      (1L, "the cat ran", "a"),   // bigrams: "the cat", "cat ran"
      (2L, "solo", "b"),          // one token, zero bigrams
      (3L, "", "c"),              // tokenless -> group c absent
      (4L, null.asInstanceOf[String], "c")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.lexicalDiversity(docs, "text", Seq("source"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("a", "b"))
    val a = out("a")
    // a: 6 tokens, 4 distinct (the, cat, sat, ran); 4 bigrams, 3 distinct
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((6L, 4L, 4000L / 6)))
    assert((a.getLong(4), a.getLong(5), a.getLong(6)) === ((4L, 3L, 750L)))
    val b = out("b")
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) === ((1L, 1L, 1000L)))
    // single-token group: no bigram signal -> nulls, not zeros-div-crash
    assert(b.isNullAt(4) && b.isNullAt(5) && b.isNullAt(6))
  }

  // ---- tokenEntropyByGroup ----

  test("token entropy: degenerate is zero, uniform hits the ln(distinct) ceiling") {
    val docs = Seq(
      (0L, "aaa aaa aaa aaa", "mono"), // one distinct token -> H = 0
      (1L, "a b c d", "uni"), // 4 equiprobable -> H = ln 4 exactly
      (2L, "a a a b", "skew") // concentrated -> strictly below ceiling
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.tokenEntropyByGroup(docs, "text", Seq("source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("mono") === (4L, 1L, 0L, 0L))
    val uni = out("uni")
    assert(uni._1 === 4L && uni._2 === 4L)
    assert(uni._3 === uni._4) // uniform: entropy == max entropy
    assert(uni._4 === math.round(math.log(4.0) * 1e6)) // ln 4 micro-nats
    val skew = out("skew")
    assert(skew._3 > 0L && skew._3 < skew._4)
  }

  test("token entropy: matches the seam-rule replay on a randomized corpus") {
    val rnd = new scala.util.Random(13)
    val docs = (0L until 50L).map(i =>
      (i, Seq.fill(12)(s"t${rnd.nextInt(9)}").mkString(" "), s"s${i % 3}"))
    val got = TextAnalysis.tokenEntropyByGroup(
        docs.toDF("doc_id", "text", "source"), "text", Seq("source"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val want = docs.groupBy(_._3).map { case (src, rows) =>
      val toks = rows.flatMap(_._2.split(" "))
      val total = toks.size.toLong
      val wsum = toks.groupBy(identity).values.map { g =>
        val c = g.size.toLong
        c * math.round(math.log(total.toDouble / c) * 1e6)
      }.sum
      src -> wsum / total
    }
    assert(got === want)
  }

  test("lexical diversity: a duplicated corpus halves token TTR, keeps totals additive") {
    val base = (0L until 20L).map(i => (i, s"w$i x${i % 5} common", "s"))
    val doubled = base ++ base.map { case (i, t, s) => (i + 100, t, s) }
    def row(rows: Seq[(Long, String, String)]) =
      TextAnalysis.lexicalDiversity(rows.toDF("doc_id", "text", "source"),
        "text", Seq("source")).collect().head
    val (one, two) = (row(base), row(doubled))
    assert(two.getLong(1) === 2 * one.getLong(1))     // total tokens double
    assert(two.getLong(2) === one.getLong(2))         // distinct unchanged
    assert(two.getLong(3) === one.getLong(3) / 2 ||
      two.getLong(3) === (one.getLong(2) * 1000) / two.getLong(1))
  }
}
