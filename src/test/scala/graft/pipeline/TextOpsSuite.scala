package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xml.SparkTestSession

class TextOpsSuite extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dedupLinesWithinDoc keeps first occurrences in order, zero shuffle") {
    val df = Seq(
      (0L, "a\nb\na\nc\nb\na"),
      (1L, "x"),
      (2L, "\n\nq\n\nq"), // empty lines dedup like any line
      (3L, "")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.dedupLinesWithinDoc(col("text")).as("c"))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(0L -> "a\nb\nc", 1L -> "x", 2L -> "\nq", 3L -> ""))
  }

  test("stripMarkup: blocks, tags, entities, whitespace — zero shuffle") {
    val df = Seq(
      // script payload contains a bare '<' and a fake tag; both must die
      // with the block, not confuse the tag stripper.
      (0L, """<html><script a=1>if (1 < 2) { s = "<p>"; }</script>""" +
        """<style>.c { x: y; }</style><body><!-- c --><p>hi</p></body>"""),
      // entities decode AFTER tag strip; &amp; decodes LAST (one level).
      (1L, "<b>a</b>&nbsp;&lt;p&gt;&quot;q&quot;&#39;s &amp;amp; b"),
      // unterminated tag stays as text (permissive truncated-crawl rule);
      // whitespace collapses to single spaces.
      (2L, "x  <unclosed y\t\nz"),
      (3L, "")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.stripMarkup(col("text")).as("c"))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(0L) === "hi")
    assert(m(1L) === "a <p>\"q\"'s &amp; b")
    assert(m(2L) === "x <unclosed y z")
    assert(m(3L) === "")
  }

  test("charEntropyReport: uniform alphabet hits ln(k), repeats score 0, empty omitted") {
    val docs = Seq(
      (0L, "abcd"),   // uniform over 4 chars -> ln 4 micro-nats
      (1L, "aaaa"),   // one symbol -> entropy 0
      (2L, "")        // omitted
    ).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropyReport(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) === ((4L, 4L, 1386294L))) // round(ln 4 * 1e6)
    assert(got(1L) === ((4L, 1L, 0L)))
    assert(!got.contains(2L))
  }

  test("vocabCoverage: cumulative occurrence share at each size, ties by token") {
    val docs = Seq((0L, "a a a b b c"), (1L, "a a b")).toDF("id", "text")
    // counts: a=5, b=3, c=1; total 9
    val got = TextAnalysis.vocabCoverage(docs, "text", Seq(1, 2, 10))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((1L, 555L)))  // 5*1000 div 9
    assert(got(2L) === ((2L, 888L)))  // 8*1000 div 9
    assert(got(10L) === ((3L, 1000L)))
  }

  test("tokenRarityScore: rare tokens score high, common low, tokenless null") {
    // 'common' appears 20x, 'rare' once -> vocab ranks common 0, rare high
    val docs = ((0 until 20).map(i => (i.toLong, "common")) :+ (20L, "rare") :+
      (21L, "  ")).toDF("id", "text")
    val out = TextAnalysis.tokenRarityScore(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(0L) === Some(0L))     // most frequent -> permille 0
    assert(out(20L) === Some(1000L)) // rarest of 2 vocab entries -> 1000
    assert(out(21L) === None)        // whitespace-only doc
  }

  test("hashEmbed matches a brute-force md5 fold and is layout-invariant") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    }
    def brute(text: String, dim: Int): Seq[Long] = {
      val acc = Array.fill(dim)(0L)
      graft.functions.TokenHashing.tokens(text).foreach { t =>
        val h = md5hex(t)
        val bucket = (java.lang.Long.parseLong(h.substring(0, 8), 16) % dim).toInt
        val sign = if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1L else -1L
        acc(bucket) += sign
      }
      acc.toSeq
    }
    val texts = Seq("the quick brown fox", "a a a b", "", "one")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"), Similarity.hashEmbed(col("text"), 16).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === brute(t, 16), s"text='$t'")
    }
    val re = df.repartition(5)
      .select(col("id"), Similarity.hashEmbed(col("text"), 16).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(re === got)
  }

  test("withScriptProfile counts explicit ranges exactly, zero shuffle") {
    val df = Seq(
      (0L, "hello Привет"),          // latin 5, cyrillic 6 -> latin tie-priority? 6>5 -> cyrillic
      (1L, "你好 ok"),                // cjk 2, latin 2 -> latin wins ties
      (2L, "مرحبا"),                  // arabic only
      (3L, "bad �" + 7.toChar), // replacement + control -> mojibake
      (4L, "12345 ,,,"),             // no script chars at all -> none
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withScriptProfile(df, "text")
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    def n(id: Long, c: String) = rows(id).getAs[Int](c)
    def s(id: Long, c: String) = rows(id).getAs[String](c)
    assert(n(0L, "latin_cnt") === 5 && n(0L, "cyrillic_cnt") === 6)
    assert(s(0L, "dominant_script") === "cyrillic")
    assert(n(1L, "cjk_cnt") === 2 && n(1L, "latin_cnt") === 2)
    assert(s(1L, "dominant_script") === "latin") // fixed tie priority
    assert(n(2L, "arabic_cnt") === 5 && s(2L, "dominant_script") === "arabic")
    assert(n(3L, "replacement_cnt") === 1 && n(3L, "control_cnt") === 1)
    assert(rows(3L).getAs[Boolean]("mojibake"))
    assert(!rows(0L).getAs[Boolean]("mojibake"))
    assert(s(4L, "dominant_script") === "none")
    assert(n(4L, "ascii_printable_cnt") === 9 && n(4L, "char_cnt") === 9)
    assert(n(5L, "char_cnt") === 0 && s(5L, "dominant_script") === "none")
  }

  test("stored bigram LM reproduces the one-shot scorer; back-off tiers fire; parquet-stable") {
    val train = Seq((0L, "a b a b"), (1L, "a b"), (2L, "z")).toDF("doc_id", "text")
    val model = TextAnalysis.bigramLmModel(train, "text")
    // Self-scoring parity: every observed bigram hits the bigram table.
    val oneShot = TextAnalysis.bigramLmScore(train, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val viaModel = TextAnalysis
      .bigramLmScoreWithModel(train, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(viaModel === oneShot)
    // Back-off: "a z" unseen bigram but both tokens known -> unigram
    // fallback for w1=a; "q r" w1 unseen -> default; uni: a:3 b:3 z:1, V=3.
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val probe = Seq((10L, "a z"), (11L, "q r")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScoreWithModel(probe, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) === micro(math.log(1.0 / (3 + 3))))
    assert(got(11L) === micro(math.log(1.0 / 3)))
    // The stored artifact is the contract: parquet roundtrip changes nothing.
    val dir = java.nio.file.Files.createTempDirectory("lmroundtrip").toString
    model.write.mode("overwrite").parquet(dir)
    val back = TextAnalysis
      .bigramLmScoreWithModel(train, "doc_id", "text", spark.read.parquet(dir))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(back === oneShot)
  }

  test("bigramLmScore matches a hand-computed add-one bigram model") {
    // uni: a:3 b:3 z:1, V=3; bigrams: "a b":3, "b a":1
    val docs = Seq(
      (0L, "a b a b"), (1L, "a b"), (2L, "z"), (3L, "")
    ).toDF("doc_id", "text")
    // Spark's round() is HALF_UP — mirror it, not Math.round (floor(x+.5)),
    // which differs on negative halves.
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val ab = micro(math.log((3 + 1) / (3 + 3).toDouble))
    val ba = micro(math.log((1 + 1) / (3 + 3).toDouble))
    val out = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .collect().map { r =>
        r.getLong(0) -> (
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }.toMap
    assert(out(0L) === (Some((ab + ba + ab) / 3), Some(3L)))
    assert(out(1L) === (Some(ab), Some(1L)))       // n=1 -> the term itself
    assert(out(2L) === (None, None))               // single token: no bigram
    assert(out(3L) === (None, None))               // empty text
    // The fluency ordering the score exists for: the corpus-typical
    // bigram outscores the rare one.
    assert(ab > ba)
  }

  test("oovReport: top-k vocab fit, per-group OOV counts, tokenless group null") {
    val docs = Seq(
      // "aa" x5, "bb" x4 are the vocab at k=2; "cc" x3, "dd" x1 fall out
      (0L, "aa aa aa bb bb", "g1"),
      (1L, "aa aa bb bb cc", "g1"),
      (2L, "cc cc dd", "g2"),
      (3L, "", "g3"),
      (4L, null.asInstanceOf[String], "g3")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.oovReport(docs, "text", Seq("source"), 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out("g1") === ((10L, 1L, Some(100L))))   // one "cc" is OOV
    assert(out("g2") === ((3L, 3L, Some(1000L))))   // nothing in vocab
    assert(out("g3") === ((0L, 0L, None)))          // no tokens, null rate
  }

  test("extractLinkDomains: hosts per link occurrence, linkless/null docs drop") {
    val docs = Seq(
      (0L, "intro https://a.example.com/x then http://b.example.org/y?q=1 done"),
      (1L, "same host twice https://a.example.com/1 https://a.example.com/2"),
      (2L, "no links here"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.extractLinkDomains(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.sorted.toSeq === Seq(
      (0L, "a.example.com"), (0L, "b.example.org"),
      (1L, "a.example.com"), (1L, "a.example.com")))
  }

  test("inverted index: posting rows, document frequencies, conjunctive search") {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta beta"),      // repeated token posts once
      (2L, "alpha delta"),
      (3L, ""),                     // tokenless: no postings
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val idx = Search.buildInvertedIndex(docs, "doc_id", "text")
    val posts = idx.collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(posts === Set(("alpha", 0L), ("beta", 0L), ("gamma", 0L),
      ("alpha", 1L), ("beta", 1L), ("alpha", 2L), ("delta", 2L)))
    val dfc = Search.documentFrequencies(idx).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfc === Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 1L, "delta" -> 1L))
    val hits = Search.searchConjunctive(idx, Seq("alpha", "beta", "beta"))
      .collect().map(_.getLong(0)).sorted
    assert(hits.toSeq === Seq(0L, 1L))     // duplicate query terms dedupe
    assert(Search.searchConjunctive(idx, Seq("alpha", "zzz")).count() === 0L)
    // posting rows, never per-token arrays: no collect_list in the plan
    val plan = idx.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), s"array postings are the skew trap:\n$plan")
  }

  test("ranked search: integer micro-nat tf-idf, rare terms dominate, ties by id") {
    val docs = Seq(
      (0L, "rare rare common"),     // tf(rare)=2
      (1L, "rare common common"),   // tf(rare)=1
      (2L, "common common common"),
      (3L, "other words only")
    ).toDF("doc_id", "text")
    val widx = Search.buildWeightedIndex(docs, "doc_id", "text")
    val out = Search.searchRanked(widx, Seq("rare", "common"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // N=4; idf(rare)=round(ln(4/2)*1e6)=693147, idf(common)=round(ln(4/3)*1e6)=287682
    val rare = math.round(math.log(4.0 / 2) * 1e6)
    val common = math.round(math.log(4.0 / 3) * 1e6)
    val want = Map(0L -> (2 * rare + common), 1L -> (rare + 2 * common),
      2L -> 3 * common)
    assert(out.toMap === want)
    // ranking: doc 0 (two rares) > doc 1 > doc 2; doc 3 matches nothing
    assert(out.sortBy(x => (-x._2, x._1)).map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(!out.exists(_._1 == 3L))
    // k bounds the result by (score DESC, id ASC)
    val top1 = Search.searchRanked(widx, Seq("rare", "common"), 1)
      .collect().map(_.getLong(0))
    assert(top1.toSeq === Seq(0L))
  }

  test("phrase search: consecutive positions only, order matters, repeats handled") {
    val docs = Seq(
      (0L, "a b c"),        // contains "a b" and "b c"
      (1L, "b a c"),        // has both tokens but NOT the phrase "a b"
      (2L, "x a b y a b"),  // phrase twice -> one id
      (3L, "a a a"),        // "a a" via overlapping positions
      (4L, "a")             // single token, no bigram
    ).toDF("doc_id", "text")
    val pidx = Search.buildPositionalIndex(docs, "doc_id", "text")
    def ids(phrase: String) =
      Search.searchPhrase(pidx, phrase.split(" ").toSeq)
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids("a b") === Seq(0L, 2L))
    assert(ids("b a") === Seq(1L))
    assert(ids("a a") === Seq(3L))
    assert(ids("a b y") === Seq(2L))      // 3-word phrase chains the join
    assert(ids("c a") === Seq())          // tokens exist, adjacency doesn't
    assert(ids("z") === Seq())            // absent single term
    assert(ids("a") === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("fuzzy lookup: every edit-1 class matches, distance-2 collisions filtered") {
    val docs = Seq(
      (0L, "spark spork sparkk park sprk stark total"),
      (1L, "spark zzz")
    ).toDF("doc_id", "text")
    val vocab = Search.documentFrequencies(
      Search.buildInvertedIndex(docs, "doc_id", "text"))
    val out = Search.fuzzyTermLookup(vocab, "spark")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact (df 2), substitution (spork/stark), insertion (sparkk),
    // deletion (park, sprk); "total" shares no variant; "zzz" unrelated
    assert(out === Map("spark" -> 2L, "spork" -> 1L, "stark" -> 1L,
      "sparkk" -> 1L, "park" -> 1L, "sprk" -> 1L))
    // a distance-2 word whose deletion variants collide is verified away
    val v2 = Search.documentFrequencies(Search.buildInvertedIndex(
      Seq((0L, "ab ba")).toDF("doc_id", "text"), "doc_id", "text"))
    val hits = Search.fuzzyTermLookup(v2, "ab")
      .collect().map(_.getString(0)).sorted
    assert(hits.toSeq === Seq("ab"), "levenshtein(ab,ba)=2 must be filtered")
  }

  test("fuzzy lookup: a stored deletion index serves many queries without rebuild") {
    val docs = Seq(
      (0L, "spark spork sparkk park sprk stark total"),
      (1L, "spark zzz")
    ).toDF("doc_id", "text")
    val vocab = Search.documentFrequencies(
      Search.buildInvertedIndex(docs, "doc_id", "text"))
    val idx = Search.buildDeletionIndex(vocab)
    // index shape: posting rows, one per (token, DISTINCT variant) —
    // repeated characters collapse coincident deletions (zzz → zz once)
    assert(idx.columns.sorted.toSeq === Seq("df_count", "token", "variant"))
    val expectedRows = vocab.collect().map(_.getString(0)).map { tok =>
      (tok +: tok.indices.map(i => tok.take(i) + tok.drop(i + 1))).distinct.size.toLong
    }.sum
    assert(idx.count() === expectedRows)
    // two different probes against the SAME stored rows (write/read
    // parquet to pin the serve-from-storage lifecycle)
    val dir = java.nio.file.Files.createTempDirectory("delidx").toString
    idx.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val a = Search.fuzzyLookupIndexed(stored, "spark")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(a === Seq("park", "spark", "sparkk", "spork", "sprk", "stark"))
    val b = Search.fuzzyLookupIndexed(stored, "totl")
      .collect().map(_.getString(0)).toSeq
    assert(b === Seq("total")) // insertion match from the same index
    // one-shot convenience must equal build+probe composition
    val oneShot = Search.fuzzyTermLookup(vocab, "spark")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(oneShot === a)
  }

  test("token JS divergence: identical, disjoint, missing-side, and hand-computed cases") {
    // identical slices -> 0 everywhere
    val same = Seq(("s1", "a a b"), ("s1", "c")).toDF("source", "text")
    val r0 = TextAnalysis.tokenJsDivergence(same, same, "text", Seq("source"))
      .head()
    assert(r0.getAs[Long]("tokens_a") === 4L)
    assert(r0.getAs[Long]("jsd_micro_nats") === 0L)
    assert(r0.getAs[Long]("kl_a_micro_nats") === 0L)

    // disjoint vocabularies -> ln 2 = 693147 micro-nats exactly
    val a1 = Seq(("s", "x x y")).toDF("source", "text")
    val b1 = Seq(("s", "p q q q")).toDF("source", "text")
    val r1 = TextAnalysis.tokenJsDivergence(a1, b1, "text", Seq("source")).head()
    assert(r1.getAs[Long]("jsd_micro_nats") === 693147L)

    // group present on only one side -> NULL divergences, row survives
    val a2 = Seq(("only_a", "w w")).toDF("source", "text")
    val b2 = Seq(("only_b", "v")).toDF("source", "text")
    val rows = TextAnalysis.tokenJsDivergence(a2, b2, "text", Seq("source"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("tokens_a"), r.getAs[Long]("tokens_b"),
          r.isNullAt(r.fieldIndex("jsd_micro_nats")))).toMap
    assert(rows("only_a") === ((2L, 0L, true)))
    assert(rows("only_b") === ((0L, 1L, true)))

    // hand-computed asymmetric case: A = {a:3, b:1}, B = {a:1, b:1}
    val a3 = Seq(("s", "a a a b")).toDF("source", "text")
    val b3 = Seq(("s", "a b")).toDF("source", "text")
    val r3 = TextAnalysis.tokenJsDivergence(a3, b3, "text", Seq("source")).head()
    def term(n: Long, tOther: Long, a: Long, b: Long, ta: Long, tb: Long): Long =
      math.round(math.log((2.0 * n * tOther) / (1.0 * a * tb + 1.0 * b * ta)) * 1e6)
    val klA = (3 * term(3, 2, 3, 1, 4, 2) + 1 * term(1, 2, 1, 1, 4, 2)) / 4
    val klB = (1 * term(1, 4, 3, 1, 4, 2) + 1 * term(1, 4, 1, 1, 4, 2)) / 2
    assert(r3.getAs[Long]("kl_a_micro_nats") === klA)
    assert(r3.getAs[Long]("kl_b_micro_nats") === klB)
    assert(r3.getAs[Long]("jsd_micro_nats") === (klA + klB) / 2)
    assert(r3.getAs[Long]("jsd_micro_nats") > 0L)
  }

  test("BM25 search: exact formula replay on a tiny index, deterministic order") {
    // doc0: a a b (dl 3), doc1: a c (dl 2), doc2: b b b c (dl 4)
    // N = 3, T = 9, df(a) = 2, df(b) = 2
    val docs = Seq((0L, "a a b"), (1L, "a c"), (2L, "b b b c")).toDF("doc_id", "text")
    val widx = Search.buildWeightedIndex(docs, "doc_id", "text")
    def contrib(tf: Long, df: Long, dl: Long): Long = {
      val k1 = 1200000.0 / 1e6; val b = 750000.0 / 1e6
      math.round(
        math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0) *
          (tf.toDouble * (k1 + 1.0)) /
          (tf.toDouble + k1 * (1.0 - b + b * (dl.toDouble * 3 / 9))) * 1e6)
    }
    val expected = Map(
      0L -> (contrib(2, 2, 3) + contrib(1, 2, 3)),
      1L -> contrib(1, 2, 2),
      2L -> contrib(3, 2, 4))
    val out = Search.searchBm25(widx, Seq("a", "b"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === expected)
    // repeated terms dedupe; k bounds; empty terms refused
    assert(Search.searchBm25(widx, Seq("a", "a", "b"), 1).count() === 1)
    intercept[IllegalArgumentException](Search.searchBm25(widx, Nil, 5))
  }

  test("stored index stats: BM25/ranked serve from sidecars, no full-index reaggregation") {
    val docs = Seq((0L, "a a b"), (1L, "a c"), (2L, "b b b c")).toDF("doc_id", "text")
    val widx = Search.buildWeightedIndex(docs, "doc_id", "text")
    val (docLens, stats) = Search.buildIndexStats(widx)
    // sidecar contents are the stats the build already knows
    assert(docLens.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(0L -> 3L, 1L -> 2L, 2L -> 4L))
    assert(stats.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((3L, 9L)))
    // round-trip through parquet (the persisted-sidecar lifecycle), then the
    // stats-serving overloads must equal the recomputing path exactly
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString
    widx.write.parquet(s"$dir/postings")
    docLens.write.parquet(s"$dir/doclens")
    stats.write.parquet(s"$dir/stats")
    val (sw, sdl, sst) = (spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclens"), spark.read.parquet(s"$dir/stats"))
    val bmStored = Search.searchBm25(sw, sdl, sst, Seq("a", "b"), 10, 1200000L, 750000L)
    assert(bmStored.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Search.searchBm25(widx, Seq("a", "b"), 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(Search.searchRanked(sw, sst, Seq("a", "b"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Search.searchRanked(widx, Seq("a", "b"), 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // serve-path plan touches no full-index aggregate: every HashAggregate
    // sits above the term filter, so the only groupBy keys are id after
    // filtering — pin it by checking the stored-stats plan has no
    // aggregation over the unfiltered posting scan. Proxy: the recomputing
    // path has 2 more aggregates (doc lengths + N/T) than the stored path.
    def aggCount(df: org.apache.spark.sql.DataFrame): Int =
      "HashAggregate".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(aggCount(bmStored) <
      aggCount(Search.searchBm25(widx, Seq("a", "b"), 10)))
  }

  test("canonicalizeUrl: case, ports, www, slashes, fragments; non-URLs null") {
    val cases = Seq(
      "HTTP://Host.Example.COM:80/p/1" -> "http://host.example.com/p/1",
      "http://www.host.example.com/p/1/" -> "http://host.example.com/p/1",
      "http://host.example.com/p/1#ref" -> "http://host.example.com/p/1",
      "https://host.example.com:443/q?x=1" -> "https://host.example.com/q?x=1",
      // path/query case is significant — only scheme+authority fold
      "https://HOST.com/CaseSensitive?Q=X" -> "https://host.com/CaseSensitive?Q=X",
      // non-default port survives; root slash drops; query keeps its slash
      "http://h.com:8080/" -> "http://h.com:8080",
      "http://h.com/a/?x=1/" -> "http://h.com/a/?x=1/",
      "  http://h.com/a  " -> "http://h.com/a",
      // :80 on https (and vice versa) is NOT a default port
      "https://h.com:80/a" -> "https://h.com:80/a",
      "not a url" -> null,
      "ftp://h.com/x" -> "ftp://h.com/x")
    val out = cases.map(_._1).toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq === cases.map(_._2))
    // report: variants collapse, non-urls drop
    val rep = TextAnalysis.urlDedupReport(
      Seq("http://A.com/", "http://a.com", "http://a.com#f", "nope").toDF("url"), "url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq === Seq(("http://a.com", 3L, 3L)))
  }

  test("moreLikeThis: hand-computed scores, self excluded, per-query top-k") {
    // N=4; query doc 0 has terms {a, b}: df(a)=3 -> idfk=round(ln(4/3)*1e3)=288,
    // df(b)=2 -> idfk=round(ln 2 * 1e3)=693. doc3 shares nothing.
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "z z"))
      .toDF("doc_id", "text")
    val widx = Search.buildWeightedIndex(docs, "doc_id", "text")
    val (_, stats) = Search.buildIndexStats(widx)
    val out = Search.moreLikeThis(widx, stats, docs.where(col("doc_id") < 1),
        "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val ia = math.round(math.log(4.0 / 3) * 1000)   // 288
    val ib = math.round(math.log(4.0 / 2) * 1000)   // 693
    assert(out.toSeq === Seq(
      (0L, 1, 1L, ia * ia + ib * ib),
      (0L, 2, 2L, ia * ia)))
    // k bounds per query; two query docs rank independently
    val two = Search.moreLikeThis(widx, stats, docs.where(col("doc_id") < 2),
        "doc_id", "text", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(two === Map(0L -> 1L, 1L -> 0L)) // mutual nearest, self excluded
    intercept[IllegalArgumentException](
      Search.moreLikeThis(widx, stats, docs, "doc_id", "text", 0))
  }

  test("deleteFromIndex: anti-join removal equals a rebuild without the docs") {
    val docs = Seq((0L, "alpha beta"), (2L, "beta gamma"), (4L, "alpha gamma"))
      .toDF("doc_id", "text")
    val idx = Search.buildInvertedIndex(docs, "doc_id", "text")
    val dels = Seq(2L, 99L).toDF("doc_id") // absent ids are a no-op
    val after = Search.deleteFromIndex(idx, dels, "doc_id")
    val rebuilt = Search.buildInvertedIndex(
      docs.where(col("doc_id") =!= 2L), "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(df.columns.indexOf("token")),
        r.getLong(df.columns.indexOf("id")))).toSet
    assert(rows(after) === rows(rebuilt))
    // replaying the same deletion is idempotent
    assert(rows(Search.deleteFromIndex(after, dels, "doc_id")) === rows(rebuilt))
    // a string deletion-id column would null-cast and delete nothing: refused
    intercept[IllegalArgumentException](
      Search.deleteFromIndex(idx, Seq("2").toDF("doc_id"), "doc_id"))
  }

  test("incremental index update: equals a from-scratch rebuild, replay-idempotent") {
    val base = Seq((0L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val batch = Seq((1L, "alpha delta"), (3L, "beta beta alpha")).toDF("doc_id", "text")
    val stored = Search.buildInvertedIndex(base, "doc_id", "text")
    val merged = Search.updateInvertedIndex(stored, batch, "doc_id", "text")
    val rebuilt = Search.buildInvertedIndex(base.unionByName(batch), "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(merged) === rows(rebuilt))
    // replaying the same batch adds nothing (distinct collapses it)
    val replayed = Search.updateInvertedIndex(merged, batch, "doc_id", "text")
    assert(rows(replayed) === rows(merged))
    // a conjunctive query over the merged index sees old and new docs
    val hits = Search.searchConjunctive(merged, Seq("alpha", "beta"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(hits === Seq(0L, 3L))
  }

  test("BPE merges: hand-computed greedy sequence, exhaustion, tie rule") {
    // vocab: "aaab" x2, "ab" x1
    // iter1: (a,a) weight 4 beats (a,b) weight 3 -> merge; greedy
    //        left-to-right gives aa,a,b (not a,aa,b)
    // iter2: (a,b) weight 3 beats (aa,a) weight 2 -> merge
    // iter3: (aa,ab) weight 2 -> merge; then no pairs remain
    val docs = Seq((0L, "aaab aaab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, "text", k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1, "a", "a", 4L),
      (2, "a", "b", 3L),
      (3, "aa", "ab", 2L))) // stops early: pairs exhausted before k
    // equal-weight pairs resolve (lhs, rhs) ascending
    val tie = TextAnalysis.bpeMerges(
      Seq((0L, "xy yx")).toDF("doc_id", "text"), "text", k = 1)
      .head()
    assert((tie.getString(1), tie.getString(2)) === (("x", "y")))
    // words containing the delimiter are excluded by contract
    val guarded = TextAnalysis.bpeMerges(
      Seq((0L, "a|b cd cd")).toDF("doc_id", "text"), "text", k = 1).head()
    assert((guarded.getString(1), guarded.getString(2)) === (("c", "d")))
    intercept[IllegalArgumentException](TextAnalysis.bpeMerges(docs, "text", 0))
  }

  test("BPE encode: stored merge table applies in rank order, greedy left-to-right") {
    // Train on a corpus whose merges are (a,a) then (a,b) then (aa,ab);
    // store the table; encode must replay those rewrites exactly.
    val docs = Seq((0L, "aaab aaab aa"), (1L, "aaab ab b")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "text", k = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    merges.write.parquet(s"$dir/merges")
    val stored = spark.read.parquet(s"$dir/merges")
    // vocab side: aaab -> |aa||ab| (2 tokens? no: merge 3 joins aa+ab -> aaab, 1)
    //   a a a b --(a,a)--> aa a b --(greedy L2R: first |a||a| wins)--
    //   wait: "aaab" = |a||a||a||b| -> merge(a,a): |aa||a||b| (scan resumes
    //   after first match) -> merge(a,b): |aa||ab| -> merge(aa,ab): |aaab|
    val enc = TextAnalysis.bpeEncodeVocab(
      Seq("aaab", "aa", "ab", "b", "zq").toDF("word"), "word", stored)
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1).toList, r.getLong(2))).toMap
    assert(enc("aaab") === (List("aaab"), 1L))
    assert(enc("aa") === (List("aa"), 1L))
    assert(enc("ab") === (List("ab"), 1L))
    assert(enc("b") === (List("b"), 1L))
    assert(enc("zq") === (List("z", "q"), 2L)) // OOV word still encodes
    // corpus side: per-doc subword totals from the vocab join
    val counts = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", stored)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(0L -> 3L, 1L -> 3L))
    // delimiter words are excluded by the bpeMerges contract
    val guard = TextAnalysis.bpeTokenCounts(
      Seq((7L, "a|b aa")).toDF("doc_id", "text"), "doc_id", "text", stored)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(guard === Map(7L -> 1L))
  }

  test("disjunctive search: any-term match with counts, duplicates dedupe") {
    val docs = Seq((0L, "a b c"), (1L, "a a x"), (2L, "z z")).toDF("doc_id", "text")
    val idx = Search.buildInvertedIndex(docs, "doc_id", "text")
    val got = Search.searchDisjunctive(idx, Seq("a", "b", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 2L, 1L -> 1L)) // doc1's double 'a' counts once
    intercept[IllegalArgumentException](Search.searchDisjunctive(idx, Nil))
  }

  test("proximity search: order-free slop window, per-doc min distance") {
    val docs = Seq(
      (0L, "a x x b"),     // distance 3
      (1L, "b a"),         // reversed order, distance 1
      (2L, "a x x x x b"), // distance 5 > slop
      (3L, "a a b")        // two a's: min distance 1
    ).toDF("doc_id", "text")
    val pidx = Search.buildPositionalIndex(docs, "doc_id", "text")
    val got = Search.searchProximity(pidx, "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 1L -> 1L, 3L -> 1L))
    intercept[IllegalArgumentException](Search.searchProximity(pidx, "a", "a", 3))
    intercept[IllegalArgumentException](Search.searchProximity(pidx, "a", "b", 0))
  }

  test("prototypicality: exact integer distances and rank permille") {
    // group g: vectors on a line; centroid of (0, 4, 8) micro-quantized
    // is mean -> 4e6; distances 4e6, 0, 4e6. rank permille: 0 -> 0/1000 ties.
    val df = Seq(
      (0L, Array(0.0f), "g"), (1L, Array(4.0f), "g"), (2L, Array(8.0f), "g"),
      (3L, Array(1.0f), "h"), (4L, Array(2.0f), "h"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.prototypicalityRank(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // h centroid = (1e6+2e6) div 2 = 1.5e6; distances 5e5 each, tied rank 0
    assert(got === Map(
      0L -> (4000000L, 500L), 1L -> (0L, 0L), 2L -> (4000000L, 500L),
      3L -> (500000L, 0L), 4L -> (500000L, 0L)))
  }

  test("snippets: clamped windows, multiple hits per doc, absent term empty") {
    val docs = Seq((0L, "a b c a"), (1L, "x y z"), (2L, "a")).toDF("doc_id", "text")
    val pidx = Search.buildPositionalIndex(docs, "doc_id", "text")
    val out = Search.snippets(pidx, docs, "doc_id", "text", "a", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set((0L, 0L, "a b"), (0L, 3L, "c a"), (2L, 0L, "a")))
    assert(Search.snippets(pidx, docs, "doc_id", "text", "a", 0)
      .collect().map(_.getString(2)).forall(_ == "a"))
    assert(Search.snippets(pidx, docs, "doc_id", "text", "zzz", 2).count() === 0)
    intercept[IllegalArgumentException](
      Search.snippets(pidx, docs, "doc_id", "text", "", 1))
  }

  test("tokenizerFitReport: exact permille per group, zero-token group null") {
    val train = Seq((0L, "aaab aaab aa"), (1L, "aaab ab b")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(train, "text", k = 5)
    // after merges, every word in the corpus is 1 subword token (see the
    // BPE encode spec): s1 = 12 chars / 3 tokens, s2 = 9 / 3
    val docs = Seq((0L, "aaab aaab aa", "s1"), (1L, "aaab ab b", "s2"),
      (2L, "", "s3")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.tokenizerFitReport(docs, "doc_id", "text", "source", merges)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(out === Set(("s1", 3L, 12L, 4000L), ("s2", 3L, 9L, 3000L),
      ("s3", 0L, 0L, null)))
  }

  test("packGreedyByCount: equals packGreedy when counts are the whitespace estimate") {
    val docs = Seq((0L, "a b c", "s1"), (1L, "d e", "s1"), (2L, "f", "s1"),
      (3L, "g h i j", "s2"), (4L, null.asInstanceOf[String], "s2"))
      .toDF("doc_id", "text", "shard")
    val counted = docs.withColumn("n",
      when(col("text").isNull, lit(0L))
        .otherwise(size(split(trim(col("text")), "\\s+")).cast("long")))
    val viaCount = Packing.packGreedyByCount(counted, "doc_id", "n", "shard", 4, "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val viaText = Packing.packGreedy(docs, "doc_id", "text", "shard", 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaCount === viaText)
    // null counts pack as 0 tokens
    val withNull = Packing.packGreedyByCount(
      counted.withColumn("n", when(col("doc_id") === 4, lit(null)).otherwise(col("n"))),
      "doc_id", "n", "shard", 4, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(withNull(4L) === 0L)
  }

  test("PMI collocations: hand-computed value, min-count floor, deterministic top-k") {
    // "a b" x5 adjacent, "b a" x4 — only "a b" survives minCount=5.
    // Tu=10 (a:5, b:5), Tb=9. PMI = ln(5*10*10 / (9*5*5)).
    val docs = Seq((0L, "a b a b a b a b a b")).toDF("doc_id", "text")
    val out = TextAnalysis.collocationsPmi(docs, "text", minCount = 5L, k = 20)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "a b")
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === math.round(math.log(500.0 / 225.0) * 1e6))
    // floor at 4 admits the reverse bigram too, ordered by PMI then text
    val out4 = TextAnalysis.collocationsPmi(docs, "text", minCount = 4L, k = 20)
      .collect().map(_.getString(0)).toSeq
    assert(out4 === Seq("a b", "b a")) // PMI(a,b) > PMI(b,a) since c_xy 5 > 4
    intercept[IllegalArgumentException](
      TextAnalysis.collocationsPmi(docs, "text", minCount = 0L))
    intercept[IllegalArgumentException](
      TextAnalysis.collocationsPmi(docs, "text", k = 0))
  }

  test("JS divergence contributors: exact ranking, symmetric case ties by token") {
    // A = {x:3, y:1}, B = {x:1, y:3}: contributions are symmetric, so
    // the exact keys tie and token order breaks it (x before y).
    val a = Seq(("s", "x x x y")).toDF("source", "text")
    val b = Seq(("s", "y y y x")).toDF("source", "text")
    val out = TextAnalysis.tokenJsDivergenceContributors(a, b, "text", Seq("source"), k = 5)
      .collect().map(r => (r.getInt(r.fieldIndex("rank")),
        r.getString(r.fieldIndex("token")),
        r.getLong(r.fieldIndex("contribution_micro_nats"))))
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((1, "x"), (2, "y")))
    // replicate the documented arithmetic: ta = tb = 4
    def term(n: Long, tOther: Long, ca: Long, cb: Long): Long =
      math.round(math.log((2.0 * n * tOther) / (1.0 * ca * 4 + 1.0 * cb * 4)) * 1e6)
    val contribX = (3 * term(3, 4, 3, 1)) / 4 + (1 * term(1, 4, 3, 1)) / 4
    assert(out.find(_._2 == "x").get._3 === contribX)
    // top-k bounds the output
    val one = TextAnalysis.tokenJsDivergenceContributors(a, b, "text", Seq("source"), k = 1)
      .collect()
    assert(one.length === 1 && one.head.getString(2) === "x")
    // a group missing one side is dropped (nothing to rank)
    val onlyA = Seq(("ghost", "w w")).toDF("source", "text")
    val empty = TextAnalysis.tokenJsDivergenceContributors(
      onlyA, b.filter(lit(false)), "text", Seq("source"))
    assert(empty.count() === 0)
  }

  test("zipf slope: exact least-squares replay, single-token group reports NULL") {
    // counts a:4, b:2, c:1 -> ranks 1,2,3
    val docs = Seq(("s1", "a a a a b b c"), ("s2", "only")).toDF("source", "text")
    val out = TextAnalysis.zipfSlopeByGroup(docs, "text", Seq("source"), topN = 100)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val xs = Seq(1L, 2L, 3L).map(r => math.round(math.log(r.toDouble) * 1e6))
    val ys = Seq(4L, 2L, 1L).map(c => math.round(math.log(c.toDouble) * 1e6))
    val n = BigInt(3)
    val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
    val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
    val sxx = xs.map(x => BigInt(x) * x).sum
    val slope = ((n * sxy - sx * sy) * 1000000) / (n * sxx - sx * sx)
    assert(out("s1") === ((3L, Some(slope.toLong))))
    assert(slope < 0) // Zipf slopes are negative
    assert(out("s2") === ((1L, None))) // a point has no slope
  }

  test("substring search: literal grep semantics, cross-token, trigram FPs verified away") {
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "quickly browsing"),
      (2L, "own fox den"),
      (3L, "fo"), // shorter than a trigram: no postings, still legal corpus row
      (4L, "xof nworb kciuq") // same trigram CHARACTERS reversed: no match
    ).toDF("doc_id", "text")
    val idx = Search.buildTrigramIndex(docs, "doc_id", "text")
    def hits(n: String): Seq[Long] =
      Search.searchSubstring(idx, docs, "doc_id", "text", n)
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(hits("quick") === Seq(0L, 1L)) // prefix of "quickly" too
    assert(hits("own fox") === Seq(0L, 2L)) // crosses a token boundary
    assert(hits("brown fox") === Seq(0L))
    assert(hits("zebra") === Seq())
    intercept[IllegalArgumentException](hits("ab")) // sub-trigram refused
  }

  test("substring search equals the naive contains scan on randomized corpora") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcd "
    val docs = (0L until 80L).map(i =>
      (i, Seq.fill(30)(alphabet(rnd.nextInt(alphabet.length))).mkString))
    val df = docs.toDF("doc_id", "text")
    val idx = Search.buildTrigramIndex(df, "doc_id", "text")
    (1 to 10).foreach { _ =>
      val needle = Seq.fill(4)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = Search.searchSubstring(idx, df, "doc_id", "text", needle)
        .collect().map(_.getLong(0)).toSet
      val want = docs.filter(_._2.contains(needle)).map(_._1).toSet
      assert(got === want, s"needle '$needle'")
    }
  }

  test("oovReport vocab boundary ties break by token order, like topTokens") {
    // "x" and "y" tie at 2 occurrences for the last vocab slot -> "x" wins
    val docs = Seq((0L, "top top top x x y y", "g")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.oovReport(docs, "text", Seq("source"), 2)
      .collect().head
    assert((out.getLong(1), out.getLong(2)) === ((7L, 2L))) // both "y"s OOV
  }

  test("md5_hex_slice_long matches conv(substring(md5(x), s, l), 16, 10)") {
    import spark.implicits._
    val rows = Seq("", "a", "hello world", "héllo wörld", "日本語テキスト",
      "mixed 😀 unicode", "token|salt|x", "1234567890abcdef" * 8)
    val df = rows.toDF("x")
    for ((st, ln) <- Seq((1, 8), (9, 1), (25, 8), (1, 15), (1, 13), (1, 10),
        (17, 8), (9, 8))) {
      val got = df.select(graft.functions.TextHashFunctions
        .md5_hex_slice_long(col("x"), st, ln).as("v")).collect().map(_.getLong(0))
      val want = df.selectExpr(
        s"CAST(conv(substring(md5(x), $st, $ln), 16, 10) AS BIGINT) AS v")
        .collect().map(_.getLong(0))
      assert(got.toSeq == want.toSeq, s"slice ($st, $ln)")
    }
    // null in -> null out, like the conv/substring/md5 chain
    val r = Seq(Tuple1(null: String)).toDF("x")
      .select(graft.functions.TextHashFunctions
        .md5_hex_slice_long(col("x"), 1, 8).as("v")).head()
    assert(r.isNullAt(0))
  }
}
