package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Oracle-expressible text hashes: token-level hash chains built ONLY from
 * primitives vanilla ANSI SQL engines share with Spark (md5 hex digits,
 * 64-bit integer arithmetic), so the driver's DuckDB gate can recompute the
 * full output instead of falling back to a rows-only check. The xxhash64
 * family in [[SketchExpressions]] stays the default for the dedup hot paths
 * (it is faster per byte); these exist for the operators whose VALUES are
 * part of the correctness contract.
 *
 * Shared token pipeline, mirroring `TextAnalysis.tokens` exactly:
 * Spark-`trim` semantics (ASCII space only, NOT Java `String.trim`'s
 * control-char sweep), then Java `split("\\s+")` — the same split DuckDB's
 * `string_split_regex(trim(text), '\s+')` produces (both keep a leading
 * empty token after non-space leading whitespace, both drop trailing ones).
 */
private[graft] object TokenHashing {
  private val Whitespace = Pattern.compile("\\s+")
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Spark trim(): strip ASCII ' ' only, then \s+ split; empty → no tokens. */
  def tokens(s: String): Array[String] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == e) Array.empty[String] else Whitespace.split(s.substring(b, e))
  }

  def md5Of(token: String): Array[Byte] =
    digest.get().digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def md5OfBytes(b: Array[Byte]): Array[Byte] = digest.get().digest(b)

  /** Unsigned 32-bit value of digest bytes [off, off+4) — hex chars
   *  (2*off+1)..(2*off+8) 1-indexed, i.e. `substr(md5(t), 2*off+1, 8)`. */
  def md5Bits32(token: String, off: Int): Long = {
    val d = md5Of(token)
    ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
  }
}

/**
 * Order-sensitive 63-bit token fingerprint: two independent 32-bit
 * polynomial accumulators (bases 1000003 / 1000033, mod 2^32) over the
 * md5-derived 32-bit token values `hex[25..32]` (digest bytes 12..15 — the
 * same slice the established md5-bucket oracle arithmetic uses), packed as
 * `(h1 mod 2^31) * 2^32 + h2` — always non-negative. Every step fits signed
 * 64-bit (max accumulator product ≈ 2^32 × 1000033 ≈ 2^52), so DuckDB
 * recomputes it exactly with `list_reduce` + BIGINT arithmetic and the
 * driver's oracle hash-checks the full output (q32). Empty token list → 0;
 * null text → null (null-intolerant unary).
 */
case class Md5TokenPolyHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = TokenHashing.tokens(input.asInstanceOf[UTF8String].toString)
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < toks.length) {
      val v = TokenHashing.md5Bits32(toks(i), 12)
      h1 = (h1 * 1000003L + v) & 0xffffffffL
      h2 = (h2 * 1000033L + v) & 0xffffffffL
      i += 1
    }
    ((h1 & 0x7fffffffL) << 32) | h2
  }

  override protected def withNewChildInternal(c: Expression): Md5TokenPolyHash =
    copy(child = c)
  override def prettyName: String = "md5_token_poly_hash"
}

/**
 * 64-bit SimHash over the DISTINCT md5-derived token hashes (bit-vote
 * sketch, ties → 0): per distinct token, a 64-bit value from md5 hex chars
 * 1..16 (digest bytes 0..7); each sketch bit is 1 iff strictly more member
 * hashes set that bit than clear it. Same sketch construction as
 * [[SimHash64]] but with an oracle-recomputable token hash, so the full
 * near-dup pair machinery (distinct-sketch collapse, pigeonhole chunk join,
 * within/across emission) can be gated by a DuckDB oracle that rebuilds the
 * sketches and all-pairs hamming distances (q26). Whitespace tokens like
 * `TextAnalysis.tokens`; no tokens → 0 sketch; null text → null.
 */
case class Md5TokenSimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = TokenHashing.tokens(input.asInstanceOf[UTF8String].toString)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val hi = TokenHashing.md5Bits32(t, 0)
        val lo = TokenHashing.md5Bits32(t, 4)
        val h = (hi << 32) | lo
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }

  override protected def withNewChildInternal(c: Expression): Md5TokenSimHash64 =
    copy(child = c)
  override def prettyName: String = "md5_token_simhash64"
}

/**
 * 128-bit SimHash over DISTINCT md5-derived token hashes, as [word0, word1]:
 * the md5 digest IS 128 bits, so word0 votes over digest bytes 0..7 (making
 * it bit-identical to [[Md5TokenSimHash64]] on the same text) and word1 over
 * bytes 8..15. Fully oracle-recomputable from `md5()` hex slices.
 */
case class Md5TokenSimHash128(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = TokenHashing.tokens(input.asInstanceOf[UTF8String].toString)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](128)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val h0 = (TokenHashing.md5Bits32(t, 0) << 32) | TokenHashing.md5Bits32(t, 4)
        val h1 = (TokenHashing.md5Bits32(t, 8) << 32) | TokenHashing.md5Bits32(t, 12)
        var b = 0
        while (b < 64) {
          if (((h0 >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          if (((h1 >>> b) & 1L) == 1L) votes(64 + b) += 1 else votes(64 + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var w0 = 0L
    var w1 = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) w0 |= (1L << b)
      if (votes(64 + b) > 0) w1 |= (1L << b)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(w0, w1))
  }

  override protected def withNewChildInternal(c: Expression): Md5TokenSimHash128 =
    copy(child = c)
  override def prettyName: String = "md5_token_simhash128"
}

/**
 * Bloom-filter membership over a document's word `n`-grams in ONE native
 * pass: tokenize (input arrives already lowercased), slide the n-window
 * building each gram string, md5 it, and return true on the first gram
 * with ALL `k` of its md5-derived bit positions set in `words` (an
 * `mBits`-bit bitmap packed into longs). Position `j` of a gram is hex
 * chars `(8j+1)..(8j+8)` of its md5 — `('0x' || substr(md5(gram),
 * 1 + 8*j, 8))::BIGINT % mBits` in DuckDB — so an oracle replays the
 * EXACT bit arithmetic, false positives included: they are part of the
 * operator's semantics, not noise. Fused here rather than composed over
 * `wordGrams` because the interpreted transform/slice/array_join gram
 * chain dominated the corpus-side cost 10× (the same lesson as
 * [[graft.functions.SketchExpressions HashedNgrams]]); md5-per-gram is
 * the irreducible oracle-parity cost. The bitmap ships inside the
 * serialized expression (kilobytes — the broadcast-equivalent for
 * model-sized state). Null text → null (never contaminated); fewer than
 * `n` tokens → false.
 */
case class AnyGramInMd5Bloom(child: Expression, n: Int, words: Array[Long], mBits: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")
  require(mBits >= 64 && k >= 1 && k <= 4, s"need mBits >= 64, k in [1,4]; got $mBits, $k")
  require(words.length == (mBits + 63) / 64,
    s"bitmap has ${words.length} words for $mBits bits")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any = {
    val toks = TokenHashing.tokens(input.asInstanceOf[UTF8String].toString)
    if (toks.length < n) return false
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks(i + t))
        t += 1
      }
      val d = TokenHashing.md5Of(sb.toString)
      var j = 0
      var all = true
      while (j < k && all) {
        val off = 4 * j
        val p = (((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
          ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)) % mBits
        all = (words((p >>> 6).toInt) & (1L << (p & 63))) != 0L
        j += 1
      }
      if (all) return true
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(c: Expression): AnyGramInMd5Bloom =
    copy(child = c)
  override def prettyName: String = "any_gram_in_md5_bloom"
}

/**
 * Content-defined chunking (gear-style rolling hash): cut the text at
 * CONTENT-determined boundaries so an insertion or deletion only perturbs
 * the chunks around the edit — the primitive behind storage/transfer dedup
 * and sub-document duplicate detection. Chunk boundaries downstream of an
 * edit re-align within about one chunk, where any fixed-width blocking
 * scheme shifts every later block.
 *
 * Definition, over Unicode CODE POINTS with every constant md5-derived so
 * any SQL engine replays it exactly:
 *
 *   gear(c) = first 15 md5 hex digits of "gear" ++ decimal(c), as a 60-bit int
 *   h_i     = (2·h_{i−1} + gear(c_i)) mod 2⁶⁰,  h resets to 0 at each cut
 *   cut after position i when the running chunk holds ≥ `minLen` code
 *   points and h_i mod 2^`maskBits` == 0, or exactly at `maxLen`; the
 *   final partial chunk always emits.
 *
 * Returns `array<struct<idx int, len int, hash string>>` — chunk index,
 * code-point length, and the md5 hex of the chunk substring. Empty text →
 * empty array; null → null. Mean chunk length ≈ `minLen + 2^maskBits`.
 * Per-row cost is one table lookup + shift-add per code point and one md5
 * per chunk — map-side, no state across rows; gear values cache process-
 * wide (the alphabet is tiny relative to the corpus).
 */
case class CdcChunks(child: Expression, maskBits: Int, minLen: Int, maxLen: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(maskBits >= 1 && maskBits <= 30, s"maskBits must be in [1,30], got $maskBits")
  require(minLen >= 1, s"minLen must be >= 1, got $minLen")
  require(maxLen >= minLen, s"maxLen ($maxLen) must be >= minLen ($minLen)")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", StringType, nullable = false))), containsNull = false)

  private val mask: Long = (1L << maskBits) - 1L

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val s = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var chunkStartChar = 0 // char offset of the running chunk's start
    var chunkLen = 0       // code points in the running chunk
    var idx = 0
    var ci = 0             // char offset of the next code point
    def emit(endChar: Int): Unit = {
      val hex = CdcChunks.md5Hex(s.substring(chunkStartChar, endChar))
      out += new GenericInternalRow(
        Array[Any](idx, chunkLen, UTF8String.fromString(hex)))
      idx += 1
      chunkStartChar = endChar
      chunkLen = 0
      h = 0L
    }
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      ci += Character.charCount(cp)
      h = ((h << 1) + CdcChunks.gear(cp)) & CdcChunks.Mask60
      chunkLen += 1
      if ((chunkLen >= minLen && (h & mask) == 0L) || chunkLen == maxLen) emit(ci)
    }
    if (chunkLen > 0) emit(ci)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): CdcChunks =
    copy(child = c)
  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  val Mask60: Long = (1L << 60) - 1L
  private val gearCache = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()

  /** 60-bit gear constant for a code point: `('0x' || substr(md5('gear' ||
   *  c), 1, 15))::BIGINT` in any SQL engine. */
  def gear(cp: Int): Long = {
    val cached = gearCache.get(cp)
    if (cached != null) cached.longValue()
    else {
      val d = TokenHashing.md5Of("gear" + cp.toString)
      // first 15 hex digits = high 7.5 bytes of the digest
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >> 4)
      gearCache.putIfAbsent(cp, java.lang.Long.valueOf(v))
      v
    }
  }

  def md5Hex(s: String): String = {
    val d = TokenHashing.md5Of(s)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }
}

/**
 * All fixed-length sliding-window hashes of a string in ONE pass: 64-bit
 * content hashes of every `windowLen`-code-point window at offsets 0,
 * `stride`, 2·`stride`, … — the repeated-passage mining primitive
 * ([[graft.pipeline.Dedup.repeatedPassageSpans]]). Returns `array<long>`
 * where element i is the hash of the window starting at code point
 * i·`stride`; shorter-than-window text → empty array; null → null.
 *
 * The hash is INTERNAL-ONLY (windows join on equality; no hash value ever
 * reaches an output or an oracle), so it needs to be deterministic and
 * collision-resistant, not engine-replayable: FNV-1a over code points with
 * a murmur3 fmix64 finalizer. Two equal windows always hash equal, so the
 * downstream span set is identical to the md5-per-window formulation
 * absent a 64-bit collision — the same contract that formulation carried
 * at 60 bits, ~300× cheaper per window: the per-window expression chain
 * (UTF8String substring → UTF-8 encode → MessageDigest md5 → hex →
 * conv(…, 16, 10) parse) is replaced by ~windowLen integer multiplies,
 * and each code point decodes once per document instead of once per
 * overlapping window it appears in (windowLen/stride times).
 */
case class SlidingWindowHashes(child: Expression, windowLen: Int, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(windowLen >= 1, s"windowLen must be >= 1, got $windowLen")
  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SlidingWindowHashUtil.compute(input.asInstanceOf[UTF8String], windowLen,
      stride)

  // Whole-stage-codegen participation (the expression sits on the hottest
  // text path): one static call per row, no interpreted-expression dispatch.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SlidingWindowHashUtil.compute($c, $windowLen, $stride)")

  override protected def withNewChildInternal(c: Expression): SlidingWindowHashes =
    copy(child = c)
  override def prettyName: String = "sliding_window_hashes"
}

/** Shared compute core of [[SlidingWindowHashes]] — a plain object so the
  * generated Java calls it through a static forwarder. Decodes code points
  * straight off the UTF8String's UTF-8 bytes (no String copy, no UTF-16
  * round-trip); a byte sequence that fails STRICT UTF-8 validation
  * (truncated/overlong/surrogate/out-of-range — anything the JDK decoder
  * would replace) falls back to the previous `toString`-based path, so
  * hashes are identical to the old implementation on every input. */
object SlidingWindowHashUtil {

  def compute(input: UTF8String, windowLen: Int, stride: Int)
    : org.apache.spark.sql.catalyst.util.ArrayData = {
    val nb = input.numBytes
    // Upper bound: >= 1 byte per code point, in both the strict and the
    // JDK-replacement decode (each malformed sequence of >= 1 bytes maps
    // to one U+FFFD), so one allocation serves either path.
    val cps = new Array[Int](nb)
    var n = 0
    var i = 0
    var valid = true
    while (valid && i < nb) {
      val b0 = input.getByte(i) & 0xff
      if (b0 < 0x80) { cps(n) = b0; n += 1; i += 1 }
      else if (b0 < 0xc2) valid = false // continuation byte or overlong lead
      else if (b0 < 0xe0) {
        if (i + 1 >= nb) valid = false
        else {
          val b1 = input.getByte(i + 1) & 0xff
          if ((b1 & 0xc0) != 0x80) valid = false
          else { cps(n) = ((b0 & 0x1f) << 6) | (b1 & 0x3f); n += 1; i += 2 }
        }
      } else if (b0 < 0xf0) {
        if (i + 2 >= nb) valid = false
        else {
          val b1 = input.getByte(i + 1) & 0xff
          val b2 = input.getByte(i + 2) & 0xff
          val lo1 = if (b0 == 0xe0) 0xa0 else 0x80 // reject overlong
          val hi1 = if (b0 == 0xed) 0x9f else 0xbf // reject surrogates
          if (b1 < lo1 || b1 > hi1 || (b2 & 0xc0) != 0x80) valid = false
          else {
            cps(n) = ((b0 & 0x0f) << 12) | ((b1 & 0x3f) << 6) | (b2 & 0x3f)
            n += 1; i += 3
          }
        }
      } else if (b0 < 0xf5) {
        if (i + 3 >= nb) valid = false
        else {
          val b1 = input.getByte(i + 1) & 0xff
          val b2 = input.getByte(i + 2) & 0xff
          val b3 = input.getByte(i + 3) & 0xff
          val lo1 = if (b0 == 0xf0) 0x90 else 0x80 // reject overlong
          val hi1 = if (b0 == 0xf4) 0x8f else 0xbf // reject > U+10FFFF
          if (b1 < lo1 || b1 > hi1 || (b2 & 0xc0) != 0x80 ||
              (b3 & 0xc0) != 0x80) valid = false
          else {
            cps(n) = ((b0 & 0x07) << 18) | ((b1 & 0x3f) << 12) |
              ((b2 & 0x3f) << 6) | (b3 & 0x3f)
            n += 1; i += 4
          }
        }
      } else valid = false
    }
    if (!valid) {
      // Malformed UTF-8: the JDK decoder's replacement-char semantics —
      // exactly what the previous implementation hashed.
      val s = input.toString
      n = 0
      var ci = 0
      while (ci < s.length) {
        val cp = s.codePointAt(ci)
        cps(n) = cp
        n += 1
        ci += Character.charCount(cp)
      }
    }
    hashWindows(cps, n, windowLen, stride)
  }

  private def hashWindows(cps: Array[Int], n: Int, windowLen: Int, stride: Int)
    : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    if (n < windowLen) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long]((n - windowLen) / stride + 1)
    var w = 0
    var p = 0
    while (p + windowLen <= n) {
      var h = 0xcbf29ce484222325L // FNV-1a offset basis
      var j = p
      val end = p + windowLen
      while (j < end) {
        h = (h ^ cps(j)) * 0x100000001b3L
        j += 1
      }
      // murmur3 fmix64: full avalanche so truncated/compared bits are fair
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      out(w) = h
      w += 1
      p += stride
    }
    new GenericArrayData(out)
  }
}

/**
 * Integer value of md5 hex digits [start, start+len) (1-based positions in
 * the 32-char lowercase hex digest) of the input string's UTF-8 bytes —
 * the house `conv(substring(md5(x), start, len), 16, 10)` pattern as ONE
 * whole-stage-codegen expression. Values are bit-identical to that chain
 * (an oracle replaying the hex form agrees), but the hot path drops three
 * per-row costs the chain carried: the 32-char hex string materialization,
 * the base-16 string parse (`conv`), and a fresh MessageDigest per call
 * (Spark's `md5()` goes through commons-codec's allocating entry point).
 * `len <= 15` keeps the value non-negative in a long — the same bound the
 * `cast("long")` in the original pattern relied on.
 */
case class Md5HexSliceLong(child: Expression, start: Int, len: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(start >= 1 && len >= 1 && len <= 15 && start + len <= 33,
    s"md5 hex slice [$start, ${start + len}) out of the 32-digit/15-max range")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5HexSliceUtil.slice(input.asInstanceOf[UTF8String], start, len)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5HexSliceUtil.slice($c, $start, $len)")

  override protected def withNewChildInternal(c: Expression): Md5HexSliceLong =
    copy(child = c)
  override def prettyName: String = "md5_hex_slice_long"
}

/** Compute core of [[Md5HexSliceLong]] — plain object so generated Java
  * calls it through a static forwarder. */
object Md5HexSliceUtil {
  def slice(s: UTF8String, start: Int, len: Int): Long = {
    val d = TokenHashing.md5OfBytes(s.getBytes)
    var v = 0L
    var i = start - 1 // 0-based nibble index
    val end = i + len
    while (i < end) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

object TextHashFunctions {
  def sliding_window_hashes(text: Column, windowLen: Int, stride: Int): Column =
    Bridge.column(SlidingWindowHashes(Bridge.expression(text), windowLen, stride))
  def md5_hex_slice_long(text: Column, start: Int, len: Int): Column =
    Bridge.column(Md5HexSliceLong(Bridge.expression(text), start, len))
  def md5_token_poly_hash(text: Column): Column =
    Bridge.column(Md5TokenPolyHash(Bridge.expression(text)))
  def md5_token_simhash64(text: Column): Column =
    Bridge.column(Md5TokenSimHash64(Bridge.expression(text)))
  def md5_token_simhash128(text: Column): Column =
    Bridge.column(Md5TokenSimHash128(Bridge.expression(text)))
  def any_gram_in_md5_bloom(
      loweredText: Column, n: Int, words: Array[Long], mBits: Int, k: Int): Column =
    Bridge.column(AnyGramInMd5Bloom(Bridge.expression(loweredText), n, words, mBits, k))
  def cdc_chunks(text: Column, maskBits: Int, minLen: Int, maxLen: Int): Column =
    Bridge.column(CdcChunks(Bridge.expression(text), maskBits, minLen, maxLen))
}
