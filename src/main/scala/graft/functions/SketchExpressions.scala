package graft.functions

import java.util.{HashSet => JHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native sketch expressions for dedup at scale. Each replaces a nested
 * higher-order-function composition (one interpreted tree-walk per element ×
 * per seed) with a single primitive loop per row.
 */

/**
 * MinHash signature of a pre-hashed token set: out[i] = min over tokens of
 * xxhash64(i, tokenHash). Value-identical to the HOF formulation
 * `transform(seq(0,n-1), i -> array_min(transform(hashes, h -> xxhash64(i,h))))`
 * because it uses the same XXH64 chain (seed 42, int then long).
 */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val n = hashes.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < numHashes) {
      // Spark's xxhash64(i, h) chains: seed 42 → hashInt(i) → hashLong(h).
      val seedI = XXH64.hashInt(i, 42L)
      var j = 0
      var m = Long.MaxValue
      while (j < n) {
        val v = XXH64.hashLong(hashes.getLong(j), seedI)
        if (v < m) m = v
        j += 1
      }
      mins(i) = m
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/**
 * LSH band hashes of a MinHash signature: the signature is cut into `bands`
 * equal slices of r = len/bands mins and each slice is folded to one 64-bit
 * bucket hash. For any non-null signature, value-identical to the HOF
 * formulation `transform(seq(0,bands-1), b -> xxhash64(slice(sig, b*r+1,
 * r)))` — Spark's `xxhash64` over an array<bigint> chains hashLong over the
 * elements from seed 42, which is exactly the fold below — but one primitive
 * loop instead of 2×bands interpreted Slice allocations + expression tree
 * walks per row (which dominated the q24 map stage). The one divergence is a
 * NULL signature: this null-intolerant UnaryExpression returns null, while
 * the HOF yields an array of seed hashes (xxhash64 of an all-null slice is
 * the seed, 42). Null is the saner contract — no pipeline here produces
 * null signatures, and a null sketch must not land in a real LSH bucket.
 */
case class MinHashBandHashes(child: Expression, bands: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(bands >= 1, "bands must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val r = sig.numElements() / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var j = b * r
      val end = j + r
      while (j < end) {
        // Spark's xxhash64 skips null array elements; match it exactly so
        // the HOF-equivalence claim holds for nullable inputs too.
        if (!sig.isNullAt(j)) h = XXH64.hashLong(sig.getLong(j), h)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashBandHashes =
    copy(child = c)
  override def prettyName: String = "minhash_band_hashes"
}

/**
 * 64-bit SimHash of a pre-hashed token set: bit j of the result is set when
 * more tokens have bit j set than clear.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val n = hashes.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/**
 * 128-bit SimHash over pre-hashed tokens, as [word0, word1]: word0 votes
 * over the token hash itself (bit-identical to [[SimHash64]] on the same
 * input), word1 over XXH64.hashLong(h, 42) — the same derived-hash chain
 * Spark's `xxhash64(h)` computes — giving 64 additional independent vote
 * dimensions. The escape hatch for corpora whose DISTINCT sketch count
 * approaches the 64-bit birthday/bucket ceiling (see
 * [[graft.pipeline.Dedup.simHashDedupPairs]]): 8 pigeonhole chunks support
 * hamming radius ≤ 7.
 */
case class SimHash128(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val n = hashes.numElements()
    val votes = new Array[Int](128)
    var i = 0
    while (i < n) {
      val h0 = hashes.getLong(i)
      val h1 = XXH64.hashLong(h0, 42L)
      var j = 0
      while (j < 64) {
        if (((h0 >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        if (((h1 >>> j) & 1L) == 1L) votes(64 + j) += 1 else votes(64 + j) -= 1
        j += 1
      }
      i += 1
    }
    var w0 = 0L
    var w1 = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) w0 |= (1L << j)
      if (votes(64 + j) > 0) w1 |= (1L << j)
      j += 1
    }
    new GenericArrayData(Array(w0, w1))
  }

  override protected def withNewChildInternal(c: Expression): SimHash128 = copy(child = c)
  override def prettyName: String = "simhash128"
}

/**
 * Set-Jaccard of two string arrays: |A∩B| / |A∪B| over distinct elements
 * (0.0 when both are empty). One hash-set pass instead of
 * `array_intersect` + `array_union`, which each build their own hash
 * structures per call.
 */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val setA = new JHashSet[UTF8String](math.max(8, a.numElements() * 2))
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new JHashSet[UTF8String](math.max(8, b.numElements() * 2))
    i = 0
    var inter = 0
    while (i < b.numElements()) {
      val s = b.getUTF8String(i)
      if (setB.add(s) && setA.contains(s)) inter += 1
      i += 1
    }
    val union = setA.size + setB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayJaccard =
    copy(left = l, right = r)
  override def prettyName: String = "array_jaccard"
}

/**
 * Jaccard of two ascending-sorted long arrays via a single merge pass —
 * duplicates are collapsed during the merge, so inputs need not be distinct.
 * Used on xxhash64-hashed token/shingle sets: pairs joins then carry compact
 * 8-byte elements instead of strings, and per-pair cost is O(n+m) with no
 * hashing at all.
 */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var union = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      union += 1
      if (x == y) {
        inter += 1
        do i += 1 while (i < na && a.getLong(i) == x)
        do j += 1 while (j < nb && b.getLong(j) == y)
      } else if (x < y) {
        do i += 1 while (i < na && a.getLong(i) == x)
      } else {
        do j += 1 while (j < nb && b.getLong(j) == y)
      }
    }
    while (i < na) {
      val x = a.getLong(i)
      union += 1
      do i += 1 while (i < na && a.getLong(i) == x)
    }
    while (j < nb) {
      val y = b.getLong(j)
      union += 1
      do j += 1 while (j < nb && b.getLong(j) == y)
    }
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongJaccard =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_long_jaccard"
}

/**
 * Distinct-intersection size of two SORTED long arrays (same merge pass as
 * [[SortedLongJaccard]], counting only the overlap). The integer primitive
 * behind asymmetric set measures — containment `|A∩B|/|A|` cannot be
 * recovered exactly from the Jaccard double, so verification joins that
 * need it read the count directly.
 */
case class SortedLongOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) {
        inter += 1
        do i += 1 while (i < na && a.getLong(i) == x)
        do j += 1 while (j < nb && b.getLong(j) == y)
      } else if (x < y) {
        do i += 1 while (i < na && a.getLong(i) == x)
      } else {
        do j += 1 while (j < nb && b.getLong(j) == y)
      }
    }
    inter
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongOverlap =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_long_overlap"
}

/**
 * Sorted distinct hashed word n-grams of a text column, in one primitive pass
 * over the UTF-8 bytes — no token strings, no gram strings, no boxed
 * intermediates. Token semantics mirror `split(trim(text), "\s+")` exactly:
 * trim removes ASCII spaces only; a leading whitespace run yields an empty
 * first token and a trailing run an empty last token (Java split, limit -1);
 * separators are runs of ASCII whitespace (multi-byte UTF-8 chars never
 * contain ASCII bytes, so byte scanning is safe). A gram's hash chains the
 * XXH64 hashes of its n tokens, so two grams collide iff their token tuples
 * match (modulo 64-bit hash collisions, as everywhere in this package).
 *
 * Exists because the straightforward HOF formulation is expensive enough that
 * `InferFiltersFromGenerate` + predicate pushdown (which clone an explode's
 * input expression into scan-level filters) dominate whole pipelines.
 */

/** Shared byte-scan tokenizer: XXH64 (seed 42) of each whitespace-delimited
 *  token of the TRIMMED input, mirroring `split(trim(text), "\\s+")` —
 *  leading/trailing whitespace runs yield empty tokens exactly like Java
 *  split with limit -1. Empty trimmed input yields an empty buffer with a
 *  zero token count (never null). */
private[functions] object TokenHashScan {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** (hash buffer, token count); the buffer may be longer than the count. */
  def scan(input: UTF8String): (Array[Long], Int) = {
    val trimmed = input.trim()
    val bytes = trimmed.getBytes
    val len = bytes.length
    if (len == 0) return (Array.emptyLongArray, 0)
    var tokHashes = new Array[Long](math.max(8, len / 4))
    var numToks = 0
    def push(start: Int, end: Int): Unit = {
      if (numToks == tokHashes.length) {
        tokHashes = java.util.Arrays.copyOf(tokHashes, tokHashes.length * 2)
      }
      tokHashes(numToks) = XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      numToks += 1
    }
    var i = 0
    var start = 0
    while (i < len) {
      if (isWs(bytes(i))) {
        push(start, i)
        do i += 1 while (i < len && isWs(bytes(i)))
        start = i
      } else {
        i += 1
      }
    }
    push(start, len)
    (tokHashes, numToks)
  }
}

case class HashedNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n >= 1, "n-gram size must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val (tokHashes, numToks) = TokenHashScan.scan(input.asInstanceOf[UTF8String])
    if (numToks < n) return new GenericArrayData(Array.emptyLongArray)
    val m = numToks - n + 1
    val grams = new Array[Long](m)
    var g = 0
    while (g < m) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(tokHashes(g + j), h); j += 1 }
      grams(g) = h
      g += 1
    }
    java.util.Arrays.sort(grams)
    var out = 1
    var k = 1
    while (k < m) {
      if (grams(k) != grams(k - 1)) { grams(out) = grams(k); out += 1 }
      k += 1
    }
    new GenericArrayData(if (out == m) grams else java.util.Arrays.copyOf(grams, out))
  }

  override protected def withNewChildInternal(c: Expression): HashedNgrams =
    copy(child = c)
  override def prettyName: String = "hashed_ngrams"
}

/**
 * Word n-gram hashes in POSITIONAL order: element `i` is the hash of the
 * gram starting at token `i`, duplicates kept — the shape span-level
 * operators need (a gram's array index IS its token offset). Same
 * tokenizer and gram hash chain as [[HashedNgrams]] (whose scaladoc
 * explains why combining per-token XXH64 hashes matches string-gram
 * equality), so the two expressions agree gram-for-gram. Fewer than `n`
 * tokens → empty array; null input → null.
 */
case class PositionalHashedNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n >= 1, "n-gram size must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val (tokHashes, numToks) = TokenHashScan.scan(input.asInstanceOf[UTF8String])
    if (numToks < n) return new GenericArrayData(Array.emptyLongArray)
    val m = numToks - n + 1
    val grams = new Array[Long](m)
    var g = 0
    while (g < m) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(tokHashes(g + j), h); j += 1 }
      grams(g) = h
      g += 1
    }
    new GenericArrayData(grams)
  }

  override protected def withNewChildInternal(c: Expression): PositionalHashedNgrams =
    copy(child = c)
  override def prettyName: String = "positional_hashed_ngrams"
}

/**
 * Occurrence statistics of the word n-grams of a text: returns
 * `struct(total_grams int, max_gram_count int)` — total n-gram count
 * (with duplicates) and the multiplicity of the most repeated n-gram.
 * `max_gram_count / total_grams` is the Gopher-style repetition signal
 * (fraction of n-grams claimed by the top n-gram). Same tokenizer and
 * gram hashing as [[HashedNgrams]], but keeps duplicates: one byte pass,
 * sort, run-length max. Fewer than `n` tokens → (0, 0).
 */
case class GramStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n >= 1, "n-gram size must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("total_grams", IntegerType, nullable = false),
    StructField("max_gram_count", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val (tokHashes, numToks) = TokenHashScan.scan(input.asInstanceOf[UTF8String])
    if (numToks < n) return org.apache.spark.sql.catalyst.InternalRow(0, 0)
    val m = numToks - n + 1
    val grams = new Array[Long](m)
    var g = 0
    while (g < m) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(tokHashes(g + j), h); j += 1 }
      grams(g) = h
      g += 1
    }
    java.util.Arrays.sort(grams)
    var best = 1
    var run = 1
    var k = 1
    while (k < m) {
      if (grams(k) == grams(k - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      k += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(m, best)
  }

  override protected def withNewChildInternal(c: Expression): GramStats =
    copy(child = c)
  override def prettyName: String = "gram_stats"
}

/**
 * True iff any element of the child long array is a member of `set`
 * (sorted, distinct). The membership table rides into the plan once and is
 * shared by every task via the task-binary broadcast — the executor-local
 * "Bloom filter" pattern of a decontamination pass, but exact. Per row:
 * one binary search per element, O(m log |set|); null elements are skipped
 * (cannot match).
 */
case class AnyInLongSet(child: Expression, set: Array[Long])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) {
        return true
      }
      i += 1
    }
    false
  }

  // The table is identity-compared by case-class equality on Array (eq);
  // that is correct here: two plans share this expression only when they
  // share the instance.
  override protected def withNewChildInternal(c: Expression): AnyInLongSet =
    copy(child = c)
  override def prettyName: String = "any_in_long_set"
}

/**
 * Number of elements of the child long array present in `set` (sorted,
 * distinct) — [[AnyInLongSet]]'s counting sibling, for overlap REPORTS
 * rather than drop decisions. Over a distinct input array (the
 * [[HashedNgrams]] contract) the result is the distinct-overlap
 * cardinality. Same execution pattern: the table rides with the task
 * binary, one binary search per element, zero shuffles.
 */
case class CountInLongSet(child: Expression, set: Array[Long])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) {
        c += 1
      }
      i += 1
    }
    c
  }

  override protected def withNewChildInternal(c: Expression): CountInLongSet =
    copy(child = c)
  override def prettyName: String = "count_in_long_set"
}

object SketchFunctions {
  def sorted_long_jaccard(a: Column, b: Column): Column =
    Bridge.column(SortedLongJaccard(Bridge.expression(a), Bridge.expression(b)))
  def sorted_long_overlap(a: Column, b: Column): Column =
    Bridge.column(SortedLongOverlap(Bridge.expression(a), Bridge.expression(b)))
  def minhash_signature(tokenHashes: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokenHashes), numHashes))
  def minhash_band_hashes(sig: Column, bands: Int): Column =
    Bridge.column(MinHashBandHashes(Bridge.expression(sig), bands))
  def simhash64(tokenHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokenHashes)))
  def simhash128(tokenHashes: Column): Column =
    Bridge.column(SimHash128(Bridge.expression(tokenHashes)))
  def array_jaccard(a: Column, b: Column): Column =
    Bridge.column(ArrayJaccard(Bridge.expression(a), Bridge.expression(b)))
  def hashed_ngrams(text: Column, n: Int): Column =
    Bridge.column(HashedNgrams(Bridge.expression(text), n))
  def positional_hashed_ngrams(text: Column, n: Int): Column =
    Bridge.column(PositionalHashedNgrams(Bridge.expression(text), n))
  def any_in_long_set(arr: Column, set: Array[Long]): Column =
    Bridge.column(AnyInLongSet(Bridge.expression(arr), set))
  def count_in_long_set(arr: Column, set: Array[Long]): Column =
    Bridge.column(CountInLongSet(Bridge.expression(arr), set))
  def gram_stats(text: Column, n: Int): Column =
    Bridge.column(GramStats(Bridge.expression(text), n))
}
