package graft.functions

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Map-side centroid / hyperplane expressions for ANN operators. Each takes
 * the small model (centroid matrix or hyperplane family) as a constructor
 * parameter — it ships to executors inside the serialized expression, the
 * moral equivalent of a broadcast for kilobyte-scale state — and evaluates
 * with zero shuffle: one primitive loop per row.
 */
abstract class VectorModelExpression extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float|double> input, got ${other.sql}")
    }

  @transient protected lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @inline protected final def at(a: ArrayData, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Cosine of the input row vector against a dense model row. */
  protected final def cosineWith(v: ArrayData, m: Array[Double], off: Int, dim: Int): Double = {
    val n = math.min(v.numElements(), dim)
    var d = 0.0; var nv = 0.0; var nm = 0.0
    var i = 0
    while (i < n) {
      val x = at(v, i); val y = m(off + i)
      d += x * y; nv += x * x; nm += y * y
      i += 1
    }
    val denom = math.sqrt(nv) * math.sqrt(nm)
    if (denom == 0.0) 0.0 else d / denom
  }
}

/**
 * Index of the nearest centroid by cosine (ties → lowest index). `centroids`
 * is a row-major `nlist × dim` matrix.
 */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
  extends VectorModelExpression {
  @transient private lazy val flat: Array[Double] = centroids.flatten
  @transient private lazy val dim: Int = if (centroids.isEmpty) 0 else centroids(0).length

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val s = cosineWith(v, flat, c * dim, dim)
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

/**
 * The `nprobe` nearest centroid indices by cosine (sim desc, index asc), as
 * array<int> — the query-side probe list of an IVF search.
 */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
  extends VectorModelExpression {
  @transient private lazy val flat: Array[Double] = centroids.flatten
  @transient private lazy val dim: Int = if (centroids.isEmpty) 0 else centroids(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) { sims(c) = cosineWith(v, flat, c * dim, dim); c += 1 }
    val idx = Array.range(0, centroids.length).sortBy(i => (-sims(i), i))
    new GenericArrayData(idx.take(math.min(nprobe, idx.length)).map(_.asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
  override def prettyName: String = "nearest_cells"
}

/**
 * All sign-LSH bucket keys of a vector in one pass: bucket `t` is the
 * `numPlanes`-bit signature of the vector against hash table `t`'s random
 * hyperplanes (deterministic from `seed + t`). Returns array<long> of length
 * `tables` — one expression evaluation replaces `tables × numPlanes`
 * separate dot-product columns.
 */
case class SignLshBuckets(
    child: Expression,
    tables: Int,
    numPlanes: Int,
    dim: Int,
    seed: Long)
  extends VectorModelExpression {

  // Row-major [table][plane][dim], generated once per (de)serialized instance.
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](tables * numPlanes * dim)
    var t = 0
    while (t < tables) {
      val rnd = new Random(seed + t)
      var i = 0
      while (i < numPlanes * dim) {
        out(t * numPlanes * dim + i) = rnd.nextGaussian()
        i += 1
      }
      t += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val buckets = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        val off = (t * numPlanes + p) * dim
        var d = 0.0
        var i = 0
        while (i < n) { d += at(v, i) * planes(off + i); i += 1 }
        if (d >= 0.0) bucket |= (1L << p)
        p += 1
      }
      buckets(t) = bucket
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def withNewChildInternal(c: Expression): SignLshBuckets =
    copy(child = c)
  override def prettyName: String = "sign_lsh_buckets"
}

/**
 * Exact integer squared-L2 argmin over a SHARD-INDEXED fine-centroid
 * family — the serve-side fast path of the two-level clustering
 * lifecycle when the stored model fits executor memory. Inputs
 * (shard int, qv array<long> micro-quantized); returns
 * struct(d2 long, fcl int, qv array<long>) — the same `__m` struct the
 * shard-keyed join + min(struct) plan produces, bit-identically: long
 * subtract/multiply/sum per dimension, ties to the LOWEST fcl (rows of
 * `fines(shard)` are fcl-ascending and the loop keeps the first strict
 * minimum). The join plan materializes one candidate row per (vector,
 * fine centroid) each carrying the vector itself — measured at the
 * 2M-vector × (177×177)-cluster decade to dominate serve wall time;
 * this is one primitive loop per row, zero extra rows.
 *
 * `fines(shard)` is the shard's row-major (kShard × dim) centroid
 * matrix; `fcls(shard)` maps matrix row → stored fcl id (ascending).
 */
case class NearestFineCentroidL2(
    shard: Expression,
    qv: Expression,
    fines: Array[Array[Long]],
    fcls: Array[Array[Int]],
    dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def left: Expression = shard
  override def right: Expression = qv

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (shard.dataType, qv.dataType) match {
      case (IntegerType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (int, array<bigint>), got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("fcl", IntegerType, nullable = false),
    StructField("qv", ArrayType(LongType, containsNull = true))))

  override def nullSafeEval(s: Any, v: Any): Any = {
    val sh = s.asInstanceOf[Int]
    val a = v.asInstanceOf[ArrayData]
    // Dim drift fails LOUDLY: truncating the loop to min(len, dim) would
    // silently score a prefix while the join-plan tier's zip_with pads
    // with null — two serve tiers quietly disagreeing on malformed
    // input. A query vector must match the model dim exactly.
    if (a.numElements() != dim) {
      throw new IllegalArgumentException(
        s"nearest_fine_centroid_l2: query vector has ${a.numElements()} " +
          s"elements, stored model dim is $dim — dim-drifted input")
    }
    val flat = fines(sh)
    val ids = fcls(sh)
    val n = dim
    var bestD2 = Long.MaxValue
    var bestF = 0
    var r = 0
    while (r < ids.length) {
      val off = r * dim
      var d2 = 0L
      var i = 0
      while (i < n) {
        val d = a.getLong(i) - flat(off + i)
        d2 += d * d
        i += 1
      }
      if (d2 < bestD2) { bestD2 = d2; bestF = ids(r) }
      r += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bestD2, bestF, a.copy())
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NearestFineCentroidL2 =
    copy(shard = l, qv = r)
  override def prettyName: String = "nearest_fine_centroid_l2"
}

object CentroidFunctions {
  def nearest_centroid(v: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(v), centroids))
  def nearest_fine_centroid_l2(
      shard: Column, qv: Column,
      fines: Array[Array[Long]], fcls: Array[Array[Int]], dim: Int): Column =
    Bridge.column(NearestFineCentroidL2(
      Bridge.expression(shard), Bridge.expression(qv), fines, fcls, dim))
  def nearest_cells(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(v), centroids, nprobe))
  def sign_lsh_buckets(v: Column, tables: Int, numPlanes: Int, dim: Int, seed: Long): Column =
    Bridge.column(SignLshBuckets(Bridge.expression(v), tables, numPlanes, dim, seed))
}
