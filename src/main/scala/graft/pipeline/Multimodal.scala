package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns next to a typed metadata struct, and per-row feature
 * extraction is a map-side transform that never shuffles.
 *
 * IMAGE decode and resize are REAL (JDK-only `javax.imageio` kernels in
 * [[ImageCodec]], oracle-gated by q30/q65), and AUDIO decode is REAL
 * (byte-layout RIFF/WAVE PCM16 parsing in [[AudioCodec]], oracle-gated by
 * q67). Video decode stays STUBBED — the JDK ships no video codec — as a
 * clearly-marked deterministic fake ([[stubFrameSample]]); everything
 * around the stub (schema shape, batch-safe expressions, partition sizing
 * guidance) is real and tested. Swapping a stub for a real decoder means
 * replacing one kernel of the same batched signature.
 */
object Multimodal {

  /** Canonical metadata struct for a binary media payload. */
  def mediaMeta(bin: Column, format: String): Column =
    struct(
      length(bin).as("byte_len"),
      xxhash64(bin).as("checksum"),
      lit(format).as("format"))

  /**
   * STUB decoder: deterministic pseudo-features derived from the payload
   * bytes (xxhash64 with per-dimension salt, scaled to [0,1)). Replace with a
   * real decode kernel; the signature and plan shape are what production
   * code would use.
   */
  def stubDecodeFeatures(bin: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(bin, i), lit(1000000L)).cast("double") / 1000000.0))

  /**
   * STUB resize: a "thumbnail" that is a deterministic byte slice of the
   * payload — stands in for image resizing while keeping real binary slicing
   * plumbing (`substring` over BinaryType).
   */
  def stubResize(bin: Column, maxBytes: Int): Column =
    substring(bin, 1, maxBytes)

  /**
   * Frame sampling for "video" payloads: splits the payload into `frames`
   * equal byte ranges and keeps each range's slice — the partition-friendly
   * shape (one row in, array of frames out; explode downstream if needed).
   */
  def stubFrameSample(bin: Column, frames: Int): Column = {
    val flen = greatest(length(bin).cast("int") / frames, lit(1))
    transform(sequence(lit(0), lit(frames - 1)),
      i => substring_index_safe(bin, i * flen + 1, flen))
  }

  private def substring_index_safe(bin: Column, pos: Column, len: Column): Column =
    call_function("substring", bin, pos, len)

  /**
   * Attach the standard multimodal block to a DataFrame with a binary
   * payload column: metadata, features, thumbnail.
   */
  def withMediaColumns(df: DataFrame, binCol: String, format: String, dim: Int): DataFrame = {
    val b = col(binCol)
    df.withColumn("meta", mediaMeta(b, format))
      .withColumn("features", stubDecodeFeatures(b, dim))
      .withColumn("thumb", stubResize(b, 64))
  }

  /**
   * Batched kernel execution — the Scala analogue of `mapInPandas`: rows
   * stream through each partition in fixed-size batches, the kernel runs
   * ONCE per batch of payloads (the shape a real decoder needs — ONNX
   * session, JNI codec, GPU feature extractor — so per-call overhead
   * amortizes across the batch), and outputs rejoin their rows in order as
   * a `features array<float>` column. Lazy batching: one batch in flight
   * per task, memory O(batchSize × payload) regardless of partition size.
   * No shuffle; partitioning and all existing columns pass through.
   *
   * The kernel must be per-batch pure (no state across batches) — the spec
   * pins batch-size independence. Swap [[stubBatchKernel]] for the real
   * decoder; everything else is production plumbing.
   *
   * NULL payloads never reach the kernel (a real decoder would NPE/segfault
   * on one, deep inside a task): they are filtered out of each batch and
   * their rows pass through with a NULL `features` column.
   */
  def withBatchedFeatures(
      df: DataFrame,
      binCol: String,
      batchSize: Int,
      kernel: Seq[Array[Byte]] => Seq[Array[Float]]): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    withBatchedColumn(df, binCol, "features",
      ArrayType(FloatType, containsNull = false), batchSize,
      payloads => kernel(payloads).map(_.toSeq))
  }

  /**
   * Binary→binary variant of the batched runner (same batching, null
   * passthrough, and purity contract): payloads in, transformed payloads
   * out as `outCol binary`. The shape for resize/transcode/thumbnail
   * kernels, where the output is another payload rather than features.
   */
  def withBatchedBinary(
      df: DataFrame,
      binCol: String,
      outCol: String,
      batchSize: Int,
      kernel: Seq[Array[Byte]] => Seq[Array[Byte]]): DataFrame = {
    import org.apache.spark.sql.types.BinaryType
    withBatchedColumn(df, binCol, outCol, BinaryType, batchSize,
      payloads => kernel(payloads))
  }

  /**
   * Struct-output variant of the batched runner (same batching, null
   * passthrough, and purity contract): payloads in, one `Row` matching
   * `outSchema` out per payload, attached as `outCol struct<...>`. The
   * shape for metadata/feature extractors whose outputs are heterogeneous
   * scalars (e.g. [[AudioCodec.featureKernel]]) rather than one vector.
   */
  def withBatchedStruct(
      df: DataFrame,
      binCol: String,
      outCol: String,
      outSchema: org.apache.spark.sql.types.StructType,
      batchSize: Int,
      kernel: Seq[Array[Byte]] => Seq[org.apache.spark.sql.Row]): DataFrame =
    withBatchedColumn(df, binCol, outCol, outSchema, batchSize,
      payloads => kernel(payloads))

  /**
   * Frames variant of the batched runner (same batching, null passthrough,
   * and purity contract): payloads in, the sampled frames out per payload
   * as `outCol array<binary>` — explode downstream for per-frame work
   * (decode, resize, feature-extract), which parallelizes frame-wise with
   * no shuffle. The shape for [[VideoCodec.frameSampleKernel]] and any real
   * demuxer with the same signature.
   */
  def withBatchedFrames(
      df: DataFrame,
      binCol: String,
      outCol: String,
      batchSize: Int,
      kernel: Seq[Array[Byte]] => Seq[Seq[Array[Byte]]]): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, BinaryType}
    withBatchedColumn(df, binCol, outCol,
      ArrayType(BinaryType, containsNull = false), batchSize,
      payloads => kernel(payloads))
  }

  /** Shared batched-kernel executor; `kernel` returns one CELL VALUE (in
   *  `outType`'s external representation) per non-null payload. */
  private def withBatchedColumn(
      df: DataFrame,
      binCol: String,
      outCol: String,
      outType: org.apache.spark.sql.types.DataType,
      batchSize: Int,
      kernel: Seq[Array[Byte]] => Seq[Any]): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    import org.apache.spark.sql.{Encoders, Row}
    val idx = df.schema.fieldIndex(binCol)
    val outSchema = df.schema.add(outCol, outType)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val payloads = batch.map(_.getAs[Array[Byte]](idx))
        val present = payloads.filter(_ != null)
        val outs =
          if (present.isEmpty) Seq.empty[Any] else kernel(present)
        require(outs.length == present.length,
          s"kernel returned ${outs.length} outputs for ${present.length} inputs")
        val outIt = outs.iterator
        batch.lazyZip(payloads).map { (r, p) =>
          Row.fromSeq(r.toSeq :+ (if (p == null) null else outIt.next()))
        }
      }
    }(enc)
  }

  /** STUB batch kernel: deterministic per-payload pseudo-features (salted
   *  xxhash64 of the bytes, scaled to [0,1)); stands in for the real
   *  decode+embed call with the same batched signature. */
  def stubBatchKernel(dim: Int): Seq[Array[Byte]] => Seq[Array[Float]] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    payloads => payloads.map { bytes =>
      Array.tabulate(dim) { i =>
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, i.toLong)
        (java.lang.Math.floorMod(h, 1000000L).toFloat / 1000000.0f)
      }
    }
  }
}
