package graft.pipeline

/**
 * Frame container for the video modality: `GFV1`, a minimal length-prefixed
 * concatenation of encoded frames (magic, frame count, then `[len][bytes]`
 * per frame). The JDK ships no standard video demuxer, so a *standard*
 * codec can't be decoded here; this container is the honest middle ground —
 * the demux step (header walk, bounds checks, frame slicing) is REAL parsing
 * of a documented byte layout, and each extracted frame is a complete
 * encoded image that the REAL [[ImageCodec]] kernel decodes downstream.
 * Swapping in a true demuxer (JNI ffmpeg etc.) means replacing
 * [[frameSampleKernel]] with one of the same batched signature; the
 * plumbing ([[Multimodal.withBatchedFrames]] → explode → decode) is the
 * production shape either way: one row in, array of frames out, per-frame
 * work parallelized by the explode, never a shuffle in the decode itself.
 */
object VideoCodec {

  private val Magic = Array[Byte]('G', 'F', 'V', '1')

  /** Pack encoded frames (any image format [[ImageCodec]] reads) into one
    * GFV1 payload. */
  def encodeGfv(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(4 + _.length).sum
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic)
    buf.putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Demux every frame. Malformed containers fail loudly (truncated frame,
    * bad magic, negative length) — silently dropping frames would skew any
    * downstream per-frame statistic. */
  def decodeGfv(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes.length >= 8, s"not a GFV1 container: ${bytes.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, Magic),
      "not a GFV1 container: bad magic")
    val n = buf.getInt
    require(n >= 0, s"corrupt GFV1: negative frame count $n")
    (0 until n).map { i =>
      require(buf.remaining() >= 4, s"corrupt GFV1: truncated at frame $i")
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(),
        s"corrupt GFV1: frame $i claims $len bytes, ${buf.remaining()} remain")
      val f = new Array[Byte](len)
      buf.get(f)
      f
    }
  }

  /**
   * Batched frame sampling: demux each payload and keep every `stride`-th
   * frame (0, stride, 2·stride, …) — the temporal-subsampling shape a
   * training pipeline wants (decode cost scales with frames KEPT, not
   * frames present, once a real demuxer seeks). Output cell per payload is
   * the kept frames as `array<binary>`.
   */
  def frameSampleKernel(stride: Int): Seq[Array[Byte]] => Seq[Seq[Array[Byte]]] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    payloads => payloads.map { bytes =>
      val frames = decodeGfv(bytes)
      (0 until frames.length by stride).map(frames)
    }
  }
}
