package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/**
 * Real, JDK-only audio codec for the multimodal pipeline: RIFF/WAVE PCM16
 * mono encode/decode by direct byte-layout parsing — no codec libraries,
 * no `javax.sound` service discovery (headless-safe). This replaces the
 * stub for the audio modality the way [[ImageCodec]] did for images: q67 is
 * gated by a full DuckDB oracle on planted fixtures whose sample values are
 * integer functions of the row id, and every extracted feature is integer
 * arithmetic (sum of squares, peak, zero crossings, integer-division
 * duration) — the gate passes only if the WAV encode∘decode∘extract chain
 * is faithful, with no float-rounding escape hatch. Video decode remains
 * stubbed ([[Multimodal.stubFrameSample]]): the JDK ships no video codec.
 *
 * The feature kernel has the batched signature
 * [[Multimodal.withBatchedStruct]] executes — the swap-in shape for a real
 * DSP/embedding extractor at scale. Decode cost is per-row map work; it
 * scales linearly and never shuffles.
 */
object AudioCodec {

  /** Feature row layout produced by [[featureKernel]] — all LongType so the
    * DuckDB oracle compares exact integers, never floats. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("sample_rate", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false)))

  /** Canonical 44-byte-header RIFF/WAVE, PCM16, mono, little-endian. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen) // riff payload size
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16) // PCM fmt chunk size
    buf.putShort(1) // audio format: PCM
    buf.putShort(1) // channels: mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Parse a PCM16-mono WAV: walks the chunk list (any order, pad bytes
    * honored), requires PCM/mono/16-bit. Malformed payloads fail loudly —
    * silently emitting garbage features would poison downstream filtering. */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 12, s"not a WAV: ${bytes.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a WAV: missing RIFF magic")
    buf.getInt // riff size (trust the actual array bound instead)
    require(fourcc() == "WAVE", "not a WAV: missing WAVE form type")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      val id = fourcc()
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(),
        s"corrupt WAV: chunk '$id' claims $size bytes, ${buf.remaining()} remain")
      val next = buf.position() + size + (size & 1) // chunks pad to even
      id match {
        case "fmt " =>
          require(size >= 16, s"corrupt WAV: fmt chunk of $size bytes")
          val fmt = buf.getShort()
          val channels = buf.getShort()
          sampleRate = buf.getInt()
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort()
          require(fmt == 1 && channels == 1 && bits == 16,
            s"unsupported WAV: fmt=$fmt channels=$channels bits=$bits " +
              "(only PCM16 mono)")
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort(); i += 1 }
        case _ => // LIST/INFO/etc: skip
      }
      buf.position(math.min(next, bytes.length))
    }
    require(sampleRate > 0, "corrupt WAV: no fmt chunk")
    require(samples != null, "corrupt WAV: no data chunk")
    (sampleRate, samples)
  }

  /**
   * Audio perceptual fingerprint (chromaprint-style energy-delta bits):
   * decode PCM16, stripe samples into 65 frames (`frame(i) = i*65 div n` —
   * every frame non-empty for n ≥ 65), per-frame energy `Σ|v|`, and
   * `bit k = E[k+1] >= E[k]` for k = 0..63 — a 64-bit key whose bits
   * survive volume-preserving edits that shift absolute levels but not the
   * LOUDER/QUIETER shape between neighboring frames. Packed as the same
   * 16-char lowercase hex [[ImageCodec.aHashHex]] uses (bit k from the
   * LSB), so [[Dedup.hexHashNearDupPairs]] gives audio near-dup directly.
   * Pure integer arithmetic end to end — exactly replayable in SQL.
   */
  def fingerprintHex(bytes: Array[Byte]): String = {
    val (_, samples) = decodeWavPcm16(bytes)
    val n = samples.length
    require(n >= 65, s"fingerprint needs >= 65 samples, got $n")
    val energy = new Array[Long](65)
    var i = 0
    while (i < n) {
      energy((i * 65) / n) += math.abs(samples(i).toLong)
      i += 1
    }
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (energy(k + 1) >= energy(k)) hash |= (1L << k)
      k += 1
    }
    f"$hash%016x"
  }

  /** Batched fingerprint kernel for [[Multimodal.withBatchedStruct]]. */
  def fingerprintKernel: Seq[Array[Byte]] => Seq[Row] = payloads =>
    payloads.map(b => Row(fingerprintHex(b)))

  /**
   * Real batched feature extraction: WAV bytes → `(sample_rate, n_samples,
   * duration_ms, sum_sq, peak, zero_crossings)`, all integers:
   * `duration_ms = n_samples * 1000 / rate` (integer division), `sum_sq` the
   * exact energy `Σ v²`, `peak = max |v|`, and a zero crossing counted at
   * each strict sign change (`v[i-1] * v[i] < 0`). Integer features are the
   * point: the q67 oracle recomputes them exactly in DuckDB from the fixture
   * formula, so a one-sample decode error fails the gate.
   */
  val featureKernel: Seq[Array[Byte]] => Seq[Row] =
    payloads => payloads.map { bytes =>
      val (rate, samples) = decodeWavPcm16(bytes)
      var sumSq = 0L
      var peak = 0L
      var crossings = 0L
      var prev = 0
      var i = 0
      while (i < samples.length) {
        val v = samples(i).toInt
        sumSq += v.toLong * v
        val a = math.abs(v.toLong)
        if (a > peak) peak = a
        if (i > 0 && prev.toLong * v < 0) crossings += 1
        prev = v
        i += 1
      }
      Row(rate.toLong, samples.length.toLong,
        samples.length.toLong * 1000L / rate, sumSq, peak, crossings)
    }
}
