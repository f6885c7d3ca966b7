package graft.pipeline

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

class AudioFingerprintSuite extends AnyFunSuite {

  /** Direct reimplementation over raw samples, no WAV codec. */
  private def referenceFp(samples: Array[Short]): String = {
    val n = samples.length
    val e = new Array[Long](65)
    samples.zipWithIndex.foreach { case (v, i) => e(i * 65 / n) += math.abs(v.toLong) }
    val hash = (0 until 64).collect { case k if e(k + 1) >= e(k) => 1L << k }
      .foldLeft(0L)(_ | _)
    f"$hash%016x"
  }

  test("fingerprint matches the reference through a real WAV roundtrip") {
    val rnd = new Random(23)
    for (_ <- 0 until 50) {
      val n = 65 + rnd.nextInt(200)
      val samples = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val wav = AudioCodec.encodeWavPcm16(8000 + rnd.nextInt(3) * 4000, samples)
      assert(AudioCodec.fingerprintHex(wav) === referenceFp(samples))
    }
  }

  test("fingerprint is invariant to uniform volume scaling down") {
    // halving every sample halves every frame energy: all comparisons keep
    // their direction (>= on equals stays equal), so the key is identical.
    val rnd = new Random(5)
    val samples = Array.fill(130)((rnd.nextInt(65536) - 32768).toShort)
    val halved = samples.map(v => (v / 2).toShort)
    val a = AudioCodec.fingerprintHex(AudioCodec.encodeWavPcm16(16000, samples))
    val b = AudioCodec.fingerprintHex(AudioCodec.encodeWavPcm16(16000, halved))
    // halving truncates toward zero, which can flip a near-tie; allow <= 2
    // differing bits rather than exact equality
    val ham = java.lang.Long.bitCount(
      java.lang.Long.parseUnsignedLong(a, 16) ^ java.lang.Long.parseUnsignedLong(b, 16))
    assert(ham <= 2, s"volume halving moved $ham bits")
  }

  test("single-frame edit moves few bits; unrelated signals differ widely") {
    val rnd = new Random(11)
    val base = Array.fill(130)((rnd.nextInt(65536) - 32768).toShort)
    val edited = base.clone()
    (40 until 42).foreach(i => edited(i) = 32000.toShort)
    val other = Array.fill(130)((rnd.nextInt(65536) - 32768).toShort)
    def fp(s: Array[Short]) = java.lang.Long.parseUnsignedLong(
      AudioCodec.fingerprintHex(AudioCodec.encodeWavPcm16(16000, s)), 16)
    val hamEdit = java.lang.Long.bitCount(fp(base) ^ fp(edited))
    val hamOther = java.lang.Long.bitCount(fp(base) ^ fp(other))
    assert(hamEdit <= 4, s"local edit moved $hamEdit bits")
    assert(hamOther >= 15, s"unrelated signals only $hamOther bits apart")
  }

  test("fingerprint refuses signals shorter than 65 samples") {
    val wav = AudioCodec.encodeWavPcm16(8000, Array.fill(64)(1.toShort))
    val e = intercept[IllegalArgumentException](AudioCodec.fingerprintHex(wav))
    assert(e.getMessage.contains("65"))
  }
}
