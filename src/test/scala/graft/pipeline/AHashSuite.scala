package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class AHashSuite extends AnyFunSuite {

  /** Direct reimplementation over a known pixel function, no ImageIO. */
  private def referenceHash(w: Int, h: Int, gray: (Int, Int) => Int): String = {
    val avg = for (i <- 0 until 8; j <- 0 until 8) yield {
      val (y0, y1) = (i * h / 8, (i + 1) * h / 8)
      val (x0, x1) = (j * w / 8, (j + 1) * w / 8)
      val px = for (y <- y0 until y1; x <- x0 until x1) yield gray(x, y).toLong
      px.sum / px.length
    }
    val mean = avg.sum / 64
    val hash = avg.zipWithIndex.collect { case (a, k) if a >= mean => 1L << k }
      .foldLeft(0L)(_ | _)
    f"$hash%016x"
  }

  test("aHash matches a direct reimplementation on two-tone fixtures") {
    for (id <- 0L until 100L) {
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 3).toInt
      val split = 1 + (id % 7).toInt
      val ga = (((id % 10) * 13 + 7) % 256).toInt
      val gb = (((id % 10) * 29 + 3) % 256).toInt
      val bytes = ImageCodec.encodeTwoTonePng(w, h, split, ga, gb)
      val expected = referenceHash(w, h, (x, _) => if (x < split) ga else gb)
      assert(ImageCodec.aHashHex(bytes) === expected, s"id=$id")
    }
  }

  test("aHash: solid image hashes to all-ones; gradient is not degenerate") {
    // solid: every block avg == mean -> every bit >= mean -> ffff...
    assert(ImageCodec.aHashHex(ImageCodec.encodePng(16, 16, 0x777777)) ===
      "ffffffffffffffff")
    // left-dark/right-light half split at 8 of 16 -> low nibble columns dark
    val twoTone = ImageCodec.encodeTwoTonePng(16, 16, 8, 0, 255)
    val hex = ImageCodec.aHashHex(twoTone)
    assert(hex === "f0f0f0f0f0f0f0f0")
  }

  test("aHash matches the reference on quadrant fixtures at varied dims") {
    for (id <- 0L until 120L) {
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 3).toInt
      val sx = 1 + (id % 7).toInt
      val sy = 1 + (id % 5).toInt
      val ga = (((id % 98) * 17 + 5) % 256).toInt
      val gb = (((id % 98) * 23 + 11) % 256).toInt
      val gc = (((id % 50) * 29 + 1) % 256).toInt
      val gd = (((id % 50) * 31 + 2) % 256).toInt
      val bytes = ImageCodec.encodeQuadrantPng(w, h, sx, sy, ga, gb, gc, gd)
      val expected = referenceHash(w, h, (x, y) =>
        if (x < sx) { if (y < sy) ga else gc } else { if (y < sy) gb else gd })
      assert(ImageCodec.aHashHex(bytes) === expected, s"id=$id")
    }
  }

  test("aHash refuses images smaller than 8x8") {
    val tiny = ImageCodec.encodePng(4, 4, 0x123456)
    val e = intercept[IllegalArgumentException](ImageCodec.aHashHex(tiny))
    assert(e.getMessage.contains("8x8"))
  }

  test("aHash is invariant to image height for column-uniform images") {
    val a = ImageCodec.aHashHex(ImageCodec.encodeTwoTonePng(11, 8, 4, 30, 200))
    val b = ImageCodec.aHashHex(ImageCodec.encodeTwoTonePng(11, 64, 4, 30, 200))
    assert(a === b)
  }
}
