package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/**
 * Real, JDK-only image codec for the multimodal pipeline: PNG and BMP
 * encode/decode through `javax.imageio` — no native libraries, works
 * headless. This replaces the stub for the image modality (q30 is gated by
 * a full DuckDB oracle on planted fixtures whose dimensions and mean color
 * are predictable from the row id — the gate passes only if the PNG
 * encode∘decode roundtrip is faithful). Audio decode is also real
 * ([[AudioCodec]], WAV PCM16), and video demuxes from a real container
 * ([[VideoCodec]]: MJPEG-in-AVI, plus the GFV1 fixture container).
 *
 * The decode kernel has the exact batched signature
 * [[Multimodal.withBatchedFeatures]] executes — swap-in shape for an ONNX
 * or JNI extractor at scale. Decode cost is per-row map work; it scales
 * linearly and never shuffles.
 */
object ImageCodec {

  /** Feature vector layout produced by [[decodeKernel]]. */
  val DecodeDim = 5

  /** Deterministic solid-color fixture: `width × height`, every pixel the
   *  packed 24-bit `rgb`. PNG is lossless, so decode recovers the exact
   *  color — the property the q30 oracle leans on. */
  def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] =
    encode(width, height, rgb, "png")

  def encodeBmp(width: Int, height: Int, rgb: Int): Array[Byte] =
    encode(width, height, rgb, "bmp")

  /**
   * Solid-GRAY JPEG fixture at compression quality 1.0. Unlike arbitrary
   * colors, a uniform gray survives JPEG EXACTLY: r=g=b maps to
   * (Y=gray, Cb=Cr=128), a solid block is DC-only so the max-quality
   * quantizer stores it losslessly, chroma subsampling of a constant plane
   * is the identity, and the YCbCr→RGB inverse lands back on the integer.
   * Verified exact for all 256 grays across the fixture dim range — the
   * property the q69 AVI oracle leans on (q30's PNG lean is the lossless
   * format itself; this one is a measured property of the gray subspace).
   */
  def encodeJpegGray(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad fixture dims ${width}x$height")
    require(gray >= 0 && gray <= 255, s"gray out of range: $gray")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  private def encode(width: Int, height: Int, rgb: Int, format: String): Array[Byte] = {
    require(width > 0 && height > 0, s"bad fixture dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, format, bos)
    require(ok, s"no JDK ImageIO writer for '$format'")
    bos.toByteArray
  }

  /**
   * Real batched decode: payload bytes → `[width, height, meanR, meanG,
   * meanB]` floats. One `ImageIO.read` per payload (the per-batch closure
   * shape lets a real extractor amortize session setup; ImageIO itself
   * needs none). An undecodable payload fails the task loudly — silently
   * emitting garbage features would poison downstream similarity search;
   * pre-filter undecodable rows with [[Multimodal.withBatchedFeatures]]'s
   * null passthrough by nulling them out first.
   */
  /**
   * Real batched resize: images whose longest side exceeds `maxDim` scale
   * down to fit it (aspect preserved), re-encoded as PNG; already-small
   * payloads pass through byte-identical. Target dimensions use INTEGER
   * arithmetic — `max(1, side * maxDim / longest)` — so any oracle can
   * reproduce them exactly without float-rounding hazards. Pixel sampling
   * is `Graphics2D.drawImage`'s default (nearest); pass quality hints in a
   * custom kernel if resampling quality ever matters more than determinism.
   */
  def resizeKernel(maxDim: Int): Seq[Array[Byte]] => Seq[Array[Byte]] = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    payloads => payloads.map { bytes =>
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "payload is not a JDK-decodable image (png/bmp/gif/jpeg)")
      val w = img.getWidth
      val h = img.getHeight
      val m = math.max(w, h)
      if (m <= maxDim) bytes
      else {
        val nw = math.max(1, w * maxDim / m)
        val nh = math.max(1, h * maxDim / m)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
        val bos = new ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(out, "png", bos), "no PNG writer")
        bos.toByteArray
      }
    }
  }

  /**
   * Two-tone fixture: columns `[0, split)` are `grayA`, the rest `grayB`
   * (both painted as r=g=b gray so integer luma recovers them exactly).
   * Gives [[aHashHex]] a non-degenerate, exactly-replayable bit pattern.
   */
  def encodeTwoTonePng(width: Int, height: Int, split: Int, grayA: Int, grayB: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad fixture dims ${width}x$height")
    require(split >= 0 && split <= width, s"split $split out of [0,$width]")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = if (x < split) grayA else grayB
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "no PNG writer")
    bos.toByteArray
  }

  /**
   * Quadrant fixture: the four (column < sx) × (row < sy) regions get the
   * four grays (again painted r=g=b). Unlike the two-tone stripe this has
   * ROW structure, so the aHash row-block bytes differ and banded near-dup
   * joins see partial band agreement — the case they exist for.
   */
  def encodeQuadrantPng(
      width: Int, height: Int, sx: Int, sy: Int,
      gA: Int, gB: Int, gC: Int, gD: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad fixture dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g =
          if (x < sx) { if (y < sy) gA else gC }
          else { if (y < sy) gB else gD }
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "no PNG writer")
    bos.toByteArray
  }

  /** Arbitrary grayscale fixture from a row-major pixel matrix
   *  (`pixels(y)(x)`, each 0..255 painted r=g=b). */
  def encodeGrayPixelsPng(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    require(h > 0 && pixels(0).length > 0, "empty pixel matrix")
    val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      require(pixels(y).length == w, "ragged pixel matrix")
      var x = 0
      while (x < w) {
        val g = pixels(y)(x)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "no PNG writer")
    bos.toByteArray
  }

  /**
   * Average-hash (aHash) perceptual fingerprint, the classic near-dup key
   * for image dedup: decode, integer luma `(r+g+b)/3` per pixel, 8×8
   * block-average downsample with floor block bounds (`x0 = j*w/8`,
   * `x1 = (j+1)*w/8`; needs w,h ≥ 8 so every block is non-empty),
   * `bit(i,j) = blockAvg >= mean` with `mean = floor(Σavg/64)`, bit index
   * `i*8+j` from the LSB. ALL arithmetic is integer floor division, so any
   * SQL engine replays the hash bit-for-bit from known pixel layouts.
   *
   * Emitted as 16-char lowercase hex rather than a signed 64-bit value:
   * hashes with bit 63 set would need unsigned semantics the oracle side
   * can't express without overflow.
   */
  def aHashHex(bytes: Array[Byte]): String = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a JDK-decodable image (png/bmp/gif/jpeg)")
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 8 && h >= 8, s"aHash needs an image >= 8x8, got ${w}x$h")
    val avg = new Array[Long](64)
    var i = 0
    while (i < 8) {
      val y0 = i * h / 8
      val y1 = (i + 1) * h / 8
      var j = 0
      while (j < 8) {
        val x0 = j * w / 8
        val x1 = (j + 1) * w / 8
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        avg(i * 8 + j) = sum / ((y1 - y0).toLong * (x1 - x0))
        j += 1
      }
      i += 1
    }
    val mean = avg.sum / 64
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (avg(k) >= mean) hash |= (1L << k)
      k += 1
    }
    f"$hash%016x"
  }

  /** Batched aHash kernel for [[Multimodal.withBatchedStruct]]. */
  def aHashKernel: Seq[Array[Byte]] => Seq[org.apache.spark.sql.Row] = payloads =>
    payloads.map(b => org.apache.spark.sql.Row(aHashHex(b)))

  def decodeKernel: Seq[Array[Byte]] => Seq[Array[Float]] = payloads =>
    payloads.map { bytes =>
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "payload is not a JDK-decodable image (png/bmp/gif/jpeg)")
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L
      var sg = 0L
      var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff
          sg += (p >> 8) & 0xff
          sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n)
    }
}
