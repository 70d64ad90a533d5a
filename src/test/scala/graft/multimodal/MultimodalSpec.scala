package graft.multimodal

import graft.SparkSpec

/** Real image decode: the Png writer's output must round-trip through
  * javax.imageio with true dimensions, and the dHash must behave like a
  * perceptual hash (deterministic, locality-sensitive, size-robust).
  */
class MultimodalSpec extends SparkSpec {

  private def gradient(w: Int, h: Int): Array[Byte] =
    Png.encodeGray(w, h, (x, _) => x * 255 / (w - 1))

  test("PNG writer round-trips through ImageIO with true dimensions") {
    for ((w, h) <- Seq((9, 8), (17, 12), (200, 3), (64, 64))) {
      val bytes = Png.encodeGray(w, h, (x, y) => (x * 7 + y * 13) % 256)
      assert(bytes.length == Png.encodedLength(w, h),
        s"encodedLength formula drifted for ${w}x$h")
      val f = Multimodal.decode(1L, bytes)
      assert((f.width, f.height, f.channels, f.format) == ((w, h, 3, "png")))
      assert(f.n_bytes == bytes.length)
    }
  }

  test("multi-block zlib framing decodes (raw > 65535 bytes)") {
    // 120*200 RGB raw = 200*(1+360) = 72200 > 65535 → two stored blocks.
    val bytes = Png.encodeGray(120, 200, (x, y) => (x + y) % 256)
    assert(bytes.length == Png.encodedLength(120, 200))
    val f = Multimodal.decode(2L, bytes)
    assert((f.width, f.height, f.format) == ((120, 200, "png")))
  }

  test("dHash: painted 9x8 image reproduces its target bit pattern") {
    for (id <- Seq(2L, 6L, 10L, 94L)) {
      val target = (id * 2654435761L) % 2147483647L
      val bytes = Png.encodeGray(9, 8, (x, y) => {
        var g = 120
        var i = 0
        while (i < x) {
          g += (if (((target >> (y * 8 + i)) & 1L) == 1L) 15 else -15)
          i += 1
        }
        g
      })
      assert(Multimodal.decode(id, bytes).phash == target)
    }
  }

  test("dHash: horizontal gradient sets all 64 bits at any width") {
    for (w <- Seq(9, 16, 22, 100)) {
      assert(Multimodal.decode(0L, gradient(w, 12)).phash == -1L,
        s"gradient width $w")
    }
  }

  test("dHash is locality-sensitive: small perturbation, small distance") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = Png.encodeGray(36, 32, (x, y) => (x * 5 + y * 3) % 251)
    // One brightened pixel: a near-duplicate.
    val near = Png.encodeGray(36, 32, (x, y) =>
      if (x == 17 && y == 15) 255 else (x * 5 + y * 3) % 251)
    // Reversed horizontal gradient: flips most comparison signs.
    val far = Png.encodeGray(36, 32, (x, y) => ((35 - x) * 5 + y * 3) % 251)
    val hBase = Multimodal.decode(0L, base).phash
    assert(hamming(hBase, Multimodal.decode(1L, near).phash) <= 4)
    assert(hamming(hBase, Multimodal.decode(2L, far).phash) >= 16)
  }

  test("JPEG decodes with true dimensions via ImageIO") {
    val img = new java.awt.image.BufferedImage(
      40, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 40; y <- 0 until 30)
      img.setRGB(x, y, ((x * 6) % 256 << 16) | ((y * 8) % 256 << 8))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val f = Multimodal.decode(3L, out.toByteArray)
    assert((f.width, f.height, f.format) == ((40, 30, "jpeg")))
  }

  test("non-image bytes fall back to the deterministic stub") {
    val f = Multimodal.decode(7L, "not an image".getBytes("UTF-8"))
    assert(f.format == "png" || f.format == "jpeg") // stub's parity rule
    assert(f.phash ==
      Multimodal.decodeStub(7L, "not an image".getBytes("UTF-8")).phash)
    // Truncated PNG: sniffs as image, fails decode, still lands on stub.
    val truncated = gradient(16, 12).take(20)
    assert(Multimodal.decode(8L, truncated).phash ==
      Multimodal.decodeStub(8L, truncated).phash)
  }

  test("extractFeatures runs the real decoder distributed") {
    import spark.implicits._
    // Closure must not capture the (non-serializable) spec instance —
    // only the Png module and locals.
    val media = spark.range(8).map { r =>
      val id: Long = r
      (id, if (id % 2 == 0) {
        val w = 16 + id.toInt
        Png.encodeGray(w, 12, (x, _) => x * 255 / (w - 1))
      } else s"doc $id".getBytes("UTF-8"))
    }
    val out = Multimodal.extractFeatures(media)
      .orderBy("doc_id").collect()
    assert(out.length == 8)
    for (r <- out if r.getLong(0) % 2 == 0) {
      assert(r.getInt(3) == 16 + r.getLong(0).toInt) // true width
      assert(r.getLong(2) == -1L)                    // gradient dHash
      assert(r.getString(6) == "png")
    }
  }
}
