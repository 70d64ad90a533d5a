package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM AVI (RIFF, public format) parsing + frame-level perceptual
  * hashing — the video leg of the multimodal column story, completing the
  * image ([[Png]] + imageio) / audio ([[Wav]]) / video triad. No video
  * codecs exist in this container, but uncompressed 24-bit RGB AVI
  * (`vids`/`DIB `, BI_RGB) is a plain RIFF container around raw rasters —
  * the same chunk-walk [[Wav.parse]] does, one level deeper: `hdrl` holds
  * the `avih` main header and the stream's `strh`/`strf`, `movi` holds one
  * `00db` chunk per frame (bottom-up BGR rows, 4-byte aligned).
  *
  * Feature extraction mirrors what a training-data pipeline does to video
  * at scale: sample every `stride`-th frame (decode cost scales with the
  * SAMPLED count, not the stored count), dHash each sampled frame with the
  * same 9×8 gradient-sign construction [[Multimodal.dHash]] uses for
  * images (integer math — platform-deterministic), and combine the frame
  * hashes into one 64-bit video fingerprint by per-bit MAJORITY vote
  * (robust to a few edited frames, so [[graft.dedup.Dedup.hammingNearDups]]
  * composes on top exactly like the audio fingerprints in d7).
  *
  * [[encodeRgb24]] is the matching minimal writer (canonical headers, no
  * idx1 — readers tolerate its absence) so fixtures are real binaries with
  * formula byte lengths ([[encodedLength]]).
  */
object Avi {

  final case class Info(
      width: Int,
      height: Int,
      usPerFrame: Long,
      nFrames: Int,
      frameOffsets: Array[Int])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Parse an uncompressed-RGB24 AVI payload. Left(reason) on anything
    * else — corrupt rows are data, not errors, at pipeline scale.
    */
  def parse(bytes: Array[Byte]): Either[String, Info] = {
    if (bytes.length < 24) return Left("avi: too short")
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
      return Left("avi: not RIFF/AVI")
    var off = 12
    var usPerFrame = 0L
    var width = 0
    var height = 0
    var bitCount = -1
    var compression = -1L
    var moviOff = -1
    var moviEnd = -1
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val sz = u32(bytes, off + 4).toInt
      if (id == "LIST" && off + 12 <= bytes.length) {
        val listType = tag(bytes, off + 8)
        if (listType == "hdrl") {
          // Walk the header list (one level of nesting: avih + LIST strl).
          var ho = off + 12
          val hEnd = math.min(off + 8 + sz, bytes.length)
          while (ho + 8 <= hEnd) {
            val hid = tag(bytes, ho)
            val hsz = u32(bytes, ho + 4).toInt
            if (hid == "avih" && ho + 8 + 40 <= bytes.length) {
              usPerFrame = u32(bytes, ho + 8)
              width = u32(bytes, ho + 8 + 32).toInt
              height = u32(bytes, ho + 8 + 36).toInt
              ho += 8 + hsz + (hsz & 1)
            } else if (hid == "LIST") {
              // strl: scan its children for strf (BITMAPINFOHEADER).
              var so = ho + 12
              val sEnd = math.min(ho + 8 + hsz, bytes.length)
              while (so + 8 <= sEnd) {
                val sid = tag(bytes, so)
                val ssz = u32(bytes, so + 4).toInt
                if (sid == "strf" && so + 8 + 20 <= bytes.length) {
                  bitCount = u16(bytes, so + 8 + 14)
                  compression = u32(bytes, so + 8 + 16)
                }
                so += 8 + ssz + (ssz & 1)
              }
              ho += 8 + hsz + (hsz & 1)
            } else ho += 8 + hsz + (hsz & 1)
          }
        } else if (listType == "movi") {
          moviOff = off + 12
          moviEnd = math.min(off + 8 + sz, bytes.length)
        }
      }
      off += 8 + sz + (sz & 1)
    }
    if (width <= 0 || height <= 0) return Left("avi: missing/bad avih")
    if (bitCount != 24 || compression != 0L)
      return Left(s"avi: unsupported bitCount=$bitCount compression=$compression")
    if (moviOff < 0) return Left("avi: missing movi")
    val frames = Array.newBuilder[Int]
    var fo = moviOff
    while (fo + 8 <= moviEnd) {
      val fid = tag(bytes, fo)
      val fsz = u32(bytes, fo + 4).toInt
      // 00db = uncompressed DIB frame, 00dc = compressed; we store db.
      if (fid.endsWith("db") || fid.endsWith("dc")) frames += (fo + 8)
      fo += 8 + fsz + (fsz & 1)
    }
    val offs = frames.result()
    if (offs.isEmpty) return Left("avi: no frames")
    Right(Info(width, height, usPerFrame, offs.length, offs))
  }

  /** Padded bytes per raster row (DIB rows are 4-byte aligned). */
  def rowBytes(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** 64-bit dHash of one raw bottom-up BGR frame — the identical 9×8
    * area-averaged gradient-sign construction as [[Multimodal.dHash]], so
    * a 9×8 frame hashes its own pixels and fixture targets stay
    * arithmetic.
    */
  def frameDHash(bytes: Array[Byte], off: Int, width: Int, height: Int): Long = {
    val gw = 9; val gh = 8
    val rb = rowBytes(width)
    val cells = new Array[Long](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * height / gh
      val y1 = math.max(y0 + 1, (gy + 1) * height / gh)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * width / gw
        val x1 = math.max(x0 + 1, (gx + 1) * width / gw)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, height)) {
          // Bottom-up storage: raster row y sits at (height-1-y).
          val ro = off + (height - 1 - y) * rb
          var x = x0
          while (x < math.min(x1, width)) {
            val b = bytes(ro + x * 3) & 0xff
            val g = bytes(ro + x * 3 + 1) & 0xff
            val r = bytes(ro + x * 3 + 2) & 0xff
            sum += (299L * r + 587L * g + 114L * b) / 1000L
            x += 1
          }
          y += 1
        }
        val n = (math.min(x1, width) - x0).toLong * (math.min(y1, height) - y0)
        cells(gy * gw + gx) = if (n > 0) sum / n else 0L
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      val gx = b % 8; val gy2 = b / 8
      if (cells(gy2 * gw + gx + 1) > cells(gy2 * gw + gx)) bits |= (1L << b)
      b += 1
    }
    bits
  }

  /** Per-bit strict-majority combine of frame hashes (ties → 0) — the
    * video-level fingerprint. Bit b of the result is set iff more than
    * half the sampled frames set bit b.
    */
  def majorityFingerprint(hashes: Array[Long]): Long = {
    if (hashes.isEmpty) return 0L
    var out = 0L
    var b = 0
    while (b < 64) {
      var set = 0
      var i = 0
      while (i < hashes.length) {
        if (((hashes(i) >> b) & 1L) == 1L) set += 1
        i += 1
      }
      if (2 * set > hashes.length) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Byte length of [[encodeRgb24]] output — pure formula (oracle
    * contract): 12 RIFF + 200 hdrl + 12 movi header + per-frame (8 +
    * rowBytes×height).
    */
  def encodedLength(width: Int, height: Int, nFrames: Int): Long =
    224L + nFrames.toLong * (8L + rowBytes(width).toLong * height)

  /** Canonical-header uncompressed RGB24 writer: `pixel(frame, x, y)` →
    * 0xRRGGBB, top-left origin (the writer flips into the DIB's bottom-up
    * order).
    */
  def encodeRgb24(width: Int, height: Int, fps: Int, nFrames: Int)
                 (pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nFrames > 0)
    val rb = rowBytes(width)
    val frameBytes = rb * height
    val out = new ByteArrayOutputStream(encodedLength(width, height, nFrames).toInt)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def t(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val moviSize = 4L + nFrames.toLong * (8L + frameBytes)
    val riffSize = 4L + (8L + 192L) + (8L + moviSize)
    t("RIFF"); w32(riffSize); t("AVI ")
    // hdrl LIST: avih (64 bytes with header) + strl LIST (124 bytes).
    t("LIST"); w32(192L); t("hdrl")
    t("avih"); w32(56L)
    w32(1000000L / fps); w32(0L); w32(0L); w32(0L)
    w32(nFrames.toLong); w32(0L); w32(1L); w32(frameBytes.toLong)
    w32(width.toLong); w32(height.toLong); w32(0L); w32(0L); w32(0L); w32(0L)
    t("LIST"); w32(116L); t("strl")
    t("strh"); w32(56L)
    t("vids"); t("DIB "); w32(0L); w32(0L); w32(0L)
    w32(1L); w32(fps.toLong); w32(0L); w32(nFrames.toLong)
    w32(frameBytes.toLong); w32(0L); w32(0L)
    w16(0); w16(0); w16(width); w16(height)
    t("strf"); w32(40L)
    w32(40L); w32(width.toLong); w32(height.toLong); w16(1); w16(24)
    w32(0L); w32(frameBytes.toLong); w32(0L); w32(0L); w32(0L); w32(0L)
    // movi LIST: one 00db chunk per frame, bottom-up BGR padded rows.
    t("LIST"); w32(moviSize); t("movi")
    var f = 0
    while (f < nFrames) {
      t("00db"); w32(frameBytes.toLong)
      var y = height - 1
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val c = pixel(f, x, y)
          out.write(c & 0xff)          // B
          out.write((c >> 8) & 0xff)   // G
          out.write((c >> 16) & 0xff)  // R
          x += 1
        }
        var p = width * 3
        while (p < rb) { out.write(0); p += 1 }
        y -= 1
      }
      f += 1
    }
    out.toByteArray
  }
}
