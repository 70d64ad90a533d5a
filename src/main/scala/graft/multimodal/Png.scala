package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{Adler32, CRC32}

/** Minimal deterministic PNG writer (public PNG/ISO 15948 format): 8-bit
  * truecolor RGB, filter 0 on every row, and an UNCOMPRESSED zlib stream
  * (stored deflate blocks). Two reasons for stored blocks over a real
  * deflate pass:
  *
  *   1. Determinism: the byte length is a pure formula of (width, height)
  *      — `8 + 25 + (12 + zlibLen(h*(1+3w))) + 12` — so an external oracle
  *      can predict `n_bytes` for fixture images without running zlib.
  *   2. No dependence on the JDK's zlib version for byte-exact fixtures.
  *
  * Any standards-compliant reader (javax.imageio included) decodes these;
  * [[Multimodal.extractFeatures]] uses ImageIO, not this writer, to read —
  * the writer exists so tests and fixture queries can synthesize real
  * binary images without shipping blobs.
  */
object Png {

  /** Encoded byte length of [[encodeRgb]] for a w×h image — kept next to
    * the writer so the formula and the framing can't drift apart.
    */
  def encodedLength(width: Int, height: Int): Long = {
    val raw = height.toLong * (1L + 3L * width)
    val nBlocks = math.max(1L, (raw + 65534L) / 65535L)
    val zlib = 2L + 5L * nBlocks + raw + 4L
    8L + 25L + (12L + zlib) + 12L
  }

  /** Encode `rgb(x, y) = 0xRRGGBB` as a PNG. */
  def encodeRgb(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val raw = new Array[Byte](height * (1 + 3 * width))
    var p = 0
    var y = 0
    while (y < height) {
      raw(p) = 0 // filter type 0 (None)
      p += 1
      var x = 0
      while (x < width) {
        val c = rgb(x, y)
        raw(p) = ((c >> 16) & 0xff).toByte
        raw(p + 1) = ((c >> 8) & 0xff).toByte
        raw(p + 2) = (c & 0xff).toByte
        p += 3
        x += 1
      }
      y += 1
    }

    val out = new ByteArrayOutputStream(raw.length + 64)
    out.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))

    def chunk(tag: String, body: Array[Byte]): Unit = {
      writeInt(out, body.length)
      val tb = tag.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body)
      writeInt(out, crc.getValue.toInt)
    }

    val ihdr = new ByteArrayOutputStream(13)
    writeInt(ihdr, width)
    writeInt(ihdr, height)
    // bit depth 8, color type 2 (truecolor), compression 0, filter 0,
    // interlace 0.
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)

    chunk("IDAT", zlibStored(raw))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Convenience: grayscale image `g(x, y) ∈ [0, 255]` (r = g = b). */
  def encodeGray(width: Int, height: Int, g: (Int, Int) => Int): Array[Byte] =
    encodeRgb(width, height, (x, y) => {
      val v = g(x, y) & 0xff; (v << 16) | (v << 8) | v
    })

  /** zlib framing with stored (uncompressed) deflate blocks. */
  private def zlibStored(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
    out.write(0x78); out.write(0x01) // CMF/FLG: 32k window, no dict, check ok
    var off = 0
    if (data.isEmpty) {
      out.write(1); out.write(0); out.write(0); out.write(0xff); out.write(0xff)
    }
    while (off < data.length) {
      val n = math.min(65535, data.length - off)
      val last = off + n >= data.length
      out.write(if (last) 1 else 0) // BFINAL + BTYPE=00 (stored)
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write(~n & 0xff); out.write((~n >> 8) & 0xff)
      out.write(data, off, n)
      off += n
    }
    val ad = new Adler32()
    ad.update(data)
    writeInt(out, ad.getValue.toInt)
    out.toByteArray
  }

  private def writeInt(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
}
