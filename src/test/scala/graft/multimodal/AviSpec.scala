package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** AVI writer/parser round-trip + frame hashing: the writer's canonical
  * headers must parse back exactly (byte-length formula included), a 9×8
  * painted frame must dHash to its arithmetic target (identity resample —
  * the m3 oracle contract), and the majority fingerprint must tolerate a
  * minority of edited frames.
  */
class AviSpec extends AnyFunSuite {

  private def gray(g: Int): Int = (g << 16) | (g << 8) | g

  /** m1-style painting: row y walks ±15 steps driven by target bits, so
    * the frame's dHash equals `target` exactly on a 9×8 canvas.
    */
  private def paint(target: Long)(x: Int, y: Int): Int = {
    var g = 120
    var i = 0
    while (i < x) {
      g += (if (((target >> (y * 8 + i)) & 1L) == 1L) 15 else -15)
      i += 1
    }
    gray(g)
  }

  test("encode → parse round-trips dims, frame count, timing, length") {
    val bytes = Avi.encodeRgb24(11, 7, 25, 5)((f, x, y) => gray((f * 31 + x * 7 + y * 3) % 256))
    assert(bytes.length === Avi.encodedLength(11, 7, 5))
    val v = Avi.parse(bytes).toOption.get
    assert(v.width === 11 && v.height === 7)
    assert(v.nFrames === 5)
    assert(v.usPerFrame === 40000L)
    assert(v.frameOffsets.length === 5)
  }

  test("9x8 painted frame dHashes to its arithmetic target") {
    val t1 = 1234567891L % 2147483647L
    val t2 = 987654321L
    val bytes = Avi.encodeRgb24(9, 8, 10, 2)((f, x, y) =>
      paint(if (f == 0) t1 else t2)(x, y))
    val v = Avi.parse(bytes).toOption.get
    assert(Avi.frameDHash(bytes, v.frameOffsets(0), 9, 8) === t1)
    assert(Avi.frameDHash(bytes, v.frameOffsets(1), 9, 8) === t2)
  }

  test("row padding does not leak into the hash (width not 4-aligned)") {
    // 9*3=27 bytes/row pads to 28; padding byte is 0 — a hash that read
    // the pad would differ from the same frame at an aligned width.
    val t = 0x5a5a5a5aL
    val b9 = Avi.encodeRgb24(9, 8, 10, 1)((_, x, y) => paint(t)(x, y))
    val v9 = Avi.parse(b9).toOption.get
    assert(Avi.frameDHash(b9, v9.frameOffsets(0), 9, 8) === t)
  }

  test("majority fingerprint tolerates a minority of edited frames") {
    val base = 0x0f0f0f0fL
    assert(Avi.majorityFingerprint(Array(base, base, base ^ 0xffL)) === base)
    assert(Avi.majorityFingerprint(Array(base)) === base)
    // Tie → bit drops (strict majority).
    assert(Avi.majorityFingerprint(Array(1L, 0L)) === 0L)
    assert(Avi.majorityFingerprint(Array.empty[Long]) === 0L)
  }

  test("decodeVideo samples every stride-th frame and falls back honestly") {
    val targets = Array(11111L, 22222L, 33333L, 44444L, 55555L, 66666L, 77777L)
    val bytes = Avi.encodeRgb24(9, 8, 10, 7)((f, x, y) => paint(targets(f))(x, y))
    val feat = Multimodal.decodeVideo(42L, bytes, stride = 3)
    assert(feat.format === "avi")
    assert(feat.n_frames === 7L && feat.n_sampled === 3) // frames 0, 3, 6
    assert(feat.first_frame_hash === 11111L)
    assert(feat.fingerprint ===
      Avi.majorityFingerprint(Array(11111L, 44444L, 77777L)))
    assert(feat.duration_ms === 700L)

    val junk = Multimodal.decodeVideo(7L, "not a video".getBytes("UTF-8"))
    assert(junk.format === "unknown" && junk.width === 0 && junk.n_frames === 0L)
  }

  test("corrupt container variants are Left, not exceptions") {
    val good = Avi.encodeRgb24(9, 8, 10, 2)((_, x, y) => paint(99L)(x, y))
    assert(Avi.parse(good.take(20)).isLeft)           // truncated
    assert(Avi.parse("RIFFxxxxWAVE".getBytes).isLeft) // wrong form
    val noMovi = good.clone()
    // Corrupt the movi list tag — frames become unreachable.
    val idx = good.indexOfSlice("movi".getBytes("US-ASCII"))
    noMovi(idx) = 'x'.toByte
    assert(Avi.parse(noMovi).isLeft)
  }
}
