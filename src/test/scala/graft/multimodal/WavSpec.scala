package graft.multimodal

import graft.SparkSpec

/** Real WAV decode: writer output must round-trip through the parser with
  * true header values, and the energy fingerprint must behave like an
  * acoustic hash (deterministic, envelope-sensitive, length-robust).
  */
class WavSpec extends SparkSpec {

  test("writer round-trips through the parser with true header values") {
    for ((rate, ch, n) <- Seq((8000, 1, 650), (44100, 2, 1000), (16000, 1, 64))) {
      val bytes = Wav.encodePcm16(rate, ch, n)((f, c) => (f * 31 + c * 5) % 3000)
      assert(bytes.length == Wav.encodedLength(n, ch))
      val Right(w) = Wav.parse(bytes): @unchecked
      assert((w.sampleRate, w.channels, w.bitsPerSample, w.nFrames) ==
        ((rate, ch, 16, n.toLong)))
      assert(w.durationMs == n.toLong * 1000 / rate)
    }
  }

  test("painted square-wave envelope reproduces its target bit pattern") {
    for (id <- Seq(0L, 3L, 9L, 99L)) {
      val target = ((id + 13) * 2654435761L) % 2147483647L
      val winLen = 16 + (id % 5).toInt
      val amps = new Array[Int](65)
      amps(0) = 8000
      for (w <- 1 until 65)
        amps(w) = amps(w - 1) +
          (if (((target >> (w - 1)) & 1L) == 1L) 120 else -120)
      val bytes = Wav.encodePcm16(8000, 1, 65 * winLen) { (f, _) =>
        val a = amps(f / winLen); if (f % 2 == 0) a else -a
      }
      val Right(w) = Wav.parse(bytes): @unchecked
      assert(w.fingerprint == target, s"doc $id")
    }
  }

  test("fewer than 65 frames yields fingerprint 0 (no envelope)") {
    val Right(w) = Wav.parse(
      Wav.encodePcm16(16000, 2, 64)((f, c) => f * 40 + c)): @unchecked
    assert(w.fingerprint == 0L && w.nFrames == 64)
  }

  test("fingerprint is envelope-sensitive: reversed envelope flips bits") {
    def clip(ramp: Boolean): Long = {
      val bytes = Wav.encodePcm16(8000, 1, 65 * 20) { (f, _) =>
        val w = f / 20
        val a = if (ramp) 500 + w * 100 else 500 + (64 - w) * 100
        if (f % 2 == 0) a else -a
      }
      Wav.parse(bytes).toOption.get.fingerprint
    }
    assert(clip(ramp = true) == -1L)  // strictly rising: all 64 bits
    assert(clip(ramp = false) == 0L) // strictly falling: none
  }

  test("non-audio and corrupt payloads land on the deterministic fallback") {
    val f = Multimodal.decodeAudio(5L, "not audio".getBytes("UTF-8"))
    assert(f.format == "unknown" && f.sample_rate == 0 && f.n_frames == 0L)
    // Truncated WAV header → Left → fallback, not an exception.
    val truncated = Wav.encodePcm16(8000, 1, 100)((f2, _) => f2).take(20)
    assert(Multimodal.decodeAudio(6L, truncated).format == "unknown")
  }

  test("extractAudioFeatures decodes distributed") {
    import spark.implicits._
    val media = spark.range(6).map { r =>
      val id: Long = r
      (id, if (id % 2 == 0)
        Wav.encodePcm16(8000 + id.toInt * 100, 1, 200)((f, _) => f % 500)
      else s"doc $id".getBytes("UTF-8"))
    }
    val out = Multimodal.extractAudioFeatures(media).orderBy("doc_id").collect()
    assert(out.length == 6)
    for (r <- out if r.getLong(0) % 2 == 0) {
      assert(r.getInt(3) == 8000 + r.getLong(0).toInt * 100) // true rate
      assert(r.getString(7) == "wav")
    }
  }
}
