package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM WAV (RIFF/WAVE, public format) parsing + a real acoustic
  * fingerprint — the audio leg of the multimodal column story. No codec
  * libraries exist in this container for compressed audio, but PCM WAV is
  * a plain header + samples, so the decode is REAL: chunk-walk the RIFF
  * container, read `fmt ` (PCM, channels, sample rate, bit depth), locate
  * `data`, and fingerprint the waveform.
  *
  * The fingerprint is the standard energy-difference construction (the
  * shape audio-dedup pipelines use): mix to mono, split into 65 equal
  * windows, mean absolute amplitude per window, bit `i` set iff
  * `energy(i+1) > energy(i)` — 64 bits of spectral envelope signs.
  * Integer math end-to-end, so the value is platform-deterministic and an
  * external oracle can predict it for constructed fixtures (mirror of the
  * image dHash painting in [[Multimodal]]).
  *
  * [[encodePcm16]] is the matching minimal writer (canonical 44-byte
  * header) so tests and fixture queries can synthesize real audio binaries
  * without shipping blobs.
  */
object Wav {

  final case class Info(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nFrames: Long,
      durationMs: Long,
      fingerprint: Long)

  /** Parse a PCM WAV payload. Left(reason) on anything that isn't an
    * intact 16-bit PCM RIFF/WAVE — corrupt rows are data, not errors.
    */
  def parse(bytes: Array[Byte]): Either[String, Info] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44) return Left("wav: too short")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return Left("wav: not RIFF/WAVE")
    // Chunk walk — fmt and data can appear after LIST/fact/etc. chunks.
    var off = 12
    var fmtOff = -1
    var dataOff = -1
    var dataLen = 0L
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val id = tag(off)
      val sz = u32(off + 4)
      if (id == "fmt ") fmtOff = off + 8
      else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (fmtOff < 0 || dataOff < 0) return Left("wav: missing fmt/data chunk")
    val audioFormat = u16(fmtOff)
    val channels = u16(fmtOff + 2)
    val rate = u32(fmtOff + 4).toInt
    val bits = u16(fmtOff + 14)
    if (audioFormat != 1 || bits != 16)
      return Left(s"wav: unsupported format=$audioFormat bits=$bits")
    if (channels < 1 || rate <= 0) return Left("wav: bad fmt values")
    val blockAlign = channels * 2
    val avail = math.min(dataLen, (bytes.length - dataOff).toLong)
    val nFrames = avail / blockAlign
    val fp = fingerprint(bytes, dataOff, nFrames, channels)
    Right(Info(rate, channels, bits, nFrames,
      nFrames * 1000L / rate, fp))
  }

  /** 64-bit energy-difference fingerprint over the mono mix (see object
    * doc). Frames < 65 → 0 (too short to carry an envelope).
    */
  def fingerprint(bytes: Array[Byte], dataOff: Int, nFrames: Long,
                  channels: Int): Long = {
    val W = 65
    if (nFrames < W) return 0L
    def sample(frame: Long, ch: Int): Int = {
      val o = dataOff + (frame * channels + ch) * 2
      ((bytes(o.toInt) & 0xff) | (bytes(o.toInt + 1) << 8)).toShort.toInt
    }
    val energies = new Array[Long](W)
    var w = 0
    while (w < W) {
      val f0 = w.toLong * nFrames / W
      val f1 = (w + 1).toLong * nFrames / W
      var sum = 0L
      var f = f0
      while (f < f1) {
        var mix = 0L
        var c = 0
        while (c < channels) { mix += sample(f, c); c += 1 }
        sum += math.abs(mix / channels)
        f += 1
      }
      energies(w) = if (f1 > f0) sum / (f1 - f0) else 0L
      w += 1
    }
    var bitsOut = 0L
    var i = 0
    while (i < 64) {
      if (energies(i + 1) > energies(i)) bitsOut |= (1L << i)
      i += 1
    }
    bitsOut
  }

  /** Byte length of [[encodePcm16]] output — pure formula, kept next to
    * the writer (oracle contract, like [[Png.encodedLength]]).
    */
  def encodedLength(nFrames: Long, channels: Int): Long =
    44L + nFrames * channels * 2L

  /** Canonical-header 16-bit PCM writer: `sample(frame, channel)`. */
  def encodePcm16(sampleRate: Int, channels: Int, nFrames: Int)
                 (sample: (Int, Int) => Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0)
    val dataLen = nFrames * channels * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    tag("RIFF"); w32(36L + dataLen); tag("WAVE")
    tag("fmt "); w32(16L); w16(1); w16(channels); w32(sampleRate.toLong)
    w32(sampleRate.toLong * channels * 2); w16(channels * 2); w16(16)
    tag("data"); w32(dataLen.toLong)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val v = math.max(-32768, math.min(32767, sample(f, c)))
        w16(v & 0xffff)
        c += 1
      }
      f += 1
    }
    out.toByteArray
  }
}
