package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.dedup.Dedup

/** Multimodal column handling (builder brief): media as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * Image payloads (PNG/JPEG by magic bytes) are REALLY decoded with the
  * JDK's `javax.imageio` — true dimensions, channel count from the raster,
  * and a real 64-bit difference hash ([[dHash]]) over a 9×8 area-averaged
  * grayscale grid. Non-image bytes (this container has no audio/video
  * codecs) fall back to [[decodeStub]], a clearly-marked deterministic
  * substitute that keeps those rows oracle-checkable.
  */
final case class MediaFeature(
    doc_id: Long,
    n_bytes: Long,
    phash: Long,
    width: Int,
    height: Int,
    channels: Int,
    format: String)

/** Video column features — real container decode + frame sampling for
  * uncompressed-RGB AVI ([[Avi]]); zeroed fields + `format = "unknown"`
  * for non-video bytes. `fingerprint` is the per-bit majority vote over
  * the sampled frames' dHashes; `first_frame_hash` pins per-frame decode
  * in the oracle.
  */
final case class VideoFeature(
    doc_id: Long,
    n_bytes: Long,
    fingerprint: Long,
    first_frame_hash: Long,
    width: Int,
    height: Int,
    n_frames: Long,
    n_sampled: Int,
    duration_ms: Long,
    format: String)

/** Audio column features — real header decode + acoustic fingerprint for
  * PCM WAV ([[Wav]]); zeroed fields + `format = "unknown"` for non-audio
  * bytes (the honest "not audio" row, still deterministic).
  */
final case class AudioFeature(
    doc_id: Long,
    n_bytes: Long,
    fingerprint: Long,
    sample_rate: Int,
    channels: Int,
    n_frames: Long,
    duration_ms: Long,
    format: String)

object Multimodal {

  /** Magic-byte sniff (the loader dispatch for binary columns): PNG
    * signature / JPEG SOI. Sniffing, not trusting metadata, is what a
    * 100 TB pipeline needs — the column is opaque bytes, rows can lie.
    */
  def sniffFormat(payload: Array[Byte]): Option[String] =
    if (payload.length >= 8 &&
        (payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
        payload(2) == 'N' && payload(3) == 'G') Some("png")
    else if (payload.length >= 3 &&
        (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 &&
        (payload(2) & 0xff) == 0xff) Some("jpeg")
    else None

  /** Decode one payload: real image decode when the bytes are an image
    * (dimensions/channels/dHash from the decoded raster), [[decodeStub]]
    * otherwise. A sniffed image that fails to decode (truncated file) also
    * falls back to the stub rather than failing the task — corrupt rows
    * are data, not errors, at pipeline scale.
    */
  def decode(id: Long, payload: Array[Byte]): MediaFeature =
    sniffFormat(payload).flatMap { fmt =>
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        Option(img).map { im =>
          MediaFeature(
            doc_id = id,
            n_bytes = payload.length.toLong,
            phash = dHash(im),
            width = im.getWidth,
            height = im.getHeight,
            channels = im.getRaster.getNumBands,
            format = fmt)
        }
      } catch { case _: Exception => None }
    }.getOrElse(decodeStub(id, payload))

  /** 64-bit difference hash: area-average the luminance onto a 9×8 grid,
    * then bit `y*8 + x` is set iff `cell(x+1, y) > cell(x, y)` — the
    * standard dHash construction (horizontal gradient signs). Integer
    * math throughout so the value is platform-deterministic; a 9×8 input
    * hashes its own pixels (identity resample), which is what makes the
    * fixture images in the m1 oracle bit-exactly predictable.
    */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val cells = new Array[Long](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh; val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val c = img.getRGB(x, y)
            sum += (299L * ((c >> 16) & 0xff) + 587L * ((c >> 8) & 0xff) +
              114L * (c & 0xff)) / 1000L
            x += 1
          }
          y += 1
        }
        val n = (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
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

  /** STUB decoder for non-image bytes — stands in for the audio/video
    * codecs this container lacks. Deterministic function of the payload
    * (polynomial hash, same formula as [[Dedup.polyHash]] so the oracle
    * can replicate it).
    */
  def decodeStub(id: Long, payload: Array[Byte]): MediaFeature = {
    var acc = 0L
    var i = 0
    while (i < payload.length) {
      acc = (acc * 31 + (payload(i) & 0xff)) % Dedup.P
      i += 1
    }
    MediaFeature(
      doc_id = id,
      n_bytes = payload.length.toLong,
      phash = acc,
      width = (64 + acc % 512).toInt,
      height = (64 + (acc / 512) % 512).toInt,
      channels = 3,
      format = if (acc % 2 == 0) "png" else "jpeg")
  }

  /** Feature extraction over (id, payload) — mapPartitions so decoder
    * setup amortizes per partition; rows stream through without
    * collecting a partition in memory. ImageIO's plugin registry lookup
    * is the per-partition cost a real deployment would pay here.
    */
  def extractFeatures(media: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // Disk-cache thrash guard: ImageIO defaults to temp-file caching
      // for its streams; in-memory is both faster and executor-safe.
      javax.imageio.ImageIO.setUseCache(false)
      it.map { case (id, payload) => decode(id, payload) }
    }.toDF()
  }

  /** Audio decode: REAL PCM WAV parse + 64-bit energy-difference
    * fingerprint ([[Wav.parse]]); anything else (or a corrupt WAV) yields
    * a zeroed row with the payload's polyhash as a content fingerprint —
    * deterministic, so corrupt rows stay oracle-checkable data.
    */
  def decodeAudio(id: Long, payload: Array[Byte]): AudioFeature =
    Wav.parse(payload) match {
      case Right(w) => AudioFeature(id, payload.length.toLong, w.fingerprint,
        w.sampleRate, w.channels, w.nFrames, w.durationMs, "wav")
      case Left(_) =>
        var acc = 0L
        var i = 0
        while (i < payload.length) {
          acc = (acc * 31 + (payload(i) & 0xff)) % Dedup.P
          i += 1
        }
        AudioFeature(id, payload.length.toLong, acc, 0, 0, 0L, 0L, "unknown")
    }

  /** Audio analogue of [[extractFeatures]]: one streamed pass, real WAV
    * decode per row — the audio-dedup primitives (fingerprint groupBy /
    * banded join) compose on top exactly like the text fingerprints.
    */
  def extractAudioFeatures(media: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { case (id, payload) => decodeAudio(id, payload) })
      .toDF()
  }

  /** Video decode: REAL uncompressed-AVI parse, every `stride`-th frame
    * dHashed, per-bit majority fingerprint ([[Avi]]). Non-video / corrupt
    * bytes yield a zeroed row with the payload polyhash as fingerprint —
    * deterministic, so corrupt rows stay oracle-checkable data. Decode
    * cost scales with the SAMPLED frame count — the knob a 100 TB video
    * corpus turns (stride 30 ≈ one frame per second of 30 fps footage).
    */
  def decodeVideo(id: Long, payload: Array[Byte], stride: Int = 3): VideoFeature =
    Avi.parse(payload) match {
      case Right(v) =>
        val sampled = v.frameOffsets.indices.by(stride).map { i =>
          Avi.frameDHash(payload, v.frameOffsets(i), v.width, v.height)
        }.toArray
        VideoFeature(id, payload.length.toLong,
          Avi.majorityFingerprint(sampled),
          if (sampled.nonEmpty) sampled(0) else 0L,
          v.width, v.height, v.nFrames.toLong, sampled.length,
          v.nFrames.toLong * v.usPerFrame / 1000L, "avi")
      case Left(_) =>
        var acc = 0L
        var i = 0
        while (i < payload.length) {
          acc = (acc * 31 + (payload(i) & 0xff)) % Dedup.P
          i += 1
        }
        VideoFeature(id, payload.length.toLong, acc, 0L, 0, 0, 0L, 0, 0L,
          "unknown")
    }

  /** Video analogue of [[extractFeatures]]: one streamed pass, real AVI
    * decode + frame sampling per row; [[graft.dedup.Dedup.hammingNearDups]]
    * composes on the majority fingerprint exactly like the audio path.
    */
  def extractVideoFeatures(media: Dataset[(Long, Array[Byte])],
      stride: Int = 3): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { case (id, payload) =>
      decodeVideo(id, payload, stride) })
      .toDF()
  }
}
