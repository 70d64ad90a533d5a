package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.dedup.Dedup

/** Multimodal column handling (builder brief): media as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The image/audio codecs are NOT in this environment, so `decodeStub` is a
  * clearly-marked deterministic fake — but everything Spark-side is real:
  * the binary payload column, the typed `Dataset[MediaFeature]` schema, the
  * mapPartitions batch shape (one decoder instance per partition, the
  * pattern a real codec needs for native-lib reuse), and the downstream
  * columnar feature output.
  */
final case class MediaFeature(
    doc_id: Long,
    n_bytes: Long,
    phash: Long,
    width: Int,
    height: Int,
    channels: Int,
    format: String)

object Multimodal {

  /** STUB decoder — stands in for an image/audio decode + feature extract.
    * Deterministic function of the payload bytes (polynomial hash, same
    * formula as [[Dedup.polyHash]] so the oracle can replicate it).
    * A real implementation would decode here and emit true dimensions.
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

  /** Feature extraction over (id, payload) — mapPartitions so a real codec
    * would amortize per-partition initialization; rows stream through
    * without collecting a partition in memory.
    */
  def extractFeatures(media: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // A real decoder would be instantiated HERE, once per partition.
      it.map { case (id, payload) => decodeStub(id, payload) }
    }.toDF()
  }
}
