package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ingestion-to-curation integration: a crawl file (with a duplicate page
  * and a corrupted record) flows WARC-parse → HTML→text → exact dedup →
  * quality signals, the first mile of the pre-training funnel.
  */
class WarcPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("crawl file -> parse -> dedup -> quality, corrupt record quarantined") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .filter(col("doc_id") < 6)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val pages = docs.map { case (id, text) =>
      (s"https://crawl/page/$id", s"<html><body><p>$text</p></body></html>")
    }.toSeq
    // Page 3 is re-crawled under a second URI (the duplicate), page 2's
    // record is damaged in transit.
    val withDup = pages :+ ("https://mirror/page/3", pages(3)._2)
    val bytes = Warc.corruptRecord(Warc.write(withDup), "https://crawl/page/2")

    val recs = spark.createDataset(Seq(bytes))
      .flatMap(b => Warc.parse(b)).toDF()
    // Quarantine: exactly one corrupt row, and page 2 is gone.
    assert(recs.filter(col("corrupt").isNotNull).count() === 1L)
    val resp = recs.filter(col("warcType") === "response")
    assert(resp.filter(col("targetUri") === "https://crawl/page/2").count() === 0L)
    assert(resp.count() === 6L) // 5 surviving pages + the mirror dup

    // Exact dedup over the EXTRACTED text collapses the mirror; the
    // survivor set is the 5 intact originals, text round-tripped exactly.
    val deduped = graft.streaming.Streams.dedupStream(resp, "text", "targetUri")
    assert(deduped.count() === 5L)
    val surviving = deduped.select(col("text")).collect()
      .map(_.getString(0)).toSet
    val expected = docs.filter(_._1 != 2L).map(_._2).toSet
    assert(surviving === expected)

    // Quality signals run unchanged on the extracted text.
    val stop25 = Seq("a", "an", "and", "are", "as", "at", "be", "by",
      "for", "from", "has", "he", "in", "is", "it", "its", "of", "on",
      "that", "the", "to", "was", "were", "will", "with")
    val sig = graft.text.TextPipeline.qualitySignals(col("text"), stop25).toMap
    val q = deduped.withColumn("quality", sig("quality"))
      .agg(min(col("quality")), max(col("quality"))).collect()(0)
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }
}
