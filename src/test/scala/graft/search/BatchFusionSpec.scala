package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.FusionQueries
import graft.search.Decay.MemoryConfig

/** Pins `Fusion.searchWithFusionBatch` to the single-query path: a batch of
  * hybrid queries must produce EXACTLY the per-query `searchWithFusionDF`
  * results, query by query — including a query whose text analyzes to zero
  * tokens (all stopwords), which must degrade to `alpha * vscore` on both
  * paths.
  */
class BatchFusionSpec extends SparkSpec {

  private val memCfg = MemoryConfig(
    enabled = true,
    halfLifeSeconds = 604800.0,
    model = "exponential",
    layers = Map("episodic" -> 604800.0, "semantic" -> 2592000.0,
      "procedural" -> 0.0))

  private val params = Fusion.FusionParams(alpha = 0.6, k = 10,
    metric = "cosine", memory = memCfg, now = FusionQueries.Now, wide = true)

  test("batch fusion == per-query fusion, including all-stopword degradation") {
    val dir = sf()
    val mem = FusionQueries.memoryView(spark, dir)
    val emb = graft.core.Tables.embeddings(spark, dir)
    val texts = Seq(
      "table merge query",
      "fast hash join order",
      "the and of a", // analyzes to zero tokens → alpha * vscore
      "big small row scan scan") // repeated token

    val qs = emb.filter(col("vec_id") < texts.size)
      .select(col("vec_id").cast("long").as("qid"),
        col("embedding").as("qvec"),
        element_at(array(texts.map(lit): _*),
          (col("vec_id") + 1).cast("int")).as("qtext"))

    val batch = Fusion.searchWithFusionBatch(
        mem, "doc_id", "embedding", "text", qs, params)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (qid, rows) => qid -> rows.map(t => (t._2, t._3)).sortBy(_._1) }

    texts.zipWithIndex.foreach { case (text, qid) =>
      val qdf = emb.filter(col("vec_id") === qid)
        .select(col("embedding").as("qvec"))
      val single = Fusion.searchWithFusionDF(
          mem, "doc_id", "embedding", "text", Some(qdf), text, params)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(_._1)
      val got = batch.getOrElse(qid.toLong, Array.empty[(Long, Double)]).toSeq
      assert(got.map(_._1) == single.map(_._1).toSeq,
        s"qid=$qid ids differ: batch=${got.map(_._1)} single=${single.map(_._1).toSeq}")
      got.zip(single).foreach { case ((_, bs), (_, ss)) =>
        assert(math.abs(bs - ss) < 1e-9, s"qid=$qid score $bs != $ss")
      }
    }
  }
}
