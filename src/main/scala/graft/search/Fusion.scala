package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Bm25

/** Hybrid search fusion — reference `searchWithFusion`
  * (`pkg/engine/ops.go:896-1211`).
  *
  * Shape: the two score sub-plans are independent DataFrames (the
  * reference's two goroutines become two plan branches executed in one job),
  * joined full-outer on id, then
  * `alpha * coalesce(vec, 0) + (1-alpha) * coalesce(text, 0)`, decay
  * multiplier, sort desc, top-k.
  *
  * Semantics replicated:
  *   - vector scores normalized `1/(1+distance)` (absolute, NOT min-max);
  *   - text scores max-normalized per batch;
  *   - the VECTOR side contributes only its own top-k; the text side
  *     contributes every BM25 match (reference fuses the k vector results
  *     with all text results);
  *   - the allow-list predicate is pushed below vector scoring but applied
  *     AFTER text scoring (the reference filters BM25 results post-hoc, so
  *     corpus statistics are unaffected by the filter);
  *   - text-only queries (zero/absent query vector) return raw BM25 scores
  *     (`ops.go:976-996` — no normalization);
  *   - alpha outside [0,1] falls back to 0.5.
  */
object Fusion {

  final case class FusionParams(
      alpha: Double = 0.5,
      k: Int = 10,
      metric: String = "cosine",
      memory: Decay.MemoryConfig = Decay.MemoryConfig(),
      now: Long = 0L,
      wide: Boolean = false)

  /** Hybrid search over a table carrying both a vector column and a text
    * column (plus optional memory metadata columns, absent ones default).
    */
  def searchWithFusion(
      table: DataFrame,
      idCol: String,
      vecCol: String,
      textCol: String,
      queryVec: Option[Seq[Float]],
      textQuery: String,
      params: FusionParams,
      filter: Option[Column] = None): DataFrame = {

    val alpha = if (params.alpha < 0 || params.alpha > 1) 0.5 else params.alpha
    val isVectorEmpty = queryVec.forall(_.forall(_ == 0f))

    // CASE A: text only — raw BM25 scores, allow-list post-filter, top-k.
    if (isVectorEmpty) {
      require(textQuery.nonEmpty, "empty hybrid query")
      val scored = Bm25.search(table, idCol, textCol, textQuery)
      val filtered = filter match {
        case Some(pred) => scored.join(table.filter(pred).select(col(idCol)), Seq(idCol), "left_semi")
        case None       => scored
      }
      return filtered.orderBy(col("score").desc, col(idCol)).limit(params.k)
        .select(col(idCol), col("score"))
    }

    // CASE B: hybrid / vector.
    val vecScores = VectorSearch.topK(
        table, queryVec.get, params.k, params.metric, idCol, vecCol, filter,
        wide = params.wide)
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + col("distance"))).as("vscore"))

    val fusedBase =
      if (textQuery.isEmpty) vecScores.withColumn("fused", col("vscore"))
      else {
        val rawText = Bm25.search(table, idCol, textCol, textQuery)
        val allowText = filter match {
          case Some(pred) => rawText.join(table.filter(pred).select(col(idCol)), Seq(idCol), "left_semi")
          case None       => rawText
        }
        val textScores = Bm25.maxNormalized(allowText).withColumnRenamed("score", "tscore")
        vecScores.join(textScores, Seq(idCol), "full_outer")
          .withColumn("fused",
            lit(alpha) * coalesce(col("vscore"), lit(0.0)) +
              lit(1.0 - alpha) * coalesce(col("tscore"), lit(0.0)))
      }

    val withDecay =
      if (!params.memory.enabled) fusedBase.withColumn("score", col("fused"))
      else {
        val metaCols = Seq("_created_at", "_last_accessed", "_pinned",
          "memory_layer", "_decay_model", "_access_count")
        val present = table.columns.toSet
        def c(name: String, default: Column): Column =
          if (present(name)) col(name) else default
        val meta = table.select(
          col(idCol),
          c("_created_at", lit(null).cast("double")).as("_created_at"),
          c("_last_accessed", lit(null).cast("double")).as("_last_accessed"),
          c("_pinned", lit(false)).as("_pinned"),
          c("memory_layer", lit(null).cast("string")).as("memory_layer"),
          c("_decay_model", lit(null).cast("string")).as("_decay_model"),
          c("_access_count", lit(0)).as("_access_count"))
        fusedBase.join(meta, Seq(idCol), "left")
          .withColumn("score", col("fused") * Decay.factor(
            params.memory, lit(params.now.toDouble),
            col("_created_at"), col("_last_accessed"), col("_pinned"),
            col("memory_layer"), col("_decay_model"), col("_access_count")))
          .drop(metaCols: _*)
      }

    withDecay
      .orderBy(col("score").desc, col(idCol))
      .limit(params.k)
      .select(col(idCol), col("score"))
  }
}
