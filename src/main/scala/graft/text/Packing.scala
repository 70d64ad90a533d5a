package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy next-fit sequence packing for LLM pre-training.
  *
  * Packing documents into fixed-token-budget training sequences is
  * inherently sequential WITHIN a stream (each placement depends on the
  * running fill), so the scale unit is the (source, shard) stream: rows
  * are hash-partitioned by (source, shard), sorted by id within the
  * partition, and packed by a single forward pass per stream inside
  * `mapPartitions`. Parallelism = #sources × #shards — at 100 TB you
  * raise `shards` (e.g. 10k) and every stream still packs with zero
  * coordination; determinism comes from the (source, shard, id) sort,
  * not from task scheduling.
  *
  * Next-fit discipline (the streaming-friendly variant): a document that
  * would overflow the open bin closes it and opens a new one; an
  * oversized document (ntok > budget) occupies a bin alone. First-fit-
  * decreasing packs ~10% tighter but needs random access to open bins —
  * wrong shape for a streaming pass; next-fit is what streaming tokenizer
  * pipelines actually run.
  */
object Packing {

  /** Pack `docs` into per-(source, shard) bins of `budget` tokens.
    *
    * Returns one row per document: (doc_id, source, shard, ntok, bin,
    * bin_fill) where `bin` is the 0-based bin index within the stream and
    * `bin_fill` the stream's open-bin fill AFTER placing the document.
    */
  def packNextFit(docs: DataFrame, idCol: String, sourceCol: String,
      ntokCol: String, budget: Long, shards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .select(
        col(idCol).cast("long").as("doc_id"),
        col(sourceCol).cast("string").as("source"),
        pmod(col(idCol), lit(shards.toLong)).as("shard"),
        col(ntokCol).cast("long").as("ntok"))
      .repartition(col("source"), col("shard"))
      .sortWithinPartitions("source", "shard", "doc_id")
      .as[(Long, String, Long, Long)]
    prepared.mapPartitions { it =>
      // One partition holds whole (source, shard) streams (hash
      // partitioning never splits a key); reset state on stream change.
      var curSource: String = null
      var curShard = Long.MinValue
      var bin = 0L
      var fill = 0L
      it.map { case (id, src, shard, ntok) =>
        if (src != curSource || shard != curShard) {
          curSource = src; curShard = shard; bin = 0L; fill = 0L
        }
        if (fill > 0L && fill + ntok > budget) { bin += 1; fill = ntok }
        else fill += ntok
        (id, src, shard, ntok, bin, fill)
      }
    }.toDF("doc_id", "source", "shard", "ntok", "bin", "bin_fill")
  }
}
