package graft.search

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) partition-pruned approximate nearest neighbor — the
  * Spark-native scale strategy replacing the reference's HNSW (SURVEY §7.2
  * M9, §7.4 risk 8). HNSW is a per-node pointer graph that cannot shard
  * across executors; IVF is the idiomatic distributed equivalent:
  *
  *   1. coarse-quantize vectors to their nearest centroid (train: KMeans;
  *      or sampled centroids);
  *   2. store vectors partitioned/bucketed by centroid id — at 100 TB this
  *      is a partition column, so a probe reads only nProbe/k of the data
  *      (partition pruning does the work HNSW's graph descent does);
  *   3. a query ranks centroids (tiny broadcast), probes the nProbe nearest
  *      buckets, and exact-reranks inside them.
  *
  * Recall follows the usual IVF tradeoff (nProbe/numCentroids); the
  * reference's own recall oracle (`clients/python/stress_test_recall.py`)
  * is mirrored by [[recallAt]] against the exact `topKBatch`.
  */
object Ivf {

  /** Distance used throughout (cosine over raw vectors, double precision —
    * matches the DuckDB oracle formula).
    */
  private def dist(v: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
    lit(1.0) - VectorFunctions.cosineSimilarityWide(v, q)

  /** Assign each vector its nearest centroid: (id, vector, bucket).
    * Centroids are broadcast; the argmin is a `min(struct(dist, cid))`
    * aggregation — map-side partial, ties broken by centroid id.
    */
  def assign(
      vectors: DataFrame,
      centroids: DataFrame,
      idCol: String = "id",
      vecCol: String = "vector"): DataFrame = {
    val scored = vectors.crossJoin(broadcast(centroids))
      .withColumn("d", dist(col(vecCol), col("cvec")))
    scored.groupBy(col(idCol))
      .agg(
        first(col(vecCol)).as(vecCol),
        min(struct(col("d"), col("cid"))).as("m"))
      .withColumn("bucket", col("m.cid"))
      .drop("m")
  }

  /** Deterministic Lloyd's KMeans over the vector table. Init = the k rows
    * with the smallest ids (deterministic, seedless); `iters` fixed
    * iterations of assign → mean. Each iteration is one aggregation job;
    * centroids live on the driver between iterations (k × dim floats — the
    * same driver-side footprint Spark ML's KMeans keeps).
    */
  def trainKMeans(
      vectors: DataFrame,
      k: Int,
      iters: Int = 5,
      idCol: String = "id",
      vecCol: String = "vector"): DataFrame = {
    val spark = vectors.sparkSession
    val base = vectors.select(col(idCol).as("id"),
      col(vecCol).cast("array<float>").as("v"))

    // Centroid rows live on the driver between iterations (k × dim — same
    // footprint Spark ML's KMeans keeps). Means are computed in double,
    // vectors fed back to the float codegen kernels as float.
    def centsDF(rows: Array[Row]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cid",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cvec",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
        .select(col("cid"), col("cvec").cast("array<float>").as("cvec"))

    // Init = the k smallest-id vectors (deterministic, seedless). The k rows
    // are collected anyway, so number them on the driver — no global-sort
    // window (TakeOrderedAndProject does the distributed top-k).
    var cents: Array[Row] = base.orderBy(col("id")).limit(k)
      .select(col("v").cast("array<double>").as("cvec"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => Row((i + 1).toLong, r.getSeq[Double](0)) }

    for (_ <- 1 to iters) {
      val assigned = base.crossJoin(broadcast(centsDF(cents)))
        .withColumn("d", dist(col("v"), col("cvec")))
        .groupBy(col("id"))
        .agg(first(col("v")).as("v"), min(struct(col("d"), col("cid"))).as("m"))
        .select(col("v"), col("m.cid").as("cid"))
      cents = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("c"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          e => e.getField("c")).as("cvec"))
        .collect()
    }
    centsDF(cents)
  }

  /** IVF search: probe the nProbe nearest centroid buckets per query, exact
    * cosine rerank inside. `assigned` is the (id, vector, bucket) table —
    * at deployment, a table partitioned by bucket so the probe join becomes
    * partition pruning.
    */
  def search(
      assigned: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      idCol: String = "id",
      vecCol: String = "vector"): DataFrame = {
    // Rank centroids per query — queries × centroids is tiny.
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("cd", dist(col("qvec"), col("cvec")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cd"), col("cid"))))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("qvec"), col("cid").as("bucket"))
    // Probe only the selected buckets (partition pruning at scale), rerank.
    val cand = assigned.join(broadcast(probes), Seq("bucket"))
      .withColumn("distance", dist(col(vecCol), col("qvec")))
    cand
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("distance"), col(idCol))))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("distance"), col("rank"))
  }

  /** Recall@k of an approximate result against the exact result — the
    * reference's recall oracle method. Both inputs: (qid, id, rank ≤ k).
    */
  def recallAt(approx: DataFrame, exact: DataFrame, k: Int): Double = {
    val hits = exact.select(col("qid"), col("id"))
      .join(approx.select(col("qid"), col("id")), Seq("qid", "id"))
      .count()
    val total = exact.count()
    if (total == 0) 0.0 else hits.toDouble / total
  }
}
