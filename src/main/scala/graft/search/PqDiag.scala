package graft.search

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-epoch A/B adjudicator for the SIFT-1M PQ serving regression
  * (VERDICT r15 #1): builds the bench's exact SIFT-shaped corpus and
  * measures the residual-PQ ADC scan, the exact-rerank two-stage path and
  * the f32 IVF serving scan side by side, under either centroid knob
  * setting. First run (r16, quiet host): old-knob ADC 1141 QPS vs
  * new-knob 1375 QPS — the committed r15 327.6 QPS reproduces under
  * NEITHER setting, and bucket stats are healthy under both (1000/1000
  * alive, probed-pair and probed-row volumes within 7%), so the r15
  * point was a host transient, not a centroid-quality effect.
  * Diagnostic only; not part of the per-round bench.
  */
object PqDiag {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val N = 1000000; val DIM = 128; val NCLUSTERS = 2000L
    val K = 1000; val NQ = 200
    def vec(idc: org.apache.spark.sql.Column, salt: String) =
      graft.core.SyntheticVectors.clusteredVec(idc, DIM, NCLUSTERS, salt,
        normalized = false)
    val emb = spark.range(N)
      .select(col("id"), vec(col("id"), "nz").as("vector")).cache()
    emb.count()
    val queries = spark.range(NQ)
      .select(col("id").as("qid"), vec(col("id"), "qnz").as("qvec")).cache()
    queries.count()
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val knobs =
      if (args.contains("both")) Seq(("old_1of16_8it", 8, 16),
                                     ("new_1of8_16it", 16, 8))
      else Seq(("new_1of8_16it", 16, 8))
    for ((label, iters, mod) <- knobs) {
      val cents = Ivf.trainKMeansArrays(
        emb.filter(col("id") % mod === 0), K, iters = iters, metric = "l2")
      val assigned = Ivf.assignFast(emb, cents, metric = "l2").cache()
      assigned.count()
      val mPq = 16; val subDimPq = 8; val nCodesPq = 256
      val cb = Pq.trainCodebookArrays(
        Pq.residuals(assigned.filter(col("id") % 16 === 0), cents),
        "id", "vector", mPq, subDimPq, nCodesPq, iters = 4)
      val pqIndex = Pq.servingIndexPqResidual(assigned, cents, cb).cache()
      pqIndex.count()
      val serving = Ivf.servingIndex(assigned).cache()
      serving.count()
      def adcRun() = Pq.searchBatchedFastPqResidual(pqIndex, cents, cb,
        queries, k = 10, nProbe = 32)
      def f32Run() = Ivf.searchBatchedFast(serving, cents, queries, k = 10,
        nProbe = 32, metric = "l2")
      def rrRun() = {
        val cand = Pq.searchBatchedFastPqResidual(pqIndex, cents, cb,
            queries, k = 500, nProbe = 32)
          .select(col("qid"), col("id"))
        val rescored = cand
          .join(assigned.select(col("id"), col("vector")), Seq("id"))
          .join(broadcast(queries), Seq("qid"))
          .withColumn("d", graft.functions.VectorFunctions
            .euclideanSqWide(col("vector"), col("qvec")))
        rescored.groupBy(col("qid"))
          .agg(graft.functions.TopK.topK(
            col("id").cast("long"), col("d"), 10).as("_tk"))
          .select(col("qid"), explode(col("_tk")).as("_e"))
          .select(col("qid"), col("_e.id").as("id"),
            col("_e.rank").as("rank"))
      }
      noop(adcRun()); noop(f32Run()); noop(rrRun())
      var (a, f, r) = (Double.MaxValue, Double.MaxValue, Double.MaxValue)
      for (_ <- 1 to 5) {
        a = math.min(a, timeIt(noop(adcRun())))
        f = math.min(f, timeIt(noop(f32Run())))
        r = math.min(r, timeIt(noop(rrRun())))
      }
      println(f"DIAG $label: adc_qps=${NQ / a}%.1f f32_qps=${NQ / f}%.1f " +
        f"rerank_qps=${NQ / r}%.1f (adc=$a%.3fs f32=$f%.3fs rr=$r%.3fs)")
      pqIndex.unpersist(); serving.unpersist(); assigned.unpersist()
    }
    spark.stop()
  }
}
