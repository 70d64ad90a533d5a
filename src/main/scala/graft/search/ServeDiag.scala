package graft.search

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** A/B adjudicator for VERDICT r15 stretch #6 (query-tile the combined
  * pass's text loop): serves the bench's realistic synthetic workload
  * twice — (a) hybrid and (b) the same batch with token arrays stripped
  * (vector leg + blend only) — so the (a)−(b) delta isolates the text
  * leg's cost. Tiling the text loop can at best remove that delta; if it
  * is an immaterial slice of (a), the stretch is a measured negative
  * result, like the r15 nlist sweep (r16 measured: the delta is BELOW
  * the host-noise floor). Diagnostic only; not part of the per-round
  * bench.
  */
object ServeDiag {
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
    import graft.text.{Analyzer, Bm25}

    // The bench synthPoint recipe, condensed: 100k docs, 64-d clustered
    // vectors, zipf 30k-token vocabulary, 3-tail-token queries.
    val N = 100000; val DIM = 64; val VOCAB = 30000; val DOCLEN = 40
    val NQ = 8192
    def tokId(seed: Column, j: Column, salt: String): Column =
      graft.core.SyntheticVectors.zipfTokId(seed, j, salt, VOCAB)
    def vec(idc: Column, salt: String): Column =
      graft.core.SyntheticVectors.clusteredVec(idc, DIM, 500L, salt)
    val corpus = spark.range(N).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(DOCLEN - 1)),
          j => concat(lit("tok"), tokId(col("id"), j, "doc")))).as("text"),
        vec(col("id"), "nz").as("embedding"))
      .cache()
    corpus.count()
    val post = Bm25.postings(corpus, "doc_id", "text")
      .repartition(col("token")).cache()
    post.count()
    val tail = VOCAB - 10000
    val qs = spark.range(NQ).select(
        col("id").as("qid"),
        vec(col("id") + 7, "qnz").as("qvec"),
        concat_ws(" ",
          concat(lit("tok"), (pmod(col("id") * 31, lit(10000)) + tail)),
          concat(lit("tok"), (pmod(col("id") * 37 + 5, lit(10000)) + tail)),
          concat(lit("tok"), (pmod(col("id") * 41 + 11, lit(10000)) + tail)))
          .as("qtext"))
      .cache()
    qs.count()
    val qTokens = Analyzer.tokensDF(qs.select(col("qid"), col("qtext")),
        "qtext", "english")
      .groupBy(col("qid"), col("token")).agg(count(lit(1)).as("qn"))
    val tableN = corpus.select(col("doc_id").cast("long").as("id"),
      graft.functions.VectorFunctions.normalize(col("embedding")).as("vector"))
    val kC = math.max(16, math.sqrt(N.toDouble).round).toInt
    val cents = Ivf.trainKMeansArrays(tableN, kC, iters = 4)
    val assigned = Ivf.assignFast(tableN, cents).cache()
    assigned.count()
    val combined = ServingFusion.buildCombined(
      corpus.select(col("doc_id")), post, "doc_id",
      assigned.select(col("id").as("doc_id"), col("vector"), col("bucket")))
      .cache()
    combined.count()
    val sqFull = ServingFusion.collectServedQueries(
      qs.select(col("qid"), graft.functions.VectorFunctions
        .normalize(col("qvec")).as("qvec")), qTokens)
    val sqNoText = sqFull.map(q => q.copy(tokens = Array.empty))
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(sq: Seq[ServingFusion.ServedQuery]): Unit =
      ServingFusion.fusedTopKCombined(combined, cents, sq,
        alpha0 = 0.6, k = 10, nProbe = 8, kVec = 10)
    run(sqFull); run(sqNoText)
    var (a, b) = (Double.MaxValue, Double.MaxValue)
    for (_ <- 1 to 5) {
      a = math.min(a, timeIt(run(sqFull)))
      b = math.min(b, timeIt(run(sqNoText)))
    }
    println(f"DIAG combined synth batch: hybrid=$a%.3fs vector_only=$b%.3fs " +
      f"text_leg=${a - b}%.3fs (${100 * (a - b) / a}%.1f%% of batch)")
    spark.stop()
  }
}
