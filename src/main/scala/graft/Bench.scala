package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark. Methodology (VERDICT r01 §"What's wrong" #4/#5):
  *   - the measured action is a `noop`-format write — materializes every
  *     column, so deterministic UDF projections are not pruned away (a
  *     `count()` lets Catalyst drop unreferenced projections);
  *   - one full untimed warmup pass absorbs session/codegen/JIT startup;
  *   - UTC pinned to match Verify (unix_timestamp determinism);
  *   - the JSON line is printed to stdout AND written to
  *     `$SPARK_GRAFT_BENCH_OUT` (default `bench_out.json` in the CWD) so the
  *     driver can parse it out of sbt's [info]-prefixed stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to the host's real core count — a hardcoded 32 oversubscribes
    // smaller machines and makes timings non-comparable across hosts.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execute(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Optional args = query-name filter for quick spot-timing during
    // development (skips the ANN section); no args = the full driver run.
    val qs0 = SparkEntry.queries.toSeq.sortBy(_._1)
    val qs = if (args.isEmpty) qs0 else qs0.filter { case (n, _) => args.contains(n) }

    // Warmup: full pass, untimed (codegen + parquet footer caches + JIT).
    qs.foreach { case (_, fn) => try execute(fn) catch { case _: Throwable => () } }

    val results = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A crashing query must not read as a speedup: record -1, not its
      // fail-fast wall time (ADVICE r02).
      val ok = try { execute(fn); true } catch { case _: Throwable => false }
      val secs = (System.nanoTime() - t0) / 1e9
      (name, if (ok) secs else -1.0, ok)
    }
    val perQuery = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum

    // ANN section: batched-QPS exact vs KMeans-IVF + recall@10 — the honest
    // comparable to the reference's HNSW QPS (BASELINE.md: batched
    // throughput at equal recall is the metric for a batch engine).
    val ann = if (args.nonEmpty) "" else try {
      import org.apache.spark.sql.functions._
      import graft.search.{Ivf, VectorSearch}
      val emb = graft.core.Tables.embeddings(spark, sfDir)
        .select(col("vec_id").cast("long").as("id"), col("embedding").as("vector"))
        .cache()
      emb.count()
      val queries = emb.filter(col("id") < 1000)
        .select(col("id").as("qid"), col("vector").as("qvec")).cache()
      val nq = queries.count()
      val cents = Ivf.trainKMeans(emb, k = 32, iters = 3)
      val assigned = Ivf.assign(emb, cents).cache()
      assigned.count()
      def timeIt(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val exact = VectorSearch.topKBatch(emb, queries, k = 10, metric = "cosine",
        idCol = "id", vecCol = "vector", wide = true).cache()
      val exactSec = timeIt(exact.count())
      // nProbe sweep: uniform random embeddings are the no-structure worst
      // case for IVF, so report the whole recall/throughput tradeoff curve
      // rather than one point (real corpora cluster; recall at fixed nProbe
      // is higher there).
      val sweep = Seq(4, 8, 16, 32).map { np =>
        val approx = Ivf.search(assigned, cents, queries, k = 10, nProbe = np).cache()
        val sec = timeIt(approx.count())
        val recall = Ivf.recallAt(approx, exact, 10)
        approx.unpersist()
        s"""{"n_probe":$np,"sec":$sec,"qps":${nq / sec},"recall_at_10":$recall}"""
      }.mkString("[", ",", "]")
      emb.unpersist(); queries.unpersist(); assigned.unpersist()
      exact.unpersist()
      s""","ann":{"n_queries":$nq,"n_centroids":32,"exact_sec":$exactSec,"exact_qps":${nq / exactSec},"ivf":$sweep}"""
    } catch { case _: Throwable => "" }

    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$perQuery,"failed":$failed,"cpus":$cpus$ann,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
  }
}
