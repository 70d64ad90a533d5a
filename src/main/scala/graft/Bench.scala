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

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)

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
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$perQuery,"failed":$failed,"cpus":$cpus,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
  }
}
