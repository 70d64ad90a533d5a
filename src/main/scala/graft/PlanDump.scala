package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Optimization-round measurement tools (guide §1: measure first).
  *
  * `PlanDump` writes `.explain("formatted")` for every declared query (or a
  * named subset) to an output directory — the before/after plan evidence the
  * optimization rounds commit under `plans/rNN/`.
  *
  * Usage: runMain graft.PlanDump <outDir> [queryName...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val outDir = args.headOption.getOrElse("plans/scratch")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(mode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}

/** Per-query job/stage profile: run each named query with a listener and
  * print where the wall-clock goes — job count, per-stage task time,
  * shuffle bytes — so optimization targets the measured cost, not a guess.
  *
  * Usage: runMain graft.Profile <queryName> [queryName...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.scheduler._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(id: Int, name: String, wallMs: Long, runMs: Long,
                        tasks: Int, shRead: Long, shWrite: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val wall = (for (a <- si.submissionTime; b <- si.completionTime)
          yield b - a).getOrElse(-1L)
        val tm = si.taskMetrics
        stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(90), wall,
          tm.executorRunTime, si.numTasks,
          tm.shuffleReadMetrics.totalBytesRead,
          tm.shuffleWriteMetrics.bytesWritten)
      }
    })

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Same cross-query block hygiene as the bench's query section: drop
    // leftover persisted blocks between queries so each profile is
    // independent of how much state earlier queries leaked.
    def sweepBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query $name")
        case Some(fn) =>
          run(fn) // warm: codegen + parquet footers
          sweepBlocks()
          Thread.sleep(200)
          stages.clear(); jobs = 0
          val t0 = System.nanoTime()
          run(fn)
          val sec = (System.nanoTime() - t0) / 1e9
          sweepBlocks()
          Thread.sleep(200)
          val snap = stages.toSeq
          println(f"== $name%s: $sec%.3f s, $jobs%d jobs, ${snap.size}%d stages, " +
            f"${snap.map(_.wallMs).filter(_ > 0).sum}%d stage-wall-ms, " +
            f"${snap.map(_.runMs).sum}%d task-run-ms")
          snap.sortBy(-_.wallMs).take(18).foreach { s =>
            println(f"   stage ${s.id}%5d wall=${s.wallMs}%6d ms run=${s.runMs}%7d ms " +
              f"tasks=${s.tasks}%4d shR=${s.shRead}%9d shW=${s.shWrite}%9d  ${s.name}%s")
          }
      }
    }
    spark.stop()
  }
}
