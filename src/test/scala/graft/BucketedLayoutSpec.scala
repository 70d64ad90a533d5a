package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Turns the docstrings' "shuffle-free when bucketed" claims into checked
  * plans. Plain-parquet layouts can't carry bucket metadata (no
  * metastore — `Layouts.scala`'s documented limitation), but the SAME
  * writes through `bucketBy().saveAsTable()` on the session catalog can,
  * and that is exactly the deployment shape the x21 corpus-diff and
  * graph per-hop joins promise at 100 TB: co-partitioned storage makes
  * the key-equi join run with ZERO exchanges.
  */
class BucketedLayoutSpec extends SparkSpec {

  /** DROP TABLE alone leaves the managed LOCATION behind when a fresh
    * session's catalog has never seen the table — clear both, or the
    * next run fails with LOCATION_ALREADY_EXISTS.
    */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(loc)) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
    }
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    // Force execution so AQE finalizes the plan, then count exchanges in
    // the final adaptive plan.
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan
    var n = 0
    p.foreachUp {
      case _: ShuffleExchangeExec => n += 1
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.foreachUp {
          case _: ShuffleExchangeExec => n += 1
          case _ =>
        }
      case _ =>
    }
    n
  }

  test("doc_id-bucketed snapshot tables FULL OUTER join with zero shuffles (x21 at scale)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    resetTable("snap_a")
    resetTable("snap_b")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("snap_a")
    // Snapshot B: half the docs modified, one in five dropped — the x21
    // corpus-diff workload shape.
    docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 2 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("snap_b")

    val a = spark.table("snap_a")
    val b = spark.table("snap_b")
    val diff = a.select(col("doc_id"), sha2(col("text"), 256).as("ha"))
      .join(b.select(col("doc_id"), sha2(col("text"), 256).as("hb")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") === col("hb"), "unchanged")
          .otherwise("modified").as("status"))

    assert(shuffles(diff) === 0,
      "bucketed co-partitioned snapshots must diff without an exchange:\n" +
        diff.queryExecution.executedPlan.toString.take(3000))
    // And the diff itself is right.
    val byStatus = diff.groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus("removed") === docs.filter(col("doc_id") % 5 === 0).count())
    assert(byStatus.getOrElse("added", 0L) === 0L)
    assert(byStatus("modified") ===
      docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 === 0).count())
  }

  test("doc_id-bucketed join reuses storage partitioning for aggregation too") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    resetTable("snap_g")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("snap_g")
    // A doc_id-keyed aggregation over the bucketed table needs no
    // exchange either — the groupBy key IS the bucket key.
    val agg = spark.table("snap_g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    assert(shuffles(agg) === 0,
      agg.queryExecution.executedPlan.toString.take(2000))
  }
}
