package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-time materialized deployment layouts — the serving mode the operator
  * docstrings promise (postings clustered by token, IVF assignments
  * partitioned by bucket). Built under the system tmp dir on first use,
  * keyed by the source sf dir; deterministic, so reuse across passes is
  * sound. The `*_stored` query entries read these and share the plain
  * variants' oracle SQL — which proves the layout round-trips losslessly
  * AND benchmarks the per-query serving cost with the build amortized away
  * (the bench's untimed warmup pass performs the build).
  *
  * Note on bucketing: plain parquet has no metastore, so `bucketBy` isn't
  * available here — postings use `repartition(token)` (hash-clustered
  * files, co-located join input), IVF uses `partitionBy(bucket)` (real
  * partition pruning, asserted in PlanShapeSpec).
  */
object Layouts {

  private def root(dir: String, name: String): String = {
    // Key on the source tables' identity AND content fingerprint (size +
    // mtime): /tmp outlives test-data regeneration, and serving a stale
    // layout for fresh data would silently corrupt results. Covers every
    // table any layout derives from (docs/embeddings + the graph tables
    // behind the stored edge view).
    val fp = Seq("documents.parquet", "embeddings.parquet",
      "orders.parquet", "lineitem.parquet").map { f =>
      val p = Paths.get(dir, f)
      if (Files.exists(p))
        s"${Files.size(p)}-${Files.getLastModifiedTime(p).toMillis}"
      else "absent"
    }.mkString("_")
    val key = java.lang.Integer.toHexString((dir + fp).hashCode)
    // v2: oplog schema gained the VCONFIG/VAUTOLINKS payload column — stale
    // v1 snapshot layouts would fail the union with the new-schema tail.
    s"${System.getProperty("java.io.tmpdir")}/graft_layout_v2_$key/$name"
  }

  /** Build-once parquet: `build` runs only if the layout is absent. */
  def stored(s: SparkSession, dir: String, name: String,
             partitionCols: Seq[String] = Nil)(build: => DataFrame): DataFrame = {
    val path = root(dir, name)
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      val w = build.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(path)
    }
    s.read.parquet(path)
  }
}
