package graft.core

import org.apache.spark.sql.DataFrame

/** Driver-side materialization of SMALL, caller-bounded results.
  *
  * Several operators (belief assessment, single-root traversals) persist
  * intermediate frames that back their lazily-returned result. Turning the
  * final — tiny — result into a local relation lets the operator release
  * every cached block before returning, so no RDD outlives the call. Only
  * ever use this where the row count is bounded by construction (one row
  * per seed, a reachable set, a top-k); never on data-sized frames.
  */
object Local {
  def materialized(df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = df.collect().toSeq
    df.sparkSession.createDataFrame(rows.asJava, df.schema)
  }
}
