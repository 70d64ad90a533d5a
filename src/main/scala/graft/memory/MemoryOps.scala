package graft.memory

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Memory-system row mutations, expressed as whole-table transformations
  * (the event-sourced oplog in `graft.oplog` is the durable form; these are
  * the semantics).
  */
object MemoryOps {

  /** H4 `VReinforce` (`pkg/engine/ops.go:697-785`): for each id in the hit
    * set, `_last_accessed = now`, `_access_count += 1`. Missing counts
    * start at 0.
    */
  def reinforce(table: DataFrame, idCol: String, hit: Column, now: Double): DataFrame = {
    val hasLa = table.columns.contains("_last_accessed")
    val hasAc = table.columns.contains("_access_count")
    val la = if (hasLa) col("_last_accessed") else lit(null).cast("double")
    val ac = if (hasAc) coalesce(col("_access_count").cast("double"), lit(0.0)) else lit(0.0)
    table
      .withColumn("_last_accessed", when(hit, lit(now)).otherwise(la))
      .withColumn("_access_count", when(hit, ac + 1).otherwise(ac))
  }
}
