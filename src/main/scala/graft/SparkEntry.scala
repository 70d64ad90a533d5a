package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over a scale-factor directory; `oracleSql` carries the DuckDB
  * equivalent for the driver's hash compare. Column names and ordering are
  * aligned between both sides (the compare sorts columns by name).
  */
object SparkEntry {

  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (CoreQueries.queries, CoreQueries.oracleSql),
      (TextQueries.queries, TextQueries.oracleSql),
      (FusionQueries.queries, FusionQueries.oracleSql),
      (GraphQueries.queries, GraphQueries.oracleSql),
      (OplogQueries.queries, OplogQueries.oracleSql),
      (EpistemicQueries.queries, EpistemicQueries.oracleSql),
      (GardenerQueries.queries, GardenerQueries.oracleSql),
      (DedupQueries.queries, DedupQueries.oracleSql),
      (AnnQueries.queries, AnnQueries.oracleSql),
      (RagQueries.queries, RagQueries.oracleSql),
      (TextPipelineQueries.queries, TextPipelineQueries.oracleSql),
      (CurationQueries.queries, CurationQueries.oracleSql),
      (StreamQueries.queries, StreamQueries.oracleSql),
      (MiscQueries.queries, MiscQueries.oracleSql),
      (CompilerQueries.queries, CompilerQueries.oracleSql),
      (ClusterQueries.queries, ClusterQueries.oracleSql),
      (SourceQueries.queries, SourceQueries.oracleSql)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hybrid fusion is the reference's flagship read path (SURVEY §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("h1_fusion_hybrid")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
