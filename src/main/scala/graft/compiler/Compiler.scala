package graft.compiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.Gardener

/** Knowledge compiler — deterministic core (`pkg/compiler/`): template-driven
  * aggregation of a node set into artifact fields, plus versioned artifact
  * storage with history pruning.
  *
  * K1 source queries reuse the graph/search operators (GraphOps.bfs /
  * VectorSearch); this module is K2 (field compile), K4 (artifact store),
  * K7 (templates). Every field is one aggregation over the NodeInfo set —
  * at scale, compiling N artifacts is one grouped aggregation per field
  * keyed by entity, not N jobs.
  */
object Compiler {

  /** K7 — built-in template field definitions (`template.go:5-272`):
    * field → (source, type). The deterministic sources are compiled below;
    * llm sources fall back to best-effort snippets
    * (`deterministic.go:242-270`).
    */
  val EntityCardTemplate: Seq[(String, String)] = Seq(
    "name" -> "metadata",
    "node_count" -> "computed",
    "relation_count" -> "computed",
    "last_activity" -> "computed",
    "duration_minutes" -> "computed",
    "top_entities" -> "graph",
    "relation_types" -> "graph",
    "core_facts" -> "graph",
    "sentiment" -> "graph")

  /** K2 — compile the deterministic fields of a template over a NodeInfo
    * set: (id, content, created_at, pinned, relation_count, relation_types:
    * array<string>, rank). Returns one row per field:
    * (field, value, confidence).
    *
    * Field semantics from `deterministic.go:11-270`:
    *   - metadata `name`: first node (by rank) with the key; content
    *     fallback at confidence 0.8;
    *   - computed: node_count / total relation_count at 1.0, last_activity
    *     (max created, RFC3339) at 0.9, duration_minutes at 0.8;
    *   - graph: top-10 entities by relation count (ties by id — the
    *     reference's unstable sort made deterministic), distinct sorted
    *     relation types at 0.9, pinned core facts at 0.95, lexicon
    *     sentiment.
    */
  def compileEntityCard(nodes: DataFrame): DataFrame = {
    def row(field: String, value: Column, conf: Double): DataFrame =
      nodes.agg(value.cast("string").as("value"))
        .select(lit(field).as("field"), col("value"),
          when(col("value").isNotNull, lit(conf)).otherwise(lit(0.0))
            .as("confidence"))

    val name = row("name",
      min(when(col("content").isNotNull && col("content") =!= "",
        struct(col("rank"), col("content")))).getField("content"), 0.8)
    val nodeCount = row("node_count", count(lit(1)), 1.0)
    val relCount = row("relation_count",
      sum(col("relation_count")).cast("long"), 1.0)
    val lastActivity = row("last_activity",
      date_format(timestamp_seconds(max(col("created_at"))),
        "yyyy-MM-dd'T'HH:mm:ss'Z'"), 0.9)
    val duration = row("duration_minutes",
      when(count(lit(1)) >= 2,
        round((max(col("created_at")) - min(col("created_at"))) / 60.0, 4)), 0.8)
    val topEntities = row("top_entities",
      concat_ws(",", transform(
        slice(array_sort(collect_list(
          struct((-col("relation_count")).as("neg"), col("id")))), 1, 10),
        e => e.getField("id"))), 0.8)
    val relationTypes = row("relation_types",
      concat_ws(",", array_sort(array_distinct(
        flatten(collect_list(col("relation_types")))))), 0.9)
    val coreFacts = row("core_facts",
      concat_ws(" | ", sort_array(collect_list(
        when(col("pinned"), col("content"))))), 0.95)
    val sentiment = row("sentiment",
      round(avg(Gardener.sentimentScore(col("content"))), 6), 0.8)

    Seq(name, nodeCount, relCount, lastActivity, duration,
      topEntities, relationTypes, coreFacts, sentiment)
      .reduce(_ unionByName _)
  }

  /** K3 — LLM-field fallback (`compileBestEffort`, deterministic.go:242-270):
    * without a model, collect raw content snippets at confidence 0.4 —
    * array fields get all snippets (rank order), string fields the first.
    * The LLM path itself sits behind graft.llm.LlmClient.
    */
  /** The K3 snippet filter — the exact source rows the LLM compile path
    * would rank and prompt with (LlmFrameGoldenSpec pins them); the
    * model-less [[bestEffort]] fallback aggregates the same rows.
    */
  def compileSnippets(nodes: DataFrame): DataFrame =
    nodes.filter(col("content").isNotNull && col("content") =!= "")

  def bestEffort(nodes: DataFrame, fieldType: String): DataFrame = {
    val snippets = compileSnippets(nodes)
    val value = fieldType match {
      case "array" =>
        snippets.agg(concat_ws("|", transform(
          array_sort(collect_list(struct(col("rank"), col("content")))),
          e => e.getField("content"))).as("value"))
      case _ =>
        snippets.agg(min(struct(col("rank"), col("content")))
          .getField("content").as("value"))
    }
    value.select(col("value").cast("string"),
      when(col("value").isNotNull && col("value") =!= "", lit(0.4))
        .otherwise(lit(0.0)).as("confidence"))
  }

  /** K5 — staleness watcher math (`pkg/compiler/watcher.go:55-58,304-350`):
    * staleness grows 0.3 per source-change event and 0.05 per hour since
    * compile; importance = min(10, usage·e^(-recencyHours/168)·0.3
    * [+1 if > 5 sources]); the recompile threshold shrinks for important
    * artifacts (×0.5 above 8, ×0.7 above 5) and doubles for barely-used
    * ones (usage < 10). Recompile when staleness ≥ threshold. The event
    * feed plugs in as a streaming foreachBatch (E1) or a batch join.
    */
  object Staleness {
    val IncrementOnChange = 0.3
    val GrowthPerHour = 0.05
    val BaseThreshold = 1.0

    def importance(usageCount: Column, recencyHours: Column, nSources: Column): Column =
      least(lit(10.0),
        usageCount * exp(-recencyHours / 168.0) * 0.3 +
          when(nSources > 5, 1.0).otherwise(0.0))

    def threshold(imp: Column, usageCount: Column): Column =
      when(imp > 8.0, BaseThreshold * 0.5)
        .when(imp > 5.0, BaseThreshold * 0.7)
        .when(usageCount < 10, BaseThreshold * 2.0)
        .otherwise(BaseThreshold)

    /** artifacts: (name, staleness, usage_count, recency_hours,
      * hours_since_compile, n_sources) joined with per-artifact change
      * counts → updated staleness + recompile decision.
      */
    def update(artifacts: DataFrame, changes: DataFrame): DataFrame = {
      val imp = importance(col("usage_count"), col("recency_hours"), col("n_sources"))
      artifacts.join(changes, Seq("name"), "left")
        .withColumn("n_changes", coalesce(col("n_changes"), lit(0L)))
        .withColumn("staleness",
          col("staleness") + col("n_changes") * IncrementOnChange +
            col("hours_since_compile") * GrowthPerHour)
        .withColumn("importance", imp)
        .withColumn("threshold", threshold(col("importance"), col("usage_count")))
        .withColumn("needs_recompile", col("staleness") >= col("threshold"))
    }
  }

  /** K4 — artifact version pruning (`store.go:201-260`): the current
    * version always survives; stale versions are kept newest-first up to
    * maxVersions-1. artifacts: (name, version, status, compiled_at).
    * Returns the input + kept flag.
    */
  def pruneVersions(artifacts: DataFrame, maxVersions: Int): DataFrame = {
    val staleRank = row_number().over(
      Window.partitionBy(col("name"), col("status"))
        .orderBy(col("compiled_at").desc, col("version").desc))
    artifacts
      .withColumn("stale_rank",
        when(col("status") === "stale", staleRank))
      .withColumn("kept",
        col("status") === "current" ||
          col("stale_rank") <= maxVersions - 1)
      .withColumn("kept", coalesce(col("kept"), lit(false)))
      .drop("stale_rank")
  }
}
