package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compiler.Compiler
import graft.core.Tables

/** K1/K2/K4/K7 queries: knowledge compiler deterministic core.
  *
  * NodeInfo set for the entity card: every 40th document, with content =
  * first 40 chars, pinned = doc_id%13==0, relation counts from the
  * doc -cites-> doc+3 graph.
  */
object CompilerQueries {

  val Base: Long = FusionQueries.Base

  /** K1 — the source-query NodeInfo set (graph_query flavor: the node set
    * with relation counts/types attached, `pkg/compiler/query.go:12-147`).
    */
  def nodeInfo(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // Whole-corpus max as a broadcast 1-row agg — the unpartitioned window
    // here funneled every document row through one task.
    docs.crossJoin(broadcast(docs.agg(max(col("doc_id")).as("max_doc"))))
      .filter(col("doc_id") % 40 === 0)
      .select(
        concat(lit("doc:"), col("doc_id")).as("id"),
        col("doc_id").as("rank"),
        substring(col("text"), 1, 40).as("content"),
        (lit(Base) + col("doc_id") * 3600).cast("long").as("created_at"),
        (col("doc_id") % 13 === 0).as("pinned"),
        (when(col("doc_id") + 3 <= col("max_doc"), 1).otherwise(0) +
          when(col("doc_id") >= 3, 1).otherwise(0)).cast("long").as("relation_count"),
        filter(array(
          when(col("doc_id") + 3 <= col("max_doc"), "cites"),
          when(col("doc_id") >= 3, "cited_by")), x => x.isNotNull)
          .as("relation_types"))
  }

  private val nodeInfoSql =
    s"""ni AS (
       |  SELECT 'doc:' || doc_id AS id, doc_id AS rank,
       |    substr(text, 1, 40) AS content,
       |    CAST($Base + doc_id * 3600 AS BIGINT) AS created_at,
       |    doc_id % 13 = 0 AS pinned,
       |    CAST((CASE WHEN doc_id + 3 <= (SELECT max(doc_id) FROM documents) THEN 1 ELSE 0 END
       |     + CASE WHEN doc_id >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS relation_count,
       |    list_filter([
       |      CASE WHEN doc_id + 3 <= (SELECT max(doc_id) FROM documents) THEN 'cites' END,
       |      CASE WHEN doc_id >= 3 THEN 'cited_by' END], x -> x IS NOT NULL) AS relation_types
       |  FROM documents WHERE doc_id % 40 = 0
       |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K1: the source-query node set itself.
    "k1_source_query" -> ((s, dir) => {
      nodeInfo(s, dir)
        .select(col("id"), col("relation_count"),
          concat_ws(",", col("relation_types")).as("relation_types"),
          col("pinned"), col("created_at"))
        .orderBy(col("rank"))
    }),

    // K2/K7: deterministic entity-card compile — one row per template field.
    "k2_compile_fields" -> ((s, dir) => {
      Compiler.compileEntityCard(nodeInfo(s, dir))
        .select(col("field"), col("value"), round(col("confidence"), 2).as("confidence"))
        .orderBy(col("field"))
    }),

    // K3: LLM-field fallback — best-effort snippet collection at 0.4
    // confidence, array and string field flavors (compileBestEffort,
    // deterministic.go:242-270; the LLM path stays behind LlmClient).
    "k3_compile_fallback" -> ((s, dir) => {
      val ni = nodeInfo(s, dir)
      val arr = Compiler.bestEffort(ni, "array")
        .select(lit("snippets_array").as("field"), col("value"),
          round(col("confidence"), 2).as("confidence"))
      val str = Compiler.bestEffort(ni, "string")
        .select(lit("snippet_first").as("field"), col("value"),
          round(col("confidence"), 2).as("confidence"))
      arr.unionByName(str).orderBy(col("field"))
    }),

    // K5: staleness watcher — change events bump staleness; importance-
    // weighted thresholds decide recompilation.
    "k5_staleness" -> ((s, dir) => {
      val arts = Tables.documents(s, dir).filter(col("doc_id") % 40 === 0)
        .select(concat(lit("card:"), col("doc_id")).as("name"),
          (col("doc_id") % 150).cast("long").as("entity"),
          lit(0.0).as("staleness"),
          (col("doc_id") % 37).cast("long").as("usage_count"),
          (col("doc_id") % 30).cast("double").as("recency_hours"),
          (col("doc_id") % 11).cast("double").as("hours_since_compile"),
          (col("doc_id") % 7).cast("long").as("n_sources"))
      val changes = GardenerQueries.mentions(s, dir)
        .filter(col("created_at") > GardenerQueries.Now - 3L * 86400)
        .groupBy(col("entity")).agg(count(lit(1)).as("n_changes"))
        .join(arts.select(col("name"), col("entity")), Seq("entity"))
        .select(col("name"), col("n_changes"))
      Compiler.Staleness.update(arts, changes)
        .select(col("name"), col("n_changes"),
          round(col("importance"), 6).as("importance"),
          round(col("threshold"), 2).as("threshold"),
          round(col("staleness"), 6).as("staleness"), col("needs_recompile"))
        .orderBy(col("name"))
    }),

    // K4: artifact versioning — current survives, newest 2 stale kept.
    "k4_artifact_versions" -> ((s, dir) => {
      val arts = Tables.documents(s, dir).filter(col("doc_id") % 100 === 0)
        .select(col("doc_id"),
          explode(sequence(lit(0L),
            expr("doc_id div 100") % 5 + 1)).as("version"))
        .select(concat(lit("card:"), col("doc_id")).as("name"),
          col("version").cast("long").as("version"),
          (lit(Base) + col("version") * 1000).as("compiled_at"))
        .withColumn("status",
          when(col("version") === max(col("version"))
            .over(Window.partitionBy("name")), "current").otherwise("stale"))
      Compiler.pruneVersions(arts, maxVersions = 3)
        .select(col("name"), col("version"), col("status"), col("kept"))
        .orderBy(col("name"), col("version"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "k1_source_query" ->
      s"""WITH $nodeInfoSql
         |SELECT id, relation_count,
         |  array_to_string(relation_types, ',') AS relation_types,
         |  pinned, created_at
         |FROM ni ORDER BY rank""".stripMargin,

    "k2_compile_fields" ->
      s"""WITH $nodeInfoSql,
         |f AS (
         |  SELECT 'name' AS field,
         |    (SELECT content FROM ni WHERE content IS NOT NULL AND content <> ''
         |     ORDER BY rank LIMIT 1) AS value, 0.8 AS confidence
         |  UNION ALL
         |  SELECT 'node_count', CAST((SELECT count(*) FROM ni) AS VARCHAR), 1.0
         |  UNION ALL
         |  SELECT 'relation_count', CAST((SELECT sum(relation_count) FROM ni) AS VARCHAR), 1.0
         |  UNION ALL
         |  SELECT 'last_activity',
         |    (SELECT strftime(make_timestamp(max(created_at) * 1000000),
         |                     '%Y-%m-%dT%H:%M:%SZ') FROM ni), 0.9
         |  UNION ALL
         |  SELECT 'duration_minutes',
         |    (SELECT CASE WHEN count(*) >= 2
         |       THEN CAST(round((max(created_at) - min(created_at)) / 60.0, 4) AS VARCHAR)
         |       END FROM ni), 0.8
         |  UNION ALL
         |  SELECT 'top_entities',
         |    (SELECT array_to_string(list_slice(
         |       list(id ORDER BY relation_count DESC, id), 1, 10), ',') FROM ni), 0.8
         |  UNION ALL
         |  SELECT 'relation_types',
         |    (SELECT array_to_string(list_sort(list_distinct(flatten(list(relation_types)))), ',')
         |     FROM ni), 0.9
         |  UNION ALL
         |  SELECT 'core_facts',
         |    (SELECT array_to_string(list_sort(list(content) FILTER (WHERE pinned)), ' | ')
         |     FROM ni), 0.95
         |  UNION ALL
         |  SELECT 'sentiment', (SELECT CAST(round(avg(
         |    (CASE WHEN content LIKE '%good%' THEN 1.0 ELSE 0.0 END
         |     + CASE WHEN content LIKE '%great%' THEN 1.0 ELSE 0.0 END
         |     + CASE WHEN content LIKE '%love%' THEN 1.0 ELSE 0.0 END
         |     + CASE WHEN content LIKE '%win%' THEN 1.0 ELSE 0.0 END
         |     - CASE WHEN content LIKE '%bad%' THEN 1.0 ELSE 0.0 END
         |     - CASE WHEN content LIKE '%fail%' THEN 1.0 ELSE 0.0 END
         |     - CASE WHEN content LIKE '%awful%' THEN 1.0 ELSE 0.0 END)), 6) AS VARCHAR)
         |    FROM ni), 0.8)
         |SELECT field, value,
         |  CASE WHEN value IS NULL THEN 0.0 ELSE confidence END AS confidence
         |FROM f ORDER BY field""".stripMargin,

    "k3_compile_fallback" ->
      s"""WITH $nodeInfoSql,
         |sn AS (
         |  SELECT rank, content FROM ni
         |  WHERE content IS NOT NULL AND content <> ''),
         |f AS (
         |  SELECT 'snippet_first' AS field,
         |    (SELECT content FROM sn ORDER BY rank LIMIT 1) AS value
         |  UNION ALL
         |  SELECT 'snippets_array',
         |    (SELECT string_agg(content, '|' ORDER BY rank) FROM sn))
         |SELECT field, value,
         |  CASE WHEN value IS NULL OR value = '' THEN 0.0 ELSE 0.4 END AS confidence
         |FROM f ORDER BY field""".stripMargin,

    "k5_staleness" ->
      s"""WITH ${GardenerQueries.mentionsSql},
         |arts AS (
         |  SELECT 'card:' || doc_id AS name,
         |    CAST(doc_id % 150 AS BIGINT) AS entity,
         |    CAST(doc_id % 37 AS BIGINT) AS usage_count,
         |    CAST(doc_id % 30 AS DOUBLE) AS recency_hours,
         |    CAST(doc_id % 11 AS DOUBLE) AS hours_since_compile,
         |    CAST(doc_id % 7 AS BIGINT) AS n_sources
         |  FROM documents WHERE doc_id % 40 = 0),
         |ch AS (
         |  SELECT a.name, CAST(count(*) AS BIGINT) AS n_changes
         |  FROM mentions m JOIN arts a ON m.entity = a.entity
         |  WHERE m.created_at > ${GardenerQueries.Now} - 3 * 86400
         |  GROUP BY a.name),
         |upd AS (
         |  SELECT a.name, coalesce(ch.n_changes, 0) AS n_changes,
         |    least(10.0, a.usage_count * exp(-a.recency_hours / 168.0) * 0.3
         |      + CASE WHEN a.n_sources > 5 THEN 1.0 ELSE 0.0 END) AS importance,
         |    a.usage_count,
         |    -- CAST AS DOUBLE: a bare 0.3 is DECIMAL in DuckDB (exact
         |    -- arithmetic) while Spark computes in double — a staleness sum
         |    -- landing exactly on a threshold would flip needs_recompile.
         |    coalesce(ch.n_changes, 0) * CAST(0.3 AS DOUBLE)
         |      + a.hours_since_compile * CAST(0.05 AS DOUBLE) AS staleness
         |  FROM arts a LEFT JOIN ch ON a.name = ch.name),
         |thr AS (
         |  SELECT *, CASE WHEN importance > 8.0 THEN 0.5
         |                 WHEN importance > 5.0 THEN 0.7
         |                 WHEN usage_count < 10 THEN 2.0
         |                 ELSE 1.0 END AS threshold
         |  FROM upd)
         |SELECT name, n_changes, round(importance, 6) AS importance,
         |  round(threshold, 2) AS threshold, round(staleness, 6) AS staleness,
         |  staleness >= threshold AS needs_recompile
         |FROM thr ORDER BY name""".stripMargin,

    "k4_artifact_versions" ->
      s"""WITH arts AS (
         |  SELECT 'card:' || doc_id AS name, CAST(v AS BIGINT) AS version,
         |    $Base + v * 1000 AS compiled_at,
         |    CASE WHEN v = (doc_id // 100) % 5 + 1 THEN 'current' ELSE 'stale' END AS status,
         |    (doc_id // 100) % 5 + 1 AS maxv
         |  FROM documents, unnest(generate_series(0, (doc_id // 100) % 5 + 1)) t(v)
         |  WHERE doc_id % 100 = 0)
         |SELECT name, version, status,
         |  (status = 'current' OR version >= maxv - 2) AS kept
         |FROM arts ORDER BY name, version""".stripMargin
  )
}
