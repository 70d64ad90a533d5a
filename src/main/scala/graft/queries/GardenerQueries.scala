package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Gardener
import graft.core.Tables

/** C4-C7, C10, C11 queries: gardener detectors over a memory view derived
  * from the `events` table.
  *
  * Each event is a memory `ev:<id>` mentioning entity `u:<user_id>` at
  * `unix_timestamp(ts)`, with deterministic synthetic content (sentiment and
  * profile keywords keyed off event_type and user_id) so the DuckDB oracle
  * can replicate the text analysis exactly. `now` = 2024-02-01 (events span
  * 2024-01-01..01-30).
  */
object GardenerQueries {

  val Now: Long = FusionQueries.Now // 2024-02-01
  val Jan2: Long = 1704153600L      // 2024-01-02 — the "30 days ago" point

  /** Mentions view: (entity=user_id, created_at, content). */
  def mentions(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val uid = col("user_id")
    val base = when(col("event_type") === "error", "bad fail in the build")
      .when(col("event_type") === "purchase", "love this great product win")
      .when(col("event_type") === "signup", "signup went good")
      .when(col("event_type") === "click", "click on dashboard")
      .otherwise("view of the report")
    val style = when(uid % 3 === 0, " conciso breve")
      .when(uid % 3 === 1, " verbose dettagliato")
      .otherwise(" medium technical")
    val langS = when(uid % 5 === 0, " italiano")
      .when(uid % 5 === 1, " english").otherwise("")
    val expR = when(uid % 4 === 0, " rust").otherwise("")
    val expP = when(uid % 7 === 0, " python").otherwise("")
    ev.select(
      uid.cast("long").as("entity"),
      col("ts_sec").as("created_at"),
      concat(base, style, langS, expR, expP).as("content"),
      col("event_type"),
      col("event_id"))
  }

  /** Shared DuckDB CTE mirroring [[mentions]]. */
  private[queries] val mentionsSql =
    """mentions AS (
      |  SELECT CAST(user_id AS BIGINT) AS entity,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS created_at,
    (CASE event_type
      |       WHEN 'error' THEN 'bad fail in the build'
      |       WHEN 'purchase' THEN 'love this great product win'
      |       WHEN 'signup' THEN 'signup went good'
      |       WHEN 'click' THEN 'click on dashboard'
      |       ELSE 'view of the report' END ||
      |     CASE WHEN user_id % 3 = 0 THEN ' conciso breve'
      |          WHEN user_id % 3 = 1 THEN ' verbose dettagliato'
      |          ELSE ' medium technical' END ||
      |     CASE WHEN user_id % 5 = 0 THEN ' italiano'
      |          WHEN user_id % 5 = 1 THEN ' english' ELSE '' END ||
      |     CASE WHEN user_id % 4 = 0 THEN ' rust' ELSE '' END ||
      |     CASE WHEN user_id % 7 = 0 THEN ' python' ELSE '' END) AS content,
      |    event_type, event_id
      |  FROM events
      |)""".stripMargin

  private val sentimentSql =
    """(CASE WHEN content LIKE '%good%' THEN 1.0 ELSE 0.0 END
      | + CASE WHEN content LIKE '%great%' THEN 1.0 ELSE 0.0 END
      | + CASE WHEN content LIKE '%love%' THEN 1.0 ELSE 0.0 END
      | + CASE WHEN content LIKE '%win%' THEN 1.0 ELSE 0.0 END
      | - CASE WHEN content LIKE '%bad%' THEN 1.0 ELSE 0.0 END
      | - CASE WHEN content LIKE '%fail%' THEN 1.0 ELSE 0.0 END
      | - CASE WHEN content LIKE '%awful%' THEN 1.0 ELSE 0.0 END)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C4: recent-vs-history mention counts with the spike heuristic.
    "c4_importance_shifts" -> ((s, dir) => {
      Gardener.importanceShifts(mentions(s, dir), Now)
        .select(col("entity"), col("recent"), col("old"), col("spike"),
          round(col("confidence"), 6).as("confidence"))
        .orderBy(col("entity"))
    }),

    // C5: two-period lexicon sentiment per entity.
    "c5_sentiment_shifts" -> ((s, dir) => {
      Gardener.sentimentShifts(mentions(s, dir), Now)
        .select(col("entity"), col("past_n"), col("recent_n"),
          round(col("avg_past"), 6).as("avg_past"),
          round(col("avg_recent"), 6).as("avg_recent"),
          round(col("delta"), 6).as("delta"), col("shifted"))
        .orderBy(col("entity"))
    }),

    // C6: time-travel degree comparison (now vs Jan 2).
    "c6_centrality_shifts" -> ((s, dir) => {
      val edges = mentions(s, dir).select(
        col("entity").as("node"), col("created_at"),
        lit(null).cast("long").as("deleted_at"))
      Gardener.centralityShifts(edges, Now, Jan2)
        .select(col("node"), col("deg_now"), col("deg_past"), col("shifted"),
          round(col("confidence"), 6).as("confidence"))
        .orderBy(col("node"))
    }),

    // C7: significant entities idle for 2+ days before `now`.
    "c7_forgetting" -> ((s, dir) => {
      Gardener.forgettingPatterns(mentions(s, dir), Now, idleSecs = 2L * 86400)
        .select(col("entity"), col("total"), col("last_mention"),
          col("forgotten"), round(col("confidence"), 6).as("confidence"))
        .orderBy(col("entity"))
    }),

    // C9 (deterministic): error events as failed agent actions, keyed by
    // the props payload — ≥3 of the same action in the window is a pattern.
    // Window widened to 72h (the data ends a day before `now`).
    "c9_repeated_failures" -> ((s, dir) => {
      val failures = Tables.events(s, dir)
        .filter(col("event_type") === "error")
        .select(
          concat(lit("act:"),
            regexp_extract(col("props"), "\\d+", 0).cast("long") % 10).as("action"),
          col("ts_sec").as("created_at"))
      Gardener.repeatedFailures(failures, Now, windowSecs = 72L * 3600)
        .select(col("action"), col("n_failures"), col("last_failure"))
        .orderBy(col("action"))
    }),

    // C10: session = (user, day); counts, bounds, duration, dominant topic.
    "c10_sessions" -> ((s, dir) => {
      val m = mentions(s, dir).filter(col("entity") < 20)
        .select(
          concat(col("entity"), lit(":"),
            date_format(to_utc_timestamp(timestamp_seconds(col("created_at")), "UTC"),
              "yyyy-MM-dd")).as("session_id"),
          col("created_at"), col("event_type").as("topic"))
      Gardener.sessionSummaries(m)
        .select(col("session_id"), col("n_memories"),
          col("start_ts"), col("end_ts"),
          round(col("duration_minutes"), 4).as("duration_minutes"),
          col("top_topic"))
        .orderBy(col("session_id"))
    }),

    // C13 (C9 family): user-preference insight scaffolding — tagged-memory
    // relevance filter, ≥2-source floor, elementwise vector centroid,
    // confidence min(1, n/10). Memory view over `embeddings`: user = vec_id
    // % 50, tag keyed off label, every 13th content empty (exercises the
    // non-empty filter).
    "c13_user_preferences" -> ((s, dir) => {
      val mem = Tables.embeddings(s, dir).select(
        (col("vec_id") % 50).cast("long").as("user_id"),
        array(when(col("label") % 3 === 0, "user_interaction")
          .when(col("label") % 3 === 1, "observation")
          .otherwise("note")).as("tags"),
        when(col("vec_id") % 13 === 0, "")
          .otherwise(concat(lit("obs "), col("vec_id"))).as("content"),
        col("embedding"))
      Gardener.userPreferenceInsights(mem)
        .select(col("user_id"), col("n_sources"),
          round(col("confidence"), 6).as("confidence"),
          col("dim"), round(col("centroid_norm"), 6).as("centroid_norm"))
        .orderBy(col("user_id"))
    }),

    // C14 (C9 family): core-fact extraction scaffolding — candidate filter,
    // page cap, processed exclusion, content fallback chain, user grouping
    // with solo items. Memory view over `events`.
    "c14_core_facts" -> ((s, dir) => {
      // Every 11th memory already has an incoming extracted_from edge (a
      // previously-created core_fact node points at it) — the exclusion is
      // DERIVED from the edge view by anti-join, as the reference does.
      val ev = Tables.events(s, dir)
      val extractedFrom = ev.filter(col("event_id") % 11 === 0)
        .select(concat(lit("cf:"), col("event_id")).as("src"),
          col("event_id").as("dst"), lit("extracted_from").as("rel"))
      val mem = ev.select(
        col("event_id").as("mem_id"),
        when(col("user_id") % 4 =!= 0, concat(lit("u"), col("user_id")))
          .otherwise(lit(null)).as("user_id"),
        when(col("event_type") === "click", "user_interaction")
          .otherwise("note").as("typ"),
        when(col("event_type") === "signup", "episodic")
          .otherwise("semantic").as("layer"),
        (col("event_id") % 7 === 0).as("archived"),
        lit(false).as("processed"),
        when(col("event_id") % 3 === 0, "")
          .otherwise(concat(lit("c"), col("event_id"))).as("content"),
        when(col("event_id") % 6 === 0, concat(lit("t"), col("event_id")))
          .otherwise("").as("text"),
        when(col("event_id") % 9 === 0, "")
          .otherwise(concat(lit("s"), col("event_id"))).as("summary"),
        lit("").as("description"))
      Gardener.coreFactGroups(mem, extractedFrom = Some(extractedFrom))
        .select(col("group_id"), col("n_inputs"),
          col("first_mem").cast("long").as("first_mem"),
          col("confidence"), col("pinned"))
        .orderBy(col("group_id"))
    }),

    // C15 (C9 family): knowledge-evolution snapshots — top-3 high-centrality
    // supp: entities, depth-2 time-travel neighborhoods at now-30d/-15d/-1d
    // over the temporal edge view (returned lineitems' soft deletes make the
    // three snapshots genuinely differ).
    "c15_knowledge_evolution" -> ((s, dir) => {
      // The edge view is served from the shared stored layout (see
      // GraphQueries.edgeView — the state table IS materialized in a
      // deployment), so the steady-state cost here is a pruned parquet
      // read, not re-deriving + eagerly checkpointing the view per run
      // (the localCheckpoint this replaces was the bench's slowest line).
      val e = GraphQueries.edgeView(s, dir)
        .select("src", "dst", "created_at", "deleted_at")
      Gardener.knowledgeEvolution(e, _.startsWith("supp:"), GraphQueries.T0)
        .select(col("root"), col("snap"), col("in_degree"),
          col("n_connected"), round(col("confidence"), 6).as("confidence"))
        .orderBy(col("root"), col("snap"))
    }),

    // C16 (C9 family): cross-validator meta-detector — entities flagged by
    // >=2 of the c4-c7 detectors this cycle get a composite reflection:
    // geometric-mean confidence x diversity boost (gardener.go:3145-3243).
    "c16_cross_validator" -> ((s, dir) => {
      val m = mentions(s, dir)
      val imp = Gardener.importanceShifts(m, Now).filter(col("spike"))
        .select(col("entity"), lit("importance").as("detector"),
          col("confidence"))
      val sen = Gardener.sentimentShifts(m, Now).filter(col("shifted"))
        .select(col("entity"), lit("sentiment").as("detector"),
          col("confidence"))
      val edges = m.select(col("entity").as("node"), col("created_at"),
        lit(null).cast("long").as("deleted_at"))
      val cen = Gardener.centralityShifts(edges, Now, Jan2)
        .filter(col("shifted"))
        .select(col("node").as("entity"), lit("centrality").as("detector"),
          col("confidence"))
      val forg = Gardener.forgettingPatterns(m, Now, idleSecs = 2L * 86400)
        .filter(col("forgotten"))
        .select(col("entity"), lit("forgetting").as("detector"),
          col("confidence"))
      Gardener.crossValidator(
          imp.unionByName(sen).unionByName(cen).unionByName(forg))
        .select(col("entity"), col("detector_count"), col("n_sources"),
          col("detector_types"),
          round(col("geo_mean"), 6).as("geo_mean"),
          round(col("composite_confidence"), 6).as("composite_confidence"))
        .orderBy(col("entity"))
    }),

    // C17 (C8's similarity seam): contradiction candidate generation — the
    // deterministic scaffolding in front of the judge LLM
    // (detectContradictions, gardener.go:1310-1371). Two gardener cycles:
    // cycle 1 scans the even half of the 50-id cursor page and its
    // candidate pairs become analyzed_against edges; cycle 2 scans the full
    // page and must exclude exactly cycle 1's pairs — the reference's
    // incremental cursor semantics. Top-5 neighbors per scanned node, kept
    // in the similarity band, skipping meta-nodes/empty content/self. Band
    // scaled to the synthetic corpus's similarity range (top-5 sims span
    // ~0.27-0.60 here; the API defaults keep the reference's 0.70/0.95,
    // which assume its normalized real-text embeddings).
    "c17_contradiction_candidates" -> ((s, dir) => {
      val mem = Tables.embeddings(s, dir).select(
        col("vec_id").cast("long").as("mem_id"), col("embedding"),
        when(col("vec_id") % 19 === 0, "reflection")
          .when(col("vec_id") % 19 === 1, "consolidated_memory")
          .when(col("vec_id") % 19 === 2, "consolidated_belief")
          .when(col("vec_id") % 19 === 3, "evolved_memory")
          .otherwise("memory").as("typ"),
        when(col("vec_id") % 13 === 0, "")
          .otherwise(concat(lit("m"), col("vec_id"))).as("content"))
      val page1 = mem.filter(col("mem_id") % 2 === 0 && col("mem_id") < 50)
      val page2 = mem.filter(col("mem_id") < 50)
      val none = mem.select(col("mem_id").as("src"), col("mem_id").as("dst"))
        .limit(0)
      val analyzed = Gardener.contradictionCandidates(mem, page1, none,
          lo = 0.30, hi = 0.45)
        .select(col("src_mem").as("src"), col("dst_mem").as("dst"))
      Gardener.contradictionCandidates(mem, page2, analyzed,
          lo = 0.30, hi = 0.45)
        .orderBy(col("src_mem"), col("dst_mem"))
    }),

    // C11: deterministic keyword-based profiles.
    "c11_profiles" -> ((s, dir) => {
      val inter = mentions(s, dir).filter(col("entity") < 30)
        .select(col("entity").as("user_id"), col("content"))
      Gardener.profiles(inter)
        .select(col("user_id"), col("n_interactions"),
          round(col("confidence"), 6).as("confidence"),
          col("response_length"), col("language"), col("style"),
          col("knows_rust"), col("knows_python"))
        .orderBy(col("user_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // Independent re-derivation of both gardener cycles: brute-force
    // ranked similarity (window row_number) vs the engine's bounded TopK
    // aggregate; the cycle-1 CTE re-computes the analyzed_against set.
    // Restricting queries per page AFTER ranking is sound: top-5 is
    // per-qid independent, so one `cand` CTE serves both cycles, exactly
    // like the Spark side's per-page calls.
    "c17_contradiction_candidates" ->
      """WITH mem AS (
        |  SELECT vec_id AS mem_id, embedding,
        |    CASE WHEN vec_id % 19 = 0 THEN 'reflection'
        |         WHEN vec_id % 19 = 1 THEN 'consolidated_memory'
        |         WHEN vec_id % 19 = 2 THEN 'consolidated_belief'
        |         WHEN vec_id % 19 = 3 THEN 'evolved_memory'
        |         ELSE 'memory' END AS typ,
        |    CASE WHEN vec_id % 13 = 0 THEN '' ELSE concat('m', vec_id) END AS content
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.mem_id AS qid, c.mem_id AS id,
        |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |      CAST(q.embedding AS DOUBLE[])) AS s
        |  FROM mem AS q, mem AS c
        |  WHERE q.content <> '' AND q.typ NOT IN
        |    ('reflection','consolidated_memory','consolidated_belief','evolved_memory')),
        |ranked AS (
        |  SELECT qid, id, round(s, 6) AS sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY (1.0 - s), id) AS rn
        |  FROM scored),
        |cand AS (
        |  SELECT r.qid, r.id, r.sim FROM ranked r
        |  JOIN mem n ON n.mem_id = r.id
        |  WHERE r.rn <= 5 AND r.id <> r.qid
        |    AND r.sim >= 0.30 AND r.sim <= 0.45
        |    AND n.content IS NOT NULL AND n.typ NOT IN
        |      ('reflection','consolidated_memory','consolidated_belief','evolved_memory'))
        |SELECT CAST(c2.qid AS BIGINT) AS src_mem,
        |  CAST(c2.id AS BIGINT) AS dst_mem, c2.sim
        |FROM (SELECT qid, id, sim FROM cand WHERE qid < 50) AS c2
        |LEFT JOIN (SELECT qid, id FROM cand WHERE qid % 2 = 0 AND qid < 50) AS c1
        |  ON c1.qid = c2.qid AND c1.id = c2.id
        |WHERE c1.qid IS NULL
        |ORDER BY 1, 2""".stripMargin,

    "c4_importance_shifts" ->
      s"""WITH $mentionsSql,
         |agg AS (
         |  SELECT entity,
         |    CAST(sum(CASE WHEN created_at > $Now - 3*86400 THEN 1 ELSE 0 END) AS BIGINT) AS recent,
         |    CAST(sum(CASE WHEN created_at <= $Now - 3*86400 THEN 1 ELSE 0 END) AS BIGINT) AS old
         |  FROM mentions GROUP BY entity)
         |SELECT entity, recent, old,
         |  (recent > 5 AND recent > old * 2.0) AS spike,
         |  round(CASE WHEN recent > 5 AND recent > old * 2.0
         |        THEN least(1.0, recent / 10.0) END, 6) AS confidence
         |FROM agg WHERE recent + old >= 5 ORDER BY entity""".stripMargin,

    "c5_sentiment_shifts" ->
      s"""WITH $mentionsSql,
         |scored AS (SELECT entity, created_at, $sentimentSql AS s FROM mentions),
         |agg AS (
         |  SELECT entity,
         |    CAST(sum(CASE WHEN created_at < $Now - 14*86400 THEN 1 ELSE 0 END) AS BIGINT) AS past_n,
         |    CAST(sum(CASE WHEN created_at >= $Now - 14*86400 THEN 1 ELSE 0 END) AS BIGINT) AS recent_n,
         |    avg(CASE WHEN created_at < $Now - 14*86400 THEN s END) AS avg_past,
         |    avg(CASE WHEN created_at >= $Now - 14*86400 THEN s END) AS avg_recent
         |  FROM scored GROUP BY entity)
         |SELECT entity, past_n, recent_n,
         |  round(avg_past, 6) AS avg_past, round(avg_recent, 6) AS avg_recent,
         |  round(avg_recent - avg_past, 6) AS delta,
         |  (past_n > 0 AND recent_n > 0 AND abs(avg_recent - avg_past) >= 1.5) AS shifted
         |FROM agg WHERE past_n + recent_n >= 4 ORDER BY entity""".stripMargin,

    "c6_centrality_shifts" ->
      s"""WITH $mentionsSql,
         |agg AS (
         |  SELECT entity AS node,
         |    CAST(sum(CASE WHEN created_at <= $Now THEN 1 ELSE 0 END) AS BIGINT) AS deg_now,
         |    CAST(sum(CASE WHEN created_at <= $Jan2 THEN 1 ELSE 0 END) AS BIGINT) AS deg_past
         |  FROM mentions GROUP BY entity)
         |SELECT node, deg_now, deg_past,
         |  (deg_past > 0 AND deg_now > deg_past * 3.0) AS shifted,
         |  round(CASE WHEN deg_past > 0 AND deg_now > deg_past * 3.0
         |        THEN least(1.0, deg_now / deg_past / 5.0) END, 6) AS confidence
         |FROM agg WHERE deg_now >= 10 ORDER BY node""".stripMargin,

    "c7_forgetting" ->
      s"""WITH $mentionsSql,
         |agg AS (
         |  SELECT entity, CAST(count(*) AS BIGINT) AS total,
         |    max(created_at) AS last_mention
         |  FROM mentions GROUP BY entity)
         |SELECT entity, total, last_mention,
         |  (last_mention <= $Now - 2*86400) AS forgotten,
         |  round(CASE WHEN last_mention <= $Now - 2*86400
         |        THEN least(1.0, total / 10.0) END, 6) AS confidence
         |FROM agg WHERE total >= 5 ORDER BY entity""".stripMargin,

    "c9_repeated_failures" ->
      s"""WITH f AS (
         |  SELECT 'act:' || (CAST(regexp_extract(props, '\\d+', 0) AS BIGINT) % 10) AS action,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS created_at
         |  FROM events WHERE event_type = 'error')
         |SELECT action, CAST(count(*) AS BIGINT) AS n_failures,
         |  max(created_at) AS last_failure
         |FROM f WHERE created_at >= $Now - 72 * 3600
         |GROUP BY action HAVING count(*) >= 3 ORDER BY action""".stripMargin,

    "c10_sessions" ->
      s"""WITH $mentionsSql,
         |mem AS (
         |  SELECT entity || ':' || strftime(to_timestamp(created_at), '%Y-%m-%d') AS session_id,
         |    created_at, event_type AS topic
         |  FROM mentions WHERE entity < 20),
         |stats AS (
         |  SELECT session_id, CAST(count(*) AS BIGINT) AS n_memories,
         |    min(created_at) AS start_ts, max(created_at) AS end_ts
         |  FROM mem GROUP BY session_id),
         |top AS (
         |  SELECT session_id, topic AS top_topic FROM (
         |    SELECT session_id, topic,
         |      row_number() OVER (PARTITION BY session_id
         |                         ORDER BY count(*) DESC, topic) AS rn
         |    FROM mem GROUP BY session_id, topic)
         |  WHERE rn = 1)
         |SELECT s.session_id, n_memories, start_ts, end_ts,
         |  round((end_ts - start_ts) / 60.0, 4) AS duration_minutes, top_topic
         |FROM stats s JOIN top USING (session_id)
         |ORDER BY session_id""".stripMargin,

    "c16_cross_validator" ->
      s"""WITH $mentionsSql,
         |imp AS (
         |  SELECT entity, 'importance' AS detector,
         |    least(1.0, recent / 10.0) AS confidence
         |  FROM (
         |    SELECT entity,
         |      sum(CASE WHEN created_at > $Now - 3*86400 THEN 1 ELSE 0 END) AS recent,
         |      sum(CASE WHEN created_at <= $Now - 3*86400 THEN 1 ELSE 0 END) AS old
         |    FROM mentions GROUP BY entity)
         |  WHERE recent + old >= 5 AND recent > 5 AND recent > old * 2.0),
         |sen AS (
         |  SELECT entity, 'sentiment' AS detector,
         |    least(1.0, (abs(avg_recent - avg_past) / 3.0)
         |      * least(1.0, (past_n + recent_n) / 8.0)) AS confidence
         |  FROM (
         |    SELECT entity,
         |      sum(CASE WHEN created_at < $Now - 14*86400 THEN 1 ELSE 0 END) AS past_n,
         |      sum(CASE WHEN created_at >= $Now - 14*86400 THEN 1 ELSE 0 END) AS recent_n,
         |      avg(CASE WHEN created_at < $Now - 14*86400 THEN $sentimentSql END) AS avg_past,
         |      avg(CASE WHEN created_at >= $Now - 14*86400 THEN $sentimentSql END) AS avg_recent
         |    FROM mentions GROUP BY entity)
         |  WHERE past_n + recent_n >= 4 AND past_n > 0 AND recent_n > 0
         |    AND abs(avg_recent - avg_past) >= 1.5),
         |cen AS (
         |  SELECT node AS entity, 'centrality' AS detector,
         |    least(1.0, deg_now / deg_past / 5.0) AS confidence
         |  FROM (
         |    SELECT entity AS node,
         |      sum(CASE WHEN created_at <= $Now THEN 1 ELSE 0 END) AS deg_now,
         |      sum(CASE WHEN created_at <= $Jan2 THEN 1 ELSE 0 END) AS deg_past
         |    FROM mentions GROUP BY entity)
         |  WHERE deg_now >= 10 AND deg_past > 0 AND deg_now > deg_past * 3.0),
         |forg AS (
         |  SELECT entity, 'forgetting' AS detector,
         |    least(1.0, total / 10.0) AS confidence
         |  FROM (
         |    SELECT entity, count(*) AS total, max(created_at) AS last_mention
         |    FROM mentions GROUP BY entity)
         |  WHERE total >= 5 AND last_mention <= $Now - 2*86400),
         |flags AS (
         |  SELECT * FROM imp UNION ALL SELECT * FROM sen
         |  UNION ALL SELECT * FROM cen UNION ALL SELECT * FROM forg),
         |agg AS (
         |  SELECT entity,
         |    CAST(count(DISTINCT detector) AS BIGINT) AS detector_count,
         |    CAST(count(*) AS BIGINT) AS n_sources,
         |    exp(avg(ln(confidence))) AS geo_mean,
         |    array_to_string(list_sort(list_distinct(list(detector))), ',') AS detector_types
         |  FROM flags GROUP BY entity
         |  HAVING count(DISTINCT detector) >= 2)
         |SELECT CAST(entity AS BIGINT) AS entity, detector_count, n_sources,
         |  detector_types, round(geo_mean, 6) AS geo_mean,
         |  round(least(1.0, geo_mean
         |    * (0.7 + 0.3 * least(1.0, detector_count / 3.0))), 6)
         |    AS composite_confidence
         |FROM agg ORDER BY entity""".stripMargin,

    "c13_user_preferences" ->
      """WITH mem AS (
        |  SELECT vec_id % 50 AS user_id,
        |    CASE WHEN label % 3 = 0 THEN 'user_interaction'
        |         WHEN label % 3 = 1 THEN 'observation' ELSE 'note' END AS tag,
        |    CASE WHEN vec_id % 13 = 0 THEN '' ELSE 'obs ' || vec_id END AS content,
        |    embedding
        |  FROM embeddings),
        |rel AS (
        |  SELECT * FROM mem
        |  WHERE tag IN ('user_interaction', 'observation') AND content <> ''),
        |-- dim is fixed at 64 across sf dirs (DuckDB's range() can't take a
        |-- lateral len(embedding) parameter); the Spark side posexplodes and
        |-- is dimension-agnostic.
        |cent AS (
        |  SELECT user_id, r.i AS pos, avg(embedding[r.i]) AS m
        |  FROM rel, range(1, 65) r(i)
        |  GROUP BY user_id, r.i),
        |norms AS (
        |  SELECT user_id, round(sqrt(sum(m * m)), 6) AS centroid_norm,
        |    CAST(count(*) AS BIGINT) AS dim
        |  FROM cent GROUP BY user_id),
        |agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_sources
        |  FROM rel GROUP BY user_id HAVING count(*) >= 2)
        |SELECT CAST(a.user_id AS BIGINT) AS user_id, n_sources,
        |  round(least(1.0, n_sources / 10.0), 6) AS confidence,
        |  dim, centroid_norm
        |FROM agg a JOIN norms USING (user_id) ORDER BY user_id""".stripMargin,

    "c14_core_facts" ->
      """WITH mem AS (
        |  SELECT event_id AS mem_id,
        |    CASE WHEN user_id % 4 <> 0 THEN 'u' || user_id END AS user_id,
        |    CASE WHEN event_type = 'click' THEN 'user_interaction' ELSE 'note' END AS typ,
        |    CASE WHEN event_type = 'signup' THEN 'episodic' ELSE 'semantic' END AS layer,
        |    event_id % 7 = 0 AS archived,
        |    event_id % 11 = 0 AS processed,
        |    CASE WHEN event_id % 3 = 0 THEN '' ELSE 'c' || event_id END AS content,
        |    CASE WHEN event_id % 6 = 0 THEN 't' || event_id ELSE '' END AS text,
        |    CASE WHEN event_id % 9 = 0 THEN '' ELSE 's' || event_id END AS summary,
        |    '' AS description
        |  FROM events),
        |cand AS (
        |  SELECT * FROM mem
        |  WHERE (typ = 'user_interaction' OR layer = 'episodic')
        |    AND NOT archived AND NOT processed
        |  ORDER BY mem_id LIMIT 50),
        |resolved AS (
        |  SELECT mem_id, user_id,
        |    coalesce(nullif(content, ''), nullif(text, ''),
        |             nullif(summary, ''), nullif(description, '')) AS body
        |  FROM cand)
        |SELECT group_id, CAST(count(*) AS BIGINT) AS n_inputs,
        |  CAST(min(mem_id) AS BIGINT) AS first_mem,
        |  0.85 AS confidence, TRUE AS pinned
        |FROM (
        |  SELECT CASE WHEN user_id IS NOT NULL THEN 'user:' || user_id
        |              ELSE 'solo:' || mem_id END AS group_id, mem_id
        |  FROM resolved WHERE body IS NOT NULL)
        |GROUP BY group_id ORDER BY group_id""".stripMargin,

    "c15_knowledge_evolution" -> {
      val t = GraphQueries.T0
      s"""WITH ${GraphQueries.edgeViewSql},
         |sym AS (
         |  SELECT src AS f, dst AS t, created_at, deleted_at FROM edges
         |  UNION ALL
         |  SELECT dst, src, created_at, deleted_at FROM edges),
         |roots AS (
         |  SELECT dst AS root, CAST(count(*) AS BIGINT) AS in_degree
         |  FROM edges
         |  WHERE dst LIKE 'supp:%' AND created_at <= $t
         |    AND (deleted_at IS NULL OR deleted_at > $t)
         |  GROUP BY dst HAVING count(*) >= 15
         |  ORDER BY in_degree DESC, root LIMIT 3),
         |tsdim AS (
         |  SELECT 'past' AS snap, $t - 30 * 86400 AS tt
         |  UNION ALL SELECT 'mid', $t - 15 * 86400
         |  UNION ALL SELECT 'now', $t - 86400),
         |rt AS (SELECT * FROM roots CROSS JOIN tsdim),
         |h1 AS (
         |  SELECT rt.root, rt.snap, rt.tt, s.t AS n FROM rt
         |  JOIN sym s ON s.f = rt.root AND s.created_at <= rt.tt
         |    AND (s.deleted_at IS NULL OR s.deleted_at > rt.tt)),
         |h2 AS (
         |  SELECT h1.root, h1.snap, h1.tt, s.t AS n FROM h1
         |  JOIN sym s ON s.f = h1.n AND s.created_at <= h1.tt
         |    AND (s.deleted_at IS NULL OR s.deleted_at > h1.tt)),
         |members AS (
         |  SELECT DISTINCT root, snap, n FROM (
         |    SELECT root, snap, n FROM h1
         |    UNION ALL SELECT root, snap, n FROM h2)
         |  WHERE n <> root),
         |cnt AS (
         |  SELECT root, snap, CAST(count(*) AS BIGINT) AS n_connected
         |  FROM members GROUP BY root, snap)
         |SELECT rt.root, rt.snap, r.in_degree,
         |  CAST(coalesce(cnt.n_connected, 0) AS BIGINT) AS n_connected,
         |  round(least(1.0, r.in_degree / 20.0), 6) AS confidence
         |FROM rt JOIN roots r USING (root)
         |LEFT JOIN cnt ON cnt.root = rt.root AND cnt.snap = rt.snap
         |ORDER BY 1, 2""".stripMargin
    },

    "c11_profiles" ->
      s"""WITH $mentionsSql,
         |inter AS (SELECT entity AS user_id, content FROM mentions WHERE entity < 30),
         |agg AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_interactions,
         |    max(CASE WHEN content LIKE '%breve%' OR content LIKE '%conciso%'
         |             OR content LIKE '%short%' OR content LIKE '%sintetico%'
         |        THEN 1 ELSE 0 END) AS k_short,
         |    max(CASE WHEN content LIKE '%lungo%' OR content LIKE '%verbose%'
         |             OR content LIKE '%long%' OR content LIKE '%dettagliato%'
         |        THEN 1 ELSE 0 END) AS k_long,
         |    max(CASE WHEN content LIKE '%medio%' OR content LIKE '%medium%'
         |        THEN 1 ELSE 0 END) AS k_medium,
         |    max(CASE WHEN content LIKE '%italiano%' OR content LIKE '%italian%'
         |        THEN 1 ELSE 0 END) AS k_it,
         |    max(CASE WHEN content LIKE '%english%' THEN 1 ELSE 0 END) AS k_en,
         |    max(CASE WHEN content LIKE '%tecnico%' OR content LIKE '%technical%'
         |        THEN 1 ELSE 0 END) AS k_tech,
         |    max(CASE WHEN content LIKE '%verbose%' OR content LIKE '%dettagliato%'
         |             OR content LIKE '%lungo%' THEN 1 ELSE 0 END) AS k_verbose,
         |    max(CASE WHEN content LIKE '%conciso%' OR content LIKE '%breve%'
         |             OR content LIKE '%sintetico%' THEN 1 ELSE 0 END) AS k_concise,
         |    max(CASE WHEN content LIKE '%rust%' THEN 1 ELSE 0 END) AS k_rust,
         |    max(CASE WHEN content LIKE '%python%' THEN 1 ELSE 0 END) AS k_python
         |  FROM inter GROUP BY user_id)
         |SELECT user_id, n_interactions,
         |  round(least(1.0, n_interactions / 50.0), 6) AS confidence,
         |  CASE WHEN k_short = 1 THEN 'short' WHEN k_long = 1 THEN 'long'
         |       WHEN k_medium = 1 THEN 'medium' END AS response_length,
         |  CASE WHEN k_it = 1 THEN 'it' WHEN k_en = 1 THEN 'en' END AS language,
         |  CASE WHEN k_tech = 1 THEN 'technical' WHEN k_verbose = 1 THEN 'verbose'
         |       WHEN k_concise = 1 THEN 'concise' END AS style,
         |  k_rust = 1 AS knows_rust, k_python = 1 AS knows_python
         |FROM agg ORDER BY user_id""".stripMargin
  )
}
