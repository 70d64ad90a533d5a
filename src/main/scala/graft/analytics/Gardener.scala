package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Background cognitive analytics ("Gardener") — the reference's periodic
  * OLAP workload (`pkg/cognitive/gardener.go`), re-expressed as Spark batch
  * aggregations. The reference cursor-pages 100-500 nodes per cycle and
  * point-reads edges per node; here each detector is ONE grouped aggregation
  * over the mentions/edge view — the shape that actually scales (a single
  * shuffle on the entity key, partial aggregation map-side).
  *
  * All detectors take `now` as a parameter (never the wall clock) so runs
  * are deterministic and replayable — SURVEY §7.4 risk 5.
  */
object Gardener {

  /** Sentiment lexicon (`sentiment_lexicon.go`): ±1 per word CONTAINED in
    * the content (substring semantics, not token match — faithful to
    * `strings.Contains` in `detectSentimentShifts`, gardener.go:2607-2616).
    */
  final case class Lexicon(positive: Seq[String], negative: Seq[String])
  val DefaultLexicon: Lexicon = Lexicon(
    positive = Seq("good", "great", "love", "win"),
    negative = Seq("bad", "fail", "awful"))

  def sentimentScore(content: Column, lex: Lexicon = DefaultLexicon): Column = {
    val c = lower(content)
    val pos = lex.positive.map(w => when(c.contains(w), 1.0).otherwise(0.0)).reduce(_ + _)
    val neg = lex.negative.map(w => when(c.contains(w), 1.0).otherwise(0.0)).reduce(_ + _)
    pos - neg
  }

  /** C4 — importance shifts (`detectImportanceShifts`, gardener.go:1471-1542):
    * entities with ≥ minTotal incoming mentions; spike when recent-window
    * mentions exceed minRecent AND double all prior history. Confidence
    * min(1, recent/10) for spiking entities.
    * `mentions`: (entity, created_at).
    */
  def importanceShifts(
      mentions: DataFrame,
      now: Long,
      recentSecs: Long = 3L * 86400,
      minTotal: Long = 5,
      minRecent: Long = 5,
      ratio: Double = 2.0): DataFrame = {
    val cutoff = now - recentSecs
    mentions.groupBy(col("entity"))
      .agg(
        sum(when(col("created_at") > cutoff, 1L).otherwise(0L)).as("recent"),
        sum(when(col("created_at") <= cutoff, 1L).otherwise(0L)).as("old"))
      .filter(col("recent") + col("old") >= minTotal)
      .withColumn("spike",
        col("recent") > minRecent && col("recent") > col("old") * ratio)
      .withColumn("confidence",
        when(col("spike"), least(lit(1.0), col("recent") / 10.0)))
  }

  /** C5 — sentiment shifts (gardener.go:2568-2676): per entity, average
    * lexicon sentiment of mentioning contents in the recent window vs all
    * before; shift when |Δ| ≥ threshold with evidence on both sides.
    * `mentions`: (entity, created_at, content).
    */
  def sentimentShifts(
      mentions: DataFrame,
      now: Long,
      lex: Lexicon = DefaultLexicon,
      windowSecs: Long = 14L * 86400,
      minTotal: Long = 4,
      threshold: Double = 1.5): DataFrame = {
    val cutoff = now - windowSecs
    val scored = mentions.withColumn("s", sentimentScore(col("content"), lex))
    scored.groupBy(col("entity"))
      .agg(
        sum(when(col("created_at") < cutoff, 1L).otherwise(0L)).as("past_n"),
        sum(when(col("created_at") >= cutoff, 1L).otherwise(0L)).as("recent_n"),
        avg(when(col("created_at") < cutoff, col("s"))).as("avg_past"),
        avg(when(col("created_at") >= cutoff, col("s"))).as("avg_recent"))
      .filter(col("past_n") + col("recent_n") >= minTotal)
      .withColumn("delta", col("avg_recent") - col("avg_past"))
      .withColumn("shifted",
        col("past_n") > 0 && col("recent_n") > 0 && abs(col("delta")) >= threshold)
      .withColumn("direction",
        when(!col("shifted"), lit(null).cast("string"))
          .when(col("delta") < 0, "negative").otherwise("positive"))
      .withColumn("confidence",
        when(col("shifted"), least(lit(1.0), (abs(col("delta")) / 3.0) *
          least(lit(1.0), (col("past_n") + col("recent_n")) / 8.0))))
  }

  /** C6 — centrality shifts (gardener.go:2677-2754): degree now vs degree
    * as-of `pastTs` (time-travel count on the append-only edge view); flag
    * when degree more than `factor`-tripled from a nonzero base.
    * `edges`: (node, created_at, deleted_at) — pre-exploded to one row per
    * (edge, endpoint) so in+out degree is one count.
    */
  def centralityShifts(
      edges: DataFrame,
      now: Long,
      pastTs: Long,
      minDegree: Long = 10,
      factor: Double = 3.0): DataFrame = {
    def activeAt(t: Long): Column =
      col("created_at") <= t &&
        (col("deleted_at").isNull || col("deleted_at") > t)
    edges.groupBy(col("node"))
      .agg(
        sum(when(activeAt(now), 1L).otherwise(0L)).as("deg_now"),
        sum(when(activeAt(pastTs), 1L).otherwise(0L)).as("deg_past"))
      .filter(col("deg_now") >= minDegree)
      .withColumn("shifted",
        col("deg_past") > 0 && col("deg_now") > col("deg_past") * factor)
      .withColumn("confidence",
        when(col("shifted"),
          least(lit(1.0), col("deg_now") / col("deg_past") / 5.0)))
  }

  /** C7 — forgetting patterns (gardener.go:2755-2817): historically
    * significant entities (≥ minMentions) with zero mentions in the idle
    * window. Confidence min(1, total/10).
    * `mentions`: (entity, created_at).
    */
  def forgettingPatterns(
      mentions: DataFrame,
      now: Long,
      idleSecs: Long = 30L * 86400,
      minMentions: Long = 5): DataFrame =
    mentions.groupBy(col("entity"))
      .agg(count(lit(1)).as("total"), max(col("created_at")).as("last_mention"))
      .filter(col("total") >= minMentions)
      .withColumn("forgotten", col("last_mention") <= now - idleSecs)
      .withColumn("confidence",
        when(col("forgotten"), least(lit(1.0), col("total") / 10.0)))

  /** C9 (deterministic core) — repeated failures
    * (`detectRepeatedFailures`, gardener.go:2818-2870): failed agent
    * actions in the recent window, grouped by action key; ≥ minFailures of
    * the same action is a pattern (the LLM diagnosis step is stubbed —
    * graft.llm.LlmClient).
    * `failures`: (action, created_at).
    */
  def repeatedFailures(
      failures: DataFrame,
      now: Long,
      windowSecs: Long = 24L * 3600,
      minFailures: Long = 3): DataFrame =
    failures
      .filter(col("created_at") >= now - windowSecs)
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_failures"),
        max(col("created_at")).as("last_failure"))
      .filter(col("n_failures") >= minFailures)

  /** Meta-node types the contradiction detector must never scan — avoids
    * circular contradictions between derived nodes and wasted LLM calls
    * (`detectContradictions`, gardener.go:1331-1337; the list grew to four
    * types in the reference's 0.5.2 "meta-node contradiction loop
    * prevention" fix).
    */
  val ContradictionMetaTypes: Seq[String] =
    Seq("reflection", "consolidated_memory", "consolidated_belief",
      "evolved_memory")

  /** C8 candidate generation — the full deterministic scaffolding in front
    * of the contradiction-judge LLM (`detectContradictions`,
    * gardener.go:1310-1371): per scanned node of the current cursor page,
    * its top-`k` semantic neighbors kept only in the similarity band
    * [`lo`, `hi`] (similar topic, but not the same text), skipping
    * empty-content and meta-type nodes, the node itself, and pairs already
    * analyzed in a previous cycle (an `analyzed_against` edge from the
    * scanned node).
    *
    * Scale shape = the reference's own serving shape: the page is a small
    * batch (50 ids per cycle) BROADCAST against the corpus through
    * [[graft.search.VectorSearch.topKBatch]]'s bounded top-k aggregate —
    * the corpus is scanned once per cycle, never shuffled, never joined
    * all-pairs. `analyzed` stays a keyed anti-join: at 100 TB the edge
    * set is a table, not a driver set.
    *
    * Neighbor-side skips mirror the reference's loop exactly: meta-type
    * and MISSING-content neighbors are dropped AFTER the top-k selection
    * (they still occupy ranking slots — `detectContradictions` skips them
    * per-neighbor at prompt time, not before the search), and an
    * empty-but-present content string is only fatal on the SCANNED side
    * (`contentA == ""` is checked, contentB is not — :1327, :1372-1380).
    *
    * `mem`: (mem_id, embedding, typ, content); `page`: (mem_id) — the
    * cursor batch; `analyzed`: (src, dst) directed analyzed_against edges.
    * Output: (src_mem, dst_mem, sim) — exactly the pairs the judge LLM
    * would receive ([[graft.llm.LlmFrames.contradictionFrames]] formats
    * the c8 sentiment seam; this is the similarity seam).
    *
    * DOCUMENTED DEVIATION: the [lo, hi] band is applied to the
    * 6-decimal-ROUNDED similarity, where the reference checks the raw
    * score (`gardener.go:1343` skips on `neighbor.Score > 0.95` before any
    * formatting). A pair whose raw sim is within 5e-7 of a boundary (e.g.
    * 0.9500004 → rounds to 0.95) can therefore differ. This is deliberate:
    * rounding before the cut makes the band decision identical across
    * engines (Spark vs the DuckDB oracle can disagree in the last ulp of a
    * raw float dot product, which would flip boundary pairs
    * nondeterministically), and the deviation's width is one rounding ulp.
    */
  def contradictionCandidates(
      mem: DataFrame,
      page: DataFrame,
      analyzed: DataFrame,
      k: Int = 5,
      lo: Double = 0.70,
      hi: Double = 0.95): DataFrame = {
    val scanned = mem.join(page.select(col("mem_id")), Seq("mem_id"))
      .filter(col("content").isNotNull && col("content") =!= "" &&
        !col("typ").isin(ContradictionMetaTypes: _*))
      .select(col("mem_id").as("qid"), col("embedding").as("qvec"))
    val neighborOk = mem
      .filter(col("content").isNotNull &&
        !col("typ").isin(ContradictionMetaTypes: _*))
      .select(col("mem_id").as("id"))
    graft.search.VectorSearch.topKBatch(
        mem.select(col("mem_id").as("id"), col("embedding").as("vector")),
        scanned, k = k, metric = "cosine", wide = true)
      .withColumn("sim", round(lit(1.0) - col("distance"), 6))
      .filter(col("id") =!= col("qid") && col("sim") >= lo && col("sim") <= hi)
      .join(neighborOk, Seq("id"))
      .join(analyzed.select(col("src").as("qid"), col("dst").as("id")),
        Seq("qid", "id"), "left_anti")
      .select(col("qid").as("src_mem"), col("id").as("dst_mem"), col("sim"))
  }

  /** C9 family — user-preference insight scaffolding
    * (`detectUserPreferences`, gardener.go:2430-2567). Deterministic
    * portion ported: the relevance filter (tags containing
    * user_interaction/observation AND non-empty content), the ≥2-source
    * floor, the elementwise-averaged source vector, confidence
    * min(1, n/10), and source_memory_count. The preference JSON itself is
    * LLM output (graft.llm.LlmClient) and stays behind the trait.
    *
    * Centroid = posexplode + per-(user, position) mean — two keyed
    * shuffles, map-side partials, no per-row UDF: the reference's
    * driver-side float loop over VGet results becomes a distributed
    * aggregation.
    * `mem`: (user_id, tags array<string>, content, embedding array<float>).
    */
  /** The C13 candidate filter, exposed as its own seam: these rows' contents
    * are exactly what the preference-synthesis LLM would see per user
    * (LlmFrameGoldenSpec pins them), and the centroid math below aggregates
    * the same set — one definition serves both.
    */
  def preferenceCandidates(mem: DataFrame): DataFrame =
    mem.filter(
      arrays_overlap(col("tags"),
        array(lit("user_interaction"), lit("observation"))) &&
        col("content").isNotNull && length(col("content")) > 0)

  def userPreferenceInsights(mem: DataFrame, minSources: Long = 2): DataFrame = {
    val relevant = preferenceCandidates(mem)
    // ONE corpus pass: the per-(user, position) aggregate carries both the
    // running mean and the row count, so n_sources falls out of the same
    // exchange that builds the centroid — no second scan of the memory
    // table. n_sources is the position-0 row count (= the number of
    // non-empty embeddings, exactly the rows contributing to the
    // centroid), NOT a per-position max — a ragged corpus can't skew it.
    relevant
      .select(col("user_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("user_id"), col("pos"))
      .agg(avg(col("v")).as("m"), count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(sqrt(sum(col("m") * col("m"))).as("centroid_norm"),
        count(lit(1)).as("dim"),
        max(when(col("pos") === 0, col("cnt"))).as("n_sources"))
      .filter(col("n_sources") >= minSources)
      .withColumn("confidence", least(lit(1.0), col("n_sources") / 10.0))
  }

  /** C9 family — core-fact extraction scaffolding (`detectCoreFacts`,
    * gardener.go:3694-3750 + `processCoreFactExtraction`). Deterministic
    * portion ported: the candidate filter
    * (type='user_interaction' OR memory_layer='episodic', not archived),
    * the VFilter page cap (lowest ids — the reference's cursor page made
    * deterministic), the already-processed exclusion (existing
    * extracted_from back-link), the content fallback chain
    * (content→text→summary→description, `gardener.go:3766-3780`), user
    * grouping with ungrouped items processed individually, and the
    * confidence floor (CoreFactMinConfidence default 0.85). The fact text
    * is LLM output (LlmClient).
    * `mem`: (mem_id, user_id nullable, typ, layer, archived, processed,
    *         content, text, summary, description).
    */
  /** The C14 candidate pipeline up to the LLM boundary, exposed as its own
    * seam: (group_id, mem_id, body) — the exact per-group bodies the fact-
    * extraction LLM would see (LlmFrameGoldenSpec pins them).
    * [[coreFactGroups]] aggregates the same rows.
    */
  def coreFactCandidates(mem: DataFrame, page: Int = 50,
                         extractedFrom: Option[DataFrame] = None): DataFrame = {
    // Already-processed exclusion: the reference checks for an existing
    // incoming `extracted_from` link (`gardener.go:3712-3717`) — when an
    // edge view is supplied, derive the exclusion as a left-anti join on
    // its target ids; the `processed` flag column is the precomputed form.
    val unprocessed = extractedFrom match {
      case Some(ef) => mem.join(
        ef.select(col("dst").as("mem_id")).distinct(),
        Seq("mem_id"), "left_anti")
      case None => mem.filter(!col("processed"))
    }
    unprocessed.filter(
        (col("typ") === "user_interaction" || col("layer") === "episodic") &&
          !col("archived"))
      .orderBy(col("mem_id")).limit(page)
      .withColumn("body", coalesce(
        Seq("content", "text", "summary", "description")
          .map(c => when(length(col(c)) > 0, col(c))): _*))
      .filter(col("body").isNotNull)
      .withColumn("group_id",
        when(col("user_id").isNotNull, concat(lit("user:"), col("user_id")))
          .otherwise(concat(lit("solo:"), col("mem_id"))))
      .select(col("group_id"), col("mem_id"), col("body"))
  }

  def coreFactGroups(mem: DataFrame, page: Int = 50,
                     minConfidence: Double = 0.85,
                     extractedFrom: Option[DataFrame] = None): DataFrame = {
    coreFactCandidates(mem, page, extractedFrom)
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_inputs"), min(col("mem_id")).as("first_mem"))
      .withColumn("confidence", lit(minConfidence))
      .withColumn("pinned", lit(true))
  }

  /** C9 family — knowledge-evolution snapshots (`detectKnowledgeEvolution`,
    * gardener.go:2977-3143). Deterministic portion ported: root selection
    * (entity nodes with in-degree ≥ minDegree, top `maxEntities` by degree
    * then id — the reference's 3-per-cycle cap made deterministic), three
    * time-travel depth-2 subgraph snapshots, per-snapshot connected-node
    * counts, confidence min(1, inDegree/20). The timeline narrative is LLM
    * output (LlmClient).
    *
    * Snapshots are SET-BASED — roots × timestamps broadcast against the
    * symmetric edge view, depth 2 = two keyed hash joins + distinct — not
    * 9 iterative per-root BFS jobs: one plan whose cost is two shuffles on
    * the edge key regardless of root count.
    * `edges`: (src, dst, created_at, deleted_at).
    */
  def knowledgeEvolution(
      edges: DataFrame,
      entityPred: Column => Column,
      now: Long,
      offsets: Seq[(String, Long)] =
        Seq(("past", 30L * 86400), ("mid", 15L * 86400), ("now", 86400L)),
      minDegree: Long = 15,
      maxEntities: Int = 3): DataFrame = {
    def activeAt(t: Column): Column =
      col("created_at") <= t &&
        (col("deleted_at").isNull || col("deleted_at") > t)
    val spark = edges.sparkSession
    import spark.implicits._
    // The selected roots are ≤ maxEntities rows by construction (the
    // reference's 3-per-cycle cap) — collect them once and continue from a
    // literal frame: the plan otherwise re-runs the whole degree
    // aggregation for every consumer (rootsTs, the final re-join), and a
    // 3-row local relation broadcasts for free.
    val rootRows = edges.filter(activeAt(lit(now)) && entityPred(col("dst")))
      .groupBy(col("dst").as("root")).agg(count(lit(1)).as("in_degree"))
      .filter(col("in_degree") >= minDegree)
      .orderBy(col("in_degree").desc, col("root")).limit(maxEntities)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val roots = rootRows.toDF("root", "in_degree")
    // Static prune (r19, guide §6/§2.3): every hop predicate demands
    // created_at <= ts and every ts is at most now - min(offset), so edges
    // newer than the latest snapshot can never join — drop them at the
    // scan, before the symmetric doubling and the h2 shuffle.
    val maxTs = now - offsets.map(_._2).min
    val sym = edges.filter(col("created_at") <= maxTs)
      .select(col("src").as("f"), col("dst").as("t"),
        col("created_at"), col("deleted_at"))
      .unionByName(edges.filter(col("created_at") <= maxTs)
        .select(col("dst").as("f"), col("src").as("t"),
          col("created_at"), col("deleted_at")))
    val tsdim = offsets.map { case (lbl, off) => (lbl, now - off) }
      .toDF("snap", "ts")
    val rootsTs = broadcast(roots.crossJoin(tsdim))
    def hopActive(a: String): Column =
      col(s"$a.created_at") <= col("ts") &&
        (col(s"$a.deleted_at").isNull || col(s"$a.deleted_at") > col("ts"))
    // h1 deduplicated per (root, snap, n) BEFORE the second hop (r19,
    // guide §3.3): parallel edges (one per lineitem on this view) would
    // otherwise multiply the h2 join fan-out edge-count × duplicate-count;
    // the final count is over DISTINCT neighbors anyway, so the dedup is
    // semantics-free and the h2 probe side shrinks to unique frontier
    // nodes. ts rides along (functionally determined by snap).
    val h1 = rootsTs.join(sym.alias("s1"),
        col("s1.f") === col("root") && hopActive("s1"))
      .select(col("root"), col("snap"), col("ts"), col("s1.t").as("n"))
      .distinct()
    val h2 = h1.join(sym.alias("s2"),
        col("s2.f") === col("n") && hopActive("s2"))
      .select(col("root"), col("snap"), col("ts"), col("s2.t").as("n"))
    val counts = h1.unionByName(h2)
      .filter(col("n") =!= col("root"))
      .select(col("root"), col("snap"), col("n")).distinct()
      .groupBy("root", "snap").agg(count(lit(1)).as("n_connected"))
    rootsTs.select("root", "snap", "in_degree")
      .join(counts, Seq("root", "snap"), "left")
      .withColumn("n_connected", coalesce(col("n_connected"), lit(0L)))
      .withColumn("confidence", least(lit(1.0), col("in_degree") / 20.0))
  }

  /** C9 family — cross-validator meta-detector (`detectCrossValidator`,
    * gardener.go:3145-3243): entities flagged by ≥2 distinct detector
    * types in a cycle get a high-confidence composite reflection whose
    * confidence is the geometric mean of the contributing confidences
    * scaled by a diversity boost 0.7 + 0.3·min(1, nDetectors/3), capped
    * at 1. Fully deterministic — one keyed aggregation over the flag
    * stream (geo-mean as exp∘avg∘ln, a map-side-partial aggregate; no
    * driver loop over reflections).
    * `flags`: (entity, detector, confidence).
    */
  def crossValidator(flags: DataFrame): DataFrame =
    flags.groupBy(col("entity"))
      .agg(
        count_distinct(col("detector")).as("detector_count"),
        count(lit(1)).as("n_sources"),
        exp(avg(log(col("confidence")))).as("geo_raw"),
        min(col("confidence")).as("min_conf"),
        concat_ws(",", array_sort(collect_set(col("detector"))))
          .as("detector_types"))
      // The reference MULTIPLIES confidences, so any non-positive factor
      // collapses the product; Spark's log returns NULL below 0 (dropped
      // from avg), so collapse explicitly instead of silently skipping.
      .withColumn("geo_mean",
        when(col("min_conf") <= 0, lit(0.0)).otherwise(col("geo_raw")))
      .drop("geo_raw", "min_conf")
      .filter(col("detector_count") >= 2)
      .withColumn("composite_confidence",
        least(lit(1.0), col("geo_mean") *
          (lit(0.7) + lit(0.3) *
            least(lit(1.0), col("detector_count") / 3.0))))

  /** C10 — session summarization, deterministic path
    * (`SummarizeSession` gardener.go:1563-1728 + the compiler's `computed`
    * fields, `deterministic.go:180`): per session — memory count, bounds,
    * duration minutes, dominant topic (ties broken alphabetically).
    * `mem`: (session_id, created_at, topic).
    */
  def sessionSummaries(mem: DataFrame): DataFrame = {
    val stats = mem.groupBy(col("session_id"))
      .agg(count(lit(1)).as("n_memories"),
        min(col("created_at")).as("start_ts"),
        max(col("created_at")).as("end_ts"))
      .withColumn("duration_minutes",
        (col("end_ts") - col("start_ts")) / 60.0)
    val topTopic = mem.groupBy(col("session_id"), col("topic")).count()
      .withColumn("rn", row_number().over(
        Window.partitionBy("session_id")
          .orderBy(col("count").desc, col("topic"))))
      .filter(col("rn") === 1)
      .select(col("session_id"), col("topic").as("top_topic"))
    stats.join(topTopic, Seq("session_id"))
  }

  /** C11 — deterministic user profiling
    * (`generateDeterministicProfileUpdate`, gardener.go:2078-2203):
    * interaction count → confidence min(1, n/50); preference extraction by
    * keyword containment over the user's interaction text, with the
    * reference's priority chains (short > long > medium, etc.).
    * `inter`: (user_id, content). Containment is evaluated per interaction
    * and OR-reduced — equivalent to the reference's joined-text Contains for
    * non-boundary-spanning keywords, without building giant strings.
    */
  def profiles(inter: DataFrame): DataFrame = {
    def anyContains(words: Seq[String]): Column =
      max(words.map(w => when(lower(col("content")).contains(w), 1).otherwise(0))
        .reduce(greatest(_, _)))
    inter.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_interactions"),
        anyContains(Seq("breve", "conciso", "short", "sintetico")).as("k_short"),
        anyContains(Seq("lungo", "verbose", "long", "dettagliato")).as("k_long"),
        anyContains(Seq("medio", "medium")).as("k_medium"),
        anyContains(Seq("italiano", "italian")).as("k_it"),
        anyContains(Seq("english")).as("k_en"),
        anyContains(Seq("tecnico", "technical")).as("k_tech"),
        anyContains(Seq("verbose", "dettagliato", "lungo")).as("k_verbose"),
        anyContains(Seq("conciso", "breve", "sintetico")).as("k_concise"),
        anyContains(Seq("rust")).as("k_rust"),
        anyContains(Seq("python")).as("k_python"))
      .select(
        col("user_id"), col("n_interactions"),
        least(lit(1.0), col("n_interactions") / 50.0).as("confidence"),
        when(col("k_short") === 1, "short")
          .when(col("k_long") === 1, "long")
          .when(col("k_medium") === 1, "medium").as("response_length"),
        when(col("k_it") === 1, "it")
          .when(col("k_en") === 1, "en").as("language"),
        when(col("k_tech") === 1, "technical")
          .when(col("k_verbose") === 1, "verbose")
          .when(col("k_concise") === 1, "concise").as("style"),
        (col("k_rust") === 1).as("knows_rust"),
        (col("k_python") === 1).as("knows_python"))
  }
}
