package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.memory.MemoryOps
import graft.search.{Decay, Fusion}

/** M3 queries: hybrid fusion, time-decay models, reinforcement.
  *
  * A synthetic "memory index" view is derived deterministically from
  * `documents ⋈ embeddings` (doc_id = vec_id) so decay metadata is
  * reproducible in the DuckDB oracle:
  *   _created_at    = 2024-01-01 + doc_id hours (unix secs)
  *   _last_accessed = _created_at + (doc_id % 5) days
  *   _pinned        = doc_id % 13 == 0
  *   memory_layer   = [episodic, semantic, procedural][doc_id % 3]
  *   _decay_model   = [exponential, linear, step, ebbinghaus][doc_id % 4]
  *   _access_count  = doc_id % 7
  *   now            = 2024-02-01 (1706745600)
  */
object FusionQueries {

  val Now = 1706745600L // 2024-02-01T00:00:00Z
  val Base = 1704067200L // 2024-01-01T00:00:00Z

  val memCfg = Decay.MemoryConfig(
    enabled = true,
    halfLifeSeconds = 604800.0,
    model = "exponential",
    layers = Map("episodic" -> 604800.0, "semantic" -> 2592000.0, "procedural" -> 0.0))

  /** The synthetic memory table (Spark side). */
  def memoryView(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(
        col("doc_id"), col("text"), col("embedding"),
        (lit(Base) + col("doc_id") * 3600).cast("double").as("_created_at"),
        (lit(Base) + col("doc_id") * 3600 + (col("doc_id") % 5) * 86400)
          .cast("double").as("_last_accessed"),
        (col("doc_id") % 13 === 0).as("_pinned"),
        element_at(array(lit("episodic"), lit("semantic"), lit("procedural")),
          (col("doc_id") % 3 + 1).cast("int")).as("memory_layer"),
        element_at(array(lit("exponential"), lit("linear"), lit("step"), lit("ebbinghaus")),
          (col("doc_id") % 4 + 1).cast("int")).as("_decay_model"),
        (col("doc_id") % 7).cast("double").as("_access_count"))
  }

  /** Shared SQL for the synthetic metadata (DuckDB side). */
  private[queries] val memViewSql =
    s"""mem AS (
       |  SELECT d.doc_id, d.text, e.embedding,
       |    CAST($Base + d.doc_id * 3600 AS DOUBLE) AS created_at,
       |    CAST($Base + d.doc_id * 3600 + (d.doc_id % 5) * 86400 AS DOUBLE) AS last_accessed,
       |    d.doc_id % 13 = 0 AS pinned,
       |    ['episodic','semantic','procedural'][CAST(d.doc_id % 3 AS INT) + 1] AS layer,
       |    ['exponential','linear','step','ebbinghaus'][CAST(d.doc_id % 4 AS INT) + 1] AS model,
       |    CAST(d.doc_id % 7 AS DOUBLE) AS access_count
       |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
       |)""".stripMargin

  /** Decay factor SQL replicating search_utils.go:91-146 + ops.go:1099-1186. */
  private[queries] val decaySql =
    s"""CASE WHEN pinned THEN 1.0
       |     WHEN greatest(created_at, last_accessed) <= 0 THEN 1.0
       |     WHEN layer = 'procedural' THEN 1.0
       |     ELSE (
       |       CASE WHEN ($Now - greatest(created_at, last_accessed)) <= 0 THEN 1.0
       |            ELSE (
       |              CASE model
       |                WHEN 'linear' THEN greatest(0.0, 1.0 - ($Now - greatest(created_at, last_accessed)) / hl)
       |                WHEN 'step' THEN CASE WHEN ($Now - greatest(created_at, last_accessed)) < hl THEN 1.0 ELSE 0.0 END
       |                WHEN 'ebbinghaus' THEN exp(-($Now - greatest(created_at, last_accessed)) / (hl * (1.0 + ln(1.0 + access_count))))
       |                ELSE pow(2.0, -($Now - greatest(created_at, last_accessed)) / hl)
       |              END)
       |       END)
       |END""".stripMargin

  private[queries] val hlSql =
    "CASE layer WHEN 'semantic' THEN 2592000.0 ELSE 604800.0 END"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // H3: all four decay models + pinning + per-layer half-life.
    "h3_decay_models" -> ((s, dir) => {
      val mem = memoryView(s, dir)
      mem.select(col("doc_id"),
          round(Decay.factor(memCfg, lit(Now.toDouble),
            col("_created_at"), col("_last_accessed"), col("_pinned"),
            col("memory_layer"), col("_decay_model"), col("_access_count")), 6)
            .as("decay"))
        .orderBy(col("doc_id"))
    }),

    // H1: full hybrid fusion — vector top-k (1/(1+d)) ⨝ max-normalized BM25,
    // alpha-weighted, decay-multiplied, top-k.
    "h1_fusion_hybrid" -> ((s, dir) => {
      val mem = memoryView(s, dir)
      val qdf = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Fusion.searchWithFusionDF(
          mem, "doc_id", "embedding", "text",
          Some(qdf), "table merge query",
          Fusion.FusionParams(alpha = 0.6, k = 15, metric = "cosine",
            memory = memCfg, now = Now, wide = true))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .transform(Ordered.small(_)(col("score").desc, col("doc_id"))) // k rows
    }),

    // H1-stored: same fusion, text branch served from the materialized
    // token-clustered postings of the memory view — shares h1's oracle.
    "h1_fusion_stored" -> ((s, dir) => {
      val mem = memoryView(s, dir)
      val post = Layouts.stored(s, dir, "postings_mem") {
        graft.text.Bm25.postings(memoryView(s, dir), "doc_id", "text")
          .repartition(col("token"))
      }
      val qdf = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Fusion.searchWithFusionDF(
          mem, "doc_id", "embedding", "text",
          Some(qdf), "table merge query",
          Fusion.FusionParams(alpha = 0.6, k = 15, metric = "cosine",
            memory = memCfg, now = Now, wide = true),
          prebuiltPostings = Some(post))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .transform(Ordered.small(_)(col("score").desc, col("doc_id"))) // k rows
    }),

    // H1-IVF: the 100 TB hybrid shape — the vector branch rides the IVF
    // index (same deterministic sampled-centroid protocol as v1) instead of
    // rescanning the corpus; text branch + fusion + decay identical to h1.
    // The oracle replicates probe pruning, so fused scores prove the
    // index-served candidates are exactly the probed buckets' top-k.
    "h1_fusion_ivf" -> ((s, dir) => {
      import graft.search.Ivf
      val mem = memoryView(s, dir)
      val emb = Tables.embeddings(s, dir)
      val cents = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").cast("long").as("cid"), col("embedding").as("cvec"))
      // Deployment shape: the assignment is the stored bucket-partitioned
      // layout (built once, like v1_ivf_stored) — per-query cost is probe +
      // fuse, not index rebuild.
      val assigned = Layouts.stored(s, dir, "ivf_mem_assigned", Seq("bucket")) {
        Ivf.assign(
          mem.select(col("doc_id").cast("long").as("id"),
            col("embedding").as("vector")),
          cents, "id", "vector")
      }.select(col("id"), col("vector"), col("bucket").cast("long").as("bucket"))
      val q = emb.filter(col("vec_id") === 0)
        .select(lit(0L).as("qid"), col("embedding").as("qvec"))
      val vecTop = Ivf.search(assigned, cents, q, k = 15, nProbe = 2)
        .select(col("id").as("doc_id"), col("distance"))
      Fusion.searchWithFusionDF(
          mem, "doc_id", "embedding", "text",
          None, "table merge query",
          Fusion.FusionParams(alpha = 0.6, k = 15, metric = "cosine",
            memory = memCfg, now = Now, wide = true),
          prebuiltVecTopK = Some(vecTop))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .transform(Ordered.small(_)(col("score").desc, col("doc_id"))) // k rows
    }),

    // H1-batch: MANY hybrid queries in ONE plan (the serving shape — one
    // corpus scan for the text branch, one broadcast+partial-top-k pass for
    // the vector branch, all ranking windows qid-partitioned). Per-query
    // semantics identical to h1; the oracle is h1's SQL with every global
    // window turned into a PARTITION BY qid window.
    "h1_fusion_batch" -> ((s, dir) => {
      val mem = memoryView(s, dir)
      val qs = Tables.embeddings(s, dir).filter(col("vec_id") < BatchTexts.size)
        .select(col("vec_id").cast("long").as("qid"),
          col("embedding").as("qvec"),
          element_at(array(BatchTexts.map(lit): _*),
            (col("vec_id") + 1).cast("int")).as("qtext"))
      Fusion.searchWithFusionBatch(
          mem, "doc_id", "embedding", "text", qs,
          Fusion.FusionParams(alpha = 0.6, k = 15, metric = "cosine",
            memory = memCfg, now = Now, wide = true))
        .select(col("qid"), col("doc_id"), round(col("score"), 6).as("score"))
        .transform(Ordered.small(_)( // nq x k rows
          col("qid"), col("score").desc, col("doc_id")))
    }),

    // H4: reinforcement — bump _last_accessed/_access_count for a hit set.
    "h4_reinforce" -> ((s, dir) => {
      val mem = memoryView(s, dir)
      MemoryOps.reinforce(mem, "doc_id", col("doc_id") % 50 === 0, Now.toDouble)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("_last_accessed"), col("_access_count"))
        .orderBy(col("doc_id"))
    })
  )

  /** The h1_fusion_batch query texts (qid = index). Vocabulary drawn from
    * the synthetic corpus; the last one repeats a token to exercise
    * multiply-counted query terms.
    */
  private[queries] val BatchTexts = Seq(
    "table merge query",
    "fast hash join order",
    "window agg stream",
    "vector scan filter",
    "sort batch spark data",
    "customer line part value",
    "slow group key column",
    "big small row scan scan")

  /** `(qid, token, qn)` VALUES rows for the batch oracle, generated with the
    * SAME analyzer the Spark plan uses — oracle and engine can't drift.
    */
  private lazy val batchQtValues: String = BatchTexts.zipWithIndex.flatMap {
    case (t, qi) =>
      graft.text.Analyzer.analyze(t).groupBy(identity).toSeq.sortBy(_._1).map {
        case (tok, xs) => s"($qi, '$tok', ${xs.size})"
      }
  }.mkString(", ")

  private def bm25Cte: String = TextQueries.analyzedOn("mem")

  private lazy val h1Sql =
    s"""WITH $memViewSql,
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |vec AS (
       |  SELECT doc_id,
       |    1.0 - list_cosine_similarity(CAST(m.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS d
       |  FROM mem m CROSS JOIN q
       |),
       |vtopk AS (
       |  SELECT doc_id, 1.0 / (1.0 + d) AS vscore
       |  FROM (SELECT doc_id, d, row_number() OVER (ORDER BY d, doc_id) AS rn FROM vec)
       |  WHERE rn <= 15
       |),
       |${bm25Cte},
       |doclens AS (
       |  SELECT m.doc_id, count(a.token) AS dl
       |  FROM mem m LEFT JOIN analyzed a USING (doc_id) GROUP BY m.doc_id
       |),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM doclens),
       |postings AS (SELECT doc_id, token, count(*) AS tf FROM analyzed GROUP BY 1, 2),
       |qt AS (SELECT * FROM (VALUES ('tabl', 1), ('merg', 1), ('queri', 1)) AS t(token, qn)),
       |dfreq AS (
       |  SELECT p.token, count(*) AS df FROM postings p
       |  JOIN (SELECT DISTINCT token FROM qt) x USING (token) GROUP BY p.token
       |),
       |bm25 AS (
       |  SELECT p.doc_id,
       |    sum(qt.qn * ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) *
       |        (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS raw
       |  FROM postings p JOIN qt USING (token) JOIN dfreq f USING (token)
       |  JOIN doclens d USING (doc_id) CROSS JOIN stats s GROUP BY p.doc_id
       |),
       |tnorm AS (SELECT doc_id, raw / max(raw) OVER () AS tscore FROM bm25),
       |fused AS (
       |  SELECT coalesce(v.doc_id, t.doc_id) AS doc_id,
       |    0.6 * coalesce(v.vscore, 0) + 0.4 * coalesce(t.tscore, 0) AS fscore
       |  FROM vtopk v FULL OUTER JOIN tnorm t ON v.doc_id = t.doc_id
       |),
       |decayed AS (
       |  SELECT f.doc_id, f.fscore * $decaySql AS score
       |  FROM fused f JOIN (SELECT *, $hlSql AS hl FROM mem) USING (doc_id)
       |)
       |SELECT doc_id, round(score, 6) AS score FROM decayed
       |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin

  /** h1 with the vector branch served by the v1 IVF protocol (sampled
    * centroids, argmin assignment, nProbe=2 pruning) instead of a full
    * scan.
    */
  private lazy val h1IvfSql =
    s"""WITH $memViewSql,
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |cents AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 100 = 0),
       |vassigned AS (
       |  SELECT doc_id, cid AS bucket FROM (
       |    SELECT m.doc_id, c.cid,
       |      row_number() OVER (PARTITION BY m.doc_id
       |        ORDER BY 1.0 - list_cosine_similarity(CAST(m.embedding AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])), c.cid) AS rn
       |    FROM mem m CROSS JOIN cents c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT cid AS bucket FROM (
       |    SELECT c.cid,
       |      row_number() OVER (
       |        ORDER BY 1.0 - list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])), c.cid) AS rn
       |    FROM q CROSS JOIN cents c)
       |  WHERE rn <= 2),
       |vec AS (
       |  SELECT m.doc_id,
       |    1.0 - list_cosine_similarity(CAST(m.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS d
       |  FROM mem m
       |  JOIN vassigned a USING (doc_id)
       |  JOIN probes p ON a.bucket = p.bucket
       |  CROSS JOIN q
       |),
       |vtopk AS (
       |  SELECT doc_id, 1.0 / (1.0 + d) AS vscore
       |  FROM (SELECT doc_id, d, row_number() OVER (ORDER BY d, doc_id) AS rn FROM vec)
       |  WHERE rn <= 15
       |),
       |${bm25Cte},
       |doclens AS (
       |  SELECT m.doc_id, count(a.token) AS dl
       |  FROM mem m LEFT JOIN analyzed a USING (doc_id) GROUP BY m.doc_id
       |),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM doclens),
       |postings AS (SELECT doc_id, token, count(*) AS tf FROM analyzed GROUP BY 1, 2),
       |qt AS (SELECT * FROM (VALUES ('tabl', 1), ('merg', 1), ('queri', 1)) AS t(token, qn)),
       |dfreq AS (
       |  SELECT p.token, count(*) AS df FROM postings p
       |  JOIN (SELECT DISTINCT token FROM qt) x USING (token) GROUP BY p.token
       |),
       |bm25 AS (
       |  SELECT p.doc_id,
       |    sum(qt.qn * ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) *
       |        (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS raw
       |  FROM postings p JOIN qt USING (token) JOIN dfreq f USING (token)
       |  JOIN doclens d USING (doc_id) CROSS JOIN stats s GROUP BY p.doc_id
       |),
       |tnorm AS (SELECT doc_id, raw / max(raw) OVER () AS tscore FROM bm25),
       |fused AS (
       |  SELECT coalesce(v.doc_id, t.doc_id) AS doc_id,
       |    0.6 * coalesce(v.vscore, 0) + 0.4 * coalesce(t.tscore, 0) AS fscore
       |  FROM vtopk v FULL OUTER JOIN tnorm t ON v.doc_id = t.doc_id
       |),
       |decayed AS (
       |  SELECT f.doc_id, f.fscore * $decaySql AS score
       |  FROM fused f JOIN (SELECT *, $hlSql AS hl FROM mem) USING (doc_id)
       |)
       |SELECT doc_id, round(score, 6) AS score FROM decayed
       |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin

  /** h1 per-qid: every global window becomes PARTITION BY qid. */
  private lazy val h1BatchSql =
    s"""WITH $memViewSql,
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |       WHERE vec_id < ${BatchTexts.size}),
       |vec AS (
       |  SELECT q.qid, m.doc_id,
       |    1.0 - list_cosine_similarity(CAST(m.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS d
       |  FROM mem m CROSS JOIN qs q
       |),
       |vtopk AS (
       |  SELECT qid, doc_id, 1.0 / (1.0 + d) AS vscore
       |  FROM (SELECT qid, doc_id, d,
       |          row_number() OVER (PARTITION BY qid ORDER BY d, doc_id) AS rn FROM vec)
       |  WHERE rn <= 15
       |),
       |${bm25Cte},
       |doclens AS (
       |  SELECT m.doc_id, count(a.token) AS dl
       |  FROM mem m LEFT JOIN analyzed a USING (doc_id) GROUP BY m.doc_id
       |),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM doclens),
       |postings AS (SELECT doc_id, token, count(*) AS tf FROM analyzed GROUP BY 1, 2),
       |qt AS (SELECT CAST(qid AS BIGINT) AS qid, token, qn
       |       FROM (VALUES $batchQtValues) AS t(qid, token, qn)),
       |dfreq AS (
       |  SELECT p.token, count(*) AS df FROM postings p
       |  JOIN (SELECT DISTINCT token FROM qt) x USING (token) GROUP BY p.token
       |),
       |bm25 AS (
       |  SELECT qt.qid, p.doc_id,
       |    sum(qt.qn * ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) *
       |        (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS raw
       |  FROM postings p JOIN qt USING (token) JOIN dfreq f USING (token)
       |  JOIN doclens d USING (doc_id) CROSS JOIN stats s GROUP BY qt.qid, p.doc_id
       |),
       |tnorm AS (SELECT qid, doc_id, raw / max(raw) OVER (PARTITION BY qid) AS tscore FROM bm25),
       |fused AS (
       |  SELECT coalesce(v.qid, t.qid) AS qid, coalesce(v.doc_id, t.doc_id) AS doc_id,
       |    0.6 * coalesce(v.vscore, 0) + 0.4 * coalesce(t.tscore, 0) AS fscore
       |  FROM vtopk v FULL OUTER JOIN tnorm t ON v.qid = t.qid AND v.doc_id = t.doc_id
       |),
       |decayed AS (
       |  SELECT f.qid, f.doc_id, f.fscore * $decaySql AS score
       |  FROM fused f JOIN (SELECT *, $hlSql AS hl FROM mem) USING (doc_id)
       |),
       |ranked AS (
       |  SELECT qid, doc_id, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
       |  FROM decayed
       |)
       |SELECT qid, doc_id, round(score, 6) AS score FROM ranked WHERE rn <= 15
       |ORDER BY qid, score DESC, doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "h3_decay_models" ->
      s"""WITH $memViewSql,
         |hl_t AS (SELECT *, $hlSql AS hl FROM mem)
         |SELECT doc_id, round($decaySql, 6) AS decay FROM hl_t ORDER BY doc_id""".stripMargin,

    "h1_fusion_hybrid" -> h1Sql,

    // Identical results by construction — the stored layout is lossless.
    "h1_fusion_stored" -> h1Sql,

    "h1_fusion_ivf" -> h1IvfSql,

    "h1_fusion_batch" -> h1BatchSql,

    "h4_reinforce" ->
      s"""WITH $memViewSql
         |SELECT doc_id,
         |  CASE WHEN doc_id % 50 = 0 THEN CAST($Now AS DOUBLE) ELSE last_accessed END AS "_last_accessed",
         |  CASE WHEN doc_id % 50 = 0 THEN access_count + 1 ELSE access_count END AS "_access_count"
         |FROM mem WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin
  )
}
