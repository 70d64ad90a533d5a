package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.VectorFunctions
import graft.rag.Rag

/** R1-R4, R6, R7 + S10 queries: RAG retrieval over documents ⋈ embeddings.
  *
  * Graph for adaptive expansion: doc v -cites-> v+3 for even v.
  * Token budget 120, chars-per-token 4 (reference defaults scaled down to
  * the synthetic corpus).
  */
object RagQueries {

  def ragView(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(col("doc_id"), col("text"), col("source"), col("embedding"))
  }

  /** R5 inputs — fixed conversational turn (any literal works; the stub and
    * oracle replay the same strings).
    */
  private val R5Query = "how do tables merge during a compaction query"
  private val R5History = "user asked about merge strategies"

  private val memSql =
    """mem AS (
      |  SELECT d.doc_id, d.text, d.source, e.embedding
      |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |)""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"1.0 - list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  /** Seeds: top-5 cosine for the vec_id=0 query vector, derived=1/(1+d). */
  private def seeds(s: SparkSession, dir: String): DataFrame = {
    val mem = ragView(s, dir)
    val q = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    mem.crossJoin(broadcast(q))
      .withColumn("d", lit(1.0) -
        VectorFunctions.cosineSimilarityWide(col("embedding"), col("qvec")))
      .orderBy(col("d"), col("doc_id"))
      .limit(5)
      .select(col("doc_id").cast("long").as("id"),
        (lit(1.0) / (lit(1.0) + col("d"))).as("derived"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S10: word-window splitter (size 20, stride 15) — the SQL-checkable
    // variant; the recursive character splitter is unit-tested golden.
    "s10_split" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
      val words = split(col("text"), " ")
      docs.select(col("doc_id"), words.as("w"),
          explode(sequence(lit(0), size(words) - 1, lit(15))).as("start"))
        .select(col("doc_id"), (col("start") / 15).cast("long").as("chunk_index"),
          concat_ws(" ", slice(col("w"), col("start") + 1, lit(20))).as("chunk"))
        .withColumn("n_words", size(split(col("chunk"), " ")).cast("long"))
        .orderBy(col("doc_id"), col("chunk_index"))
    }),

    // R1: basic retrieve — embed query → k-NN → chunk texts + sources.
    "r1_retrieve" -> ((s, dir) => {
      val mem = ragView(s, dir)
      val q = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      mem.crossJoin(broadcast(q))
        .withColumn("d", lit(1.0) -
          VectorFunctions.cosineSimilarityWide(col("embedding"), col("qvec")))
        .orderBy(col("d"), col("doc_id"))
        .limit(10)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          round(lit(1.0) / (lit(1.0) + col("d")), 6).as("score"))
    }),

    // R2: adaptive retrieval — seeds → 1-hop expansion → blended score →
    // doc-priority token-budget packing (the reference's inner-break walk).
    "r2_adaptive" -> ((s, dir) => {
      val mem = ragView(s, dir)
      val edges = Tables.documents(s, dir).filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").cast("long").as("src"),
          (col("doc_id") + 3).cast("long").as("dst"))
      // The seed set (≤5 rows) is referenced three times by the expansion
      // plan (hop join, left_anti, union) — materialize it locally once so
      // the corpus k-NN scan behind it runs once, not per reference.
      val seedSet = graft.core.Local.materialized(seeds(s, dir))
      val expanded = Rag.expandSeeds(seedSet, edges)
      // Candidates are bounded by |seeds| × (1 + fanout); materializing
      // them makes packContext's self-referential pack plan local math.
      val cand = graft.core.Local.materialized(expanded
        .join(mem, expanded("id") === mem("doc_id"))
        .select(col("id"), col("source").as("parent"),
          col("id").as("chunk_index"), col("derived"), col("depth"),
          Rag.estTokens(col("text")).as("tokens"),
          Rag.density(col("text")).as("density"))
        .withColumn("final",
          Rag.finalScore(col("derived"), col("depth"), col("density"))))
      Rag.packContext(cand, budget = 120L)
        .select(col("id").cast("long").as("doc_id"), col("parent").as("source"),
          col("depth").cast("long").as("depth"), round(col("final"), 6).as("final"),
          col("tokens"), col("kept"))
        .orderBy(col("doc_id"))
    }),

    // R8 (R2's DEFAULT strategy, ExpansionStrategy "graph"): weighted
    // multi-depth BFS expansion — per-relation score weights, shortest-
    // depth dedup, disallowed-relation filter (the 'cites' edges must not
    // contribute), and the 25-node discovery cap truncating the
    // overflowing level by (derived desc, id).
    "r8_graph_expansion" -> ((s, dir) => {
      val di = Tables.documents(s, dir)
        .select(col("doc_id").cast("long").as("i"))
      def e(rel: String, dst: Column): DataFrame =
        di.select(col("i").as("src"), dst.cast("long").as("dst"),
          lit(rel).as("rel"))
      val edges = e("next", col("i") + 1)
        .unionByName(e("prev", col("i") - 1))
        .unionByName(e("parent", col("i") - pmod(col("i"), lit(5))))
        .unionByName(e("mentions", pmod(col("i") * 7, lit(1000))))
        .unionByName(e("cites", pmod(col("i") * 11, lit(1000))))
      val seedSet = graft.core.Local.materialized(seeds(s, dir))
      Rag.expandGraphBfs(seedSet, edges, depth = 2, maxNodes = 25)
        .select(col("id").cast("long").as("id"),
          col("depth").cast("long").as("depth"),
          round(col("derived"), 6).as("derived"))
        .orderBy(col("id"))
    }),

    // R3: information density (unique-token ratio).
    "r3_density" -> ((s, dir) => {
      Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), round(Rag.density(col("text")), 6).as("density"))
        .orderBy(col("doc_id"))
    }),

    // R4: provenance — source attribution, token estimates, confidence =
    // mean relevance of the attribution set.
    "r4_provenance" -> ((s, dir) => {
      val mem = ragView(s, dir)
      val q = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      // Materialize the top-10 attribution set locally once: confidence is a
      // local agg over it (no unpartitioned window, no second corpus scan).
      val top = graft.core.Local.materialized(
        mem.crossJoin(broadcast(q))
          .withColumn("d", lit(1.0) -
            VectorFunctions.cosineSimilarityWide(col("embedding"), col("qvec")))
          .orderBy(col("d"), col("doc_id"))
          .limit(10)
          .withColumn("score", lit(1.0) / (lit(1.0) + col("d")))
          .select(col("doc_id").cast("long").as("doc_id"), col("source"),
            col("score"), Rag.estTokens(col("text")).as("est_tokens")))
      top.crossJoin(broadcast(top.agg(round(avg(col("score")), 6).as("confidence"))))
        .withColumn("score", round(col("score"), 6))
        .orderBy(col("doc_id"))
    }),

    // R5: HyDe + CQR retrieval (`proxy.go:342-359`): conversational query
    // rewrite, then a hypothetical answer document, both through the
    // pluggable LlmClient (deterministic stub here — parity scope per
    // SURVEY §7.4 risk 7); the hypothetical doc is embedded and retrieval
    // runs against ITS vector. The whole chain — stub hash-echo, polyhash
    // embedding, cosine ranking — is engine-independent, so the oracle
    // replays every stage in SQL.
    "r5_hyde" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val docs = Tables.documents(s, dir)
      // The prompt chain comes from the shared frame builder so the golden
      // spec pins exactly what this query hands the stub.
      val hydePrompt = graft.llm.LlmFrames.r5Frames(R5Query, R5History).last._2
      val hydoc = graft.llm.StubLlm.complete(hydePrompt)
      val qvec = graft.streaming.Streams.hashEmbedding(lit(hydoc), dim = 64)
      emb
        .withColumn("d", lit(1.0) -
          VectorFunctions.cosineSimilarityWide(col("embedding"), qvec))
        .orderBy(col("d"), col("vec_id"))
        .limit(10)
        .join(docs.select(col("doc_id"), col("source")),
          col("vec_id") === col("doc_id"))
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          round(lit(1.0) / (lit(1.0) + col("d")), 6).as("score"))
        .orderBy(col("doc_id"))
    }),

    // R6: semantic cache — nearest cached query under distance threshold.
    "r6_semantic_cache" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cache = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").cast("long").as("cache_id"),
          col("embedding").as("cvec"),
          concat(lit("ans:"), col("vec_id")).as("answer"))
      val q = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qvec"))
      Rag.cacheLookup(cache, q, threshold = 0.3)
        .select(col("qid"), col("cache_id"), round(col("d"), 6).as("d"),
          col("hit"), col("answer"))
        .orderBy(col("qid"))
    }),

    // R7: semantic firewall — guard-set similarity + literal deny list.
    "r7_firewall" -> ((s, dir) => {
      val mem = ragView(s, dir).filter(col("doc_id") < 50)
        .select(col("doc_id").cast("long").as("qid"),
          col("embedding").as("qvec"), col("text"))
      val guards = Tables.embeddings(s, dir).filter(col("vec_id") % 37 === 0)
        .select(col("vec_id").cast("long").as("gid"), col("embedding").as("gvec"))
      Rag.firewall(mem, guards, threshold = 0.5, denyList = Seq("drop table"))
        .select(col("qid"), round(col("max_sim"), 6).as("max_sim"),
          col("deny_hit"), col("blocked"))
        .orderBy(col("qid"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "s10_split" ->
      """SELECT doc_id, CAST(start / 15 AS BIGINT) AS chunk_index,
        |  array_to_string(list_slice(w, start + 1, least(start + 20, len(w))), ' ') AS chunk,
        |  CAST(least(start + 20, len(w)) - start AS BIGINT) AS n_words
        |FROM (
        |  SELECT doc_id, str_split(text, ' ') AS w,
        |    unnest(generate_series(0, len(str_split(text, ' ')) - 1, 15)) AS start
        |  FROM documents WHERE doc_id < 100)
        |ORDER BY doc_id, chunk_index""".stripMargin,

    "r1_retrieve" ->
      s"""WITH $memSql,
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT m.doc_id, m.source, ${cosSql("m.embedding", "q.qv")} AS d
         |  FROM mem m CROSS JOIN q)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         |  round(1.0 / (1.0 + d), 6) AS score
         |FROM (SELECT *, row_number() OVER (ORDER BY d, doc_id) AS rn FROM scored)
         |WHERE rn <= 10""".stripMargin,

    "r2_adaptive" ->
      s"""WITH RECURSIVE $memSql,
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT m.doc_id, ${cosSql("m.embedding", "q.qv")} AS d
         |  FROM mem m CROSS JOIN q),
         |seeds AS (
         |  SELECT doc_id AS id, 1.0 / (1.0 + d) AS derived
         |  FROM (SELECT *, row_number() OVER (ORDER BY d, doc_id) AS rn FROM scored)
         |  WHERE rn <= 5),
         |edges AS (
         |  SELECT doc_id AS src, doc_id + 3 AS dst FROM documents WHERE doc_id % 2 = 0),
         |exp AS (
         |  SELECT e.dst AS id, max(s.derived * 0.7) AS derived
         |  FROM seeds s JOIN edges e ON e.src = s.id
         |  WHERE e.dst NOT IN (SELECT id FROM seeds) GROUP BY e.dst),
         |all_c AS (
         |  SELECT id, derived, 0 AS depth FROM seeds
         |  UNION ALL SELECT id, derived, 1 FROM exp),
         |cand AS (
         |  SELECT c.id, m.source AS parent, c.id AS chunk_index, c.derived, c.depth,
         |    CAST(floor(length(m.text) / 4.0) AS BIGINT) AS tokens,
         |    len(list_distinct(str_split(m.text, ' '))) * 1.0
         |      / len(str_split(m.text, ' ')) AS density
         |  FROM all_c c JOIN mem m ON m.doc_id = c.id),
         |fin AS (
         |  SELECT *, 0.6 * derived + 0.2 * greatest(0.3, 1.0 - 0.15 * depth)
         |    + 0.2 * least(1.0, greatest(0.0, (density - 0.3) / 0.6)) AS final
         |  FROM cand),
         |prio AS (
         |  SELECT parent, max(CASE WHEN depth = 0 THEN derived ELSE 0.0 END) AS prio
         |  FROM fin GROUP BY parent),
         |ord AS (
         |  SELECT f.*, row_number() OVER (ORDER BY p.prio DESC, f.parent, f.chunk_index) AS rn
         |  FROM fin f JOIN prio p USING (parent)),
         |pack AS (
         |  SELECT 0 AS rn, CAST(0 AS BIGINT) AS total,
         |    CAST(NULL AS VARCHAR) AS broken, CAST(NULL AS BIGINT) AS kept_id
         |  UNION ALL
         |  SELECT o.rn,
         |    CASE WHEN o.parent IS NOT DISTINCT FROM p.broken THEN p.total
         |         WHEN p.total + o.tokens > 120 THEN p.total
         |         ELSE p.total + o.tokens END,
         |    CASE WHEN o.parent IS NOT DISTINCT FROM p.broken THEN p.broken
         |         WHEN p.total + o.tokens > 120 THEN o.parent
         |         ELSE p.broken END,
         |    CASE WHEN o.parent IS DISTINCT FROM p.broken
         |          AND p.total + o.tokens <= 120 THEN o.id END
         |  FROM pack p JOIN ord o ON o.rn = p.rn + 1)
         |SELECT CAST(o.id AS BIGINT) AS doc_id, o.parent AS source,
         |  CAST(o.depth AS BIGINT) AS depth, round(o.final, 6) AS final,
         |  o.tokens, (k.kept_id IS NOT NULL) AS kept
         |FROM ord o LEFT JOIN (SELECT kept_id FROM pack WHERE kept_id IS NOT NULL) k
         |  ON k.kept_id = o.id
         |ORDER BY doc_id""".stripMargin,

    // Independent level-by-level re-derivation of the capped weighted BFS
    // (depth is a fixed 2, so plain CTEs — no recursion needed). The
    // 'cites' edges are deliberately absent: the Spark side must filter
    // them via the relation allow-list.
    "r8_graph_expansion" ->
      s"""WITH $memSql,
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT m.doc_id, ${cosSql("m.embedding", "q.qv")} AS d
         |  FROM mem m CROSS JOIN q),
         |seeds AS (
         |  SELECT CAST(doc_id AS BIGINT) AS id, 1.0 / (1.0 + d) AS derived
         |  FROM (SELECT *, row_number() OVER (ORDER BY d, doc_id) AS rn FROM scored)
         |  WHERE rn <= 5),
         |di AS (SELECT CAST(doc_id AS BIGINT) AS i FROM documents),
         |edges AS (
         |  SELECT i AS src, i + 1 AS dst, 0.95 AS w FROM di
         |  UNION ALL SELECT i, i - 1, 0.95 FROM di
         |  UNION ALL SELECT i, i - (i % 5), 0.80 FROM di
         |  UNION ALL SELECT i, (i * 7) % 1000, 0.50 FROM di),
         |lvl1 AS (
         |  SELECT e.dst AS id, max(s.derived * e.w) AS derived
         |  FROM seeds s JOIN edges e ON e.src = s.id
         |  WHERE e.dst NOT IN (SELECT id FROM seeds)
         |  GROUP BY e.dst),
         |lvl1c AS (
         |  SELECT id, derived FROM (
         |    SELECT id, derived,
         |      row_number() OVER (ORDER BY derived DESC, id) AS rn FROM lvl1)
         |  WHERE rn <= 25 - (SELECT count(*) FROM seeds)),
         |vis1 AS (
         |  SELECT id, 0 AS depth, derived FROM seeds
         |  UNION ALL SELECT id, 1, derived FROM lvl1c),
         |lvl2 AS (
         |  SELECT e.dst AS id, max(f.derived * e.w) AS derived
         |  FROM lvl1c f JOIN edges e ON e.src = f.id
         |  WHERE e.dst NOT IN (SELECT id FROM vis1)
         |  GROUP BY e.dst),
         |lvl2c AS (
         |  SELECT id, derived FROM (
         |    SELECT id, derived,
         |      row_number() OVER (ORDER BY derived DESC, id) AS rn FROM lvl2)
         |  WHERE rn <= 25 - (SELECT count(*) FROM vis1))
         |SELECT CAST(id AS BIGINT) AS id, CAST(depth AS BIGINT) AS depth,
         |  round(derived, 6) AS derived
         |FROM (SELECT id, depth, derived FROM vis1
         |      UNION ALL SELECT id, 2, derived FROM lvl2c)
         |ORDER BY id""".stripMargin,

    "r3_density" ->
      """SELECT doc_id,
        |  round(len(list_distinct(str_split(text, ' '))) * 1.0
        |        / len(str_split(text, ' ')), 6) AS density
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "r4_provenance" ->
      s"""WITH $memSql,
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT m.doc_id, m.source, m.text, ${cosSql("m.embedding", "q.qv")} AS d
         |  FROM mem m CROSS JOIN q),
         |top AS (
         |  SELECT doc_id, source, text, 1.0 / (1.0 + d) AS score
         |  FROM (SELECT *, row_number() OVER (ORDER BY d, doc_id) AS rn FROM scored)
         |  WHERE rn <= 10)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         |  round(score, 6) AS score,
         |  CAST(floor(length(text) / 4.0) AS BIGINT) AS est_tokens,
         |  round(avg(score) OVER (), 6) AS confidence
         |FROM top ORDER BY doc_id""".stripMargin,

    "r5_hyde" -> {
      def ph(x: String) =
        s"""list_reduce([CAST(0 AS BIGINT)] || list_transform(str_split($x, ''), c -> CAST(ord(c) AS BIGINT)), (acc, x) -> (acc * 31 + x) % 2147483647)"""
      def stub(src: String) =
        s"""SELECT 'stub[' || CAST(${ph("t")} AS VARCHAR) || ']: ' || substr(t, 1, 64) AS t FROM $src"""
      s"""WITH p1 AS (SELECT 'cqr: $R5Query | $R5History' AS t),
         |rw AS (${stub("p1")}),
         |p2 AS (SELECT 'hyde: ' || t AS t FROM rw),
         |hy AS (${stub("p2")}),
         |qv AS (
         |  SELECT list_transform(generate_series(1, 64), i ->
         |    CAST(CAST((${ph("t")} * i + 12289) % 2147483647 AS DOUBLE)
         |         / 2147483647.0 - 0.5 AS FLOAT)) AS v
         |  FROM hy),
         |scored AS (
         |  SELECT e.vec_id,
         |    1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
         |                                 CAST(q.v AS DOUBLE[])) AS d
         |  FROM embeddings e CROSS JOIN qv q),
         |top AS (
         |  SELECT vec_id, d
         |  FROM (SELECT *, row_number() OVER (ORDER BY d, vec_id) AS rn FROM scored)
         |  WHERE rn <= 10)
         |SELECT CAST(t.vec_id AS BIGINT) AS doc_id, d2.source,
         |  round(1.0 / (1.0 + t.d), 6) AS score
         |FROM top t JOIN documents d2 ON d2.doc_id = t.vec_id
         |ORDER BY doc_id""".stripMargin
    },

    "r6_semantic_cache" ->
      s"""WITH cache AS (
         |  SELECT vec_id AS cache_id, embedding AS cvec, 'ans:' || vec_id AS answer
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
         |scored AS (
         |  SELECT q.qid, c.cache_id, c.answer, ${cosSql("q.qv", "c.cvec")} AS d
         |  FROM q CROSS JOIN cache c),
         |best AS (
         |  SELECT * FROM (SELECT *,
         |    row_number() OVER (PARTITION BY qid ORDER BY d, cache_id) AS rn
         |    FROM scored) WHERE rn = 1)
         |SELECT CAST(qid AS BIGINT) AS qid,
         |  CAST(CASE WHEN d < 0.3 THEN cache_id END AS BIGINT) AS cache_id,
         |  round(d, 6) AS d, d < 0.3 AS hit,
         |  CASE WHEN d < 0.3 THEN answer END AS answer
         |FROM best ORDER BY qid""".stripMargin,

    "r7_firewall" ->
      s"""WITH $memSql,
         |qs AS (SELECT doc_id AS qid, embedding AS qv, text FROM mem WHERE doc_id < 50),
         |guards AS (SELECT vec_id AS gid, embedding AS gvec FROM embeddings WHERE vec_id % 37 = 0),
         |ms AS (
         |  SELECT q.qid, max(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
         |                                           CAST(g.gvec AS DOUBLE[]))) AS max_sim
         |  FROM qs q CROSS JOIN guards g GROUP BY q.qid)
         |SELECT CAST(q.qid AS BIGINT) AS qid, round(m.max_sim, 6) AS max_sim,
         |  (lower(q.text) LIKE '%drop table%') AS deny_hit,
         |  (m.max_sim >= 0.5 OR lower(q.text) LIKE '%drop table%') AS blocked
         |FROM qs q JOIN ms m USING (qid) ORDER BY qid""".stripMargin
  )
}
