package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.filter.FilterDsl
import graft.functions.VectorFunctions
import graft.graph.GraphOps
import graft.multimodal.{Avi, Multimodal, Png, Wav}
import graft.oplog.Oplog
import graft.search.Fusion
import graft.text.TextPipeline

/** The hybrid-plumbing leftovers (VERDICT r1 item 10) + the multimodal
  * binary-column pipeline: F5 CONTAINS routed into fusion, T7 text-field
  * auto-detect, F8 valid-id scan, F9 cursor pagination, G5 all-relations,
  * G7 graph-filtered search, G11 1-hop connections + broken-link detection,
  * G13 search + relation hydration, G14 UI sample, V11 distance-to-node,
  * M1 multimodal feature extraction.
  */
object MiscQueries {

  /** Italian vocabulary (from the stemmer golden set) and its stems. */
  val ItVocab: Seq[String] = Seq(
    "casa", "gatto", "tavolo", "strada", "parlare", "vedere", "finire",
    "velocemente", "nazionale", "operatore", "trovarlo", "banchi", "funghi",
    "gioia", "aiuola", "chiodo")
  val ItStems: Seq[String] = Seq(
    "cas", "gatt", "tav", "strad", "parl", "ved", "fin",
    "veloc", "nazion", "oper", "trov", "banch", "fungh",
    "gioi", "aiu", "chiod")

  private def cosSql(a: String, b: String): String =
    s"1.0 - list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  private val memSql =
    """mem AS (
      |  SELECT d.doc_id, d.text, d.source, e.embedding
      |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F5: CONTAINS(text,...) extracted from the filter DSL and routed into
    // hybrid fusion; the residual boolean filter becomes the allow-list.
    "f5_contains_fusion" -> ((s, dir) => {
      val mem = FusionQueries.memoryView(s, dir)
      val raw = "CONTAINS(text,'table merge query') AND doc_id < 400"
      val (boolFilter, textQuery, field) = FilterDsl.parseHybridFilter(raw)
      require(field == "text")
      val pred = FilterDsl.compile(boolFilter, mem.schema)
      val qdf = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      Fusion.searchWithFusionDF(mem, "doc_id", "embedding", "text",
          Some(qdf), textQuery,
          Fusion.FusionParams(alpha = 0.5, k = 15, metric = "cosine", wide = true),
          filter = Some(pred))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // T7: text-field auto-detect over two schemas (priority order).
    "t7_text_field" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val renamed = docs.withColumnRenamed("text", "page_content")
      Seq(
        ("documents", TextPipeline.detectTextField(docs.schema).orNull),
        ("renamed", TextPipeline.detectTextField(renamed.schema).orNull))
        .toDF("tbl", "detected").orderBy(col("tbl"))
    }),

    // F8: valid-id scan over the replayed oplog state (non-deleted only).
    "f8_valid_ids" -> ((s, dir) => {
      Oplog.foldVectors(OplogQueries.storedOplog(s, dir))
        .filter(col("index_name") === Oplog.MemIdx && col("alive") &&
          col("id").cast("long") < 50)
        .select(col("id").cast("long").as("id"))
        .orderBy(col("id"))
    }),

    // F9: cursor pagination — stable id-ordered page after a cursor. The
    // 20-row page is materialized locally once; next_cursor is a local agg
    // (no unpartitioned window, no second scan).
    "f9_cursor_page" -> ((s, dir) => {
      val page = graft.core.Local.materialized(
        Tables.documents(s, dir)
          .filter(col("doc_id") > 40)
          .orderBy(col("doc_id"))
          .limit(20)
          .select(col("doc_id"), col("source")))
      page.crossJoin(broadcast(page.agg(max(col("doc_id")).as("next_cursor"))))
        .orderBy(col("doc_id"))
    }),

    // G5: all relations of part:1, both directions, sorted targets.
    "g5_relations" -> ((s, dir) => {
      val e = GraphQueries.edgeView(s, dir)
      GraphOps.relations(e, "part:1")
        .select(col("rel"), col("direction"),
          size(col("targets")).cast("long").as("n"),
          concat_ws(",", slice(col("targets"), 1, 5)).as("first_targets"))
        .orderBy(col("rel"), col("direction"))
    }),

    // G7: graph allow-list (BFS over cites, depth ≤ 3) ∩ k-NN search.
    "g7_graph_filtered_search" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cites = docs.select(
        col("doc_id").cast("string").as("src"),
        (col("doc_id") + 3).cast("string").as("dst"),
        lit("cites").as("rel"), lit(1L).as("created_at"),
        lit(null).cast("long").as("deleted_at"))
      import s.implicits._
      val allowed = GraphOps.drained(GraphOps.bfsT(cites, Seq("0").toDF("node"),
          rels = Seq("cites"), direction = "out", maxDepth = 3))
        .select(col("node").cast("long").as("doc_id"))
      val mem = RagQueries.ragView(s, dir).join(allowed, Seq("doc_id"))
      val q = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      mem.crossJoin(broadcast(q))
        .withColumn("d", lit(1.0) -
          VectorFunctions.cosineSimilarityWide(col("embedding"), col("qvec")))
        .orderBy(col("d"), col("doc_id"))
        .limit(10)
        .select(col("doc_id").cast("long").as("doc_id"),
          round(col("d"), 6).as("dist"))
    }),

    // G11: 1-hop hydrated connections + broken-link detection (the
    // self-repair scan: active edge whose target is not alive).
    "g11_connections" -> ((s, dir) => {
      val oplog = OplogQueries.storedOplog(s, dir)
      val alive = Oplog.foldVectors(oplog)
        .filter(col("index_name") === Oplog.MemIdx && col("alive"))
        .select(col("id").as("dst"), lit(true).as("dst_alive"))
      Oplog.foldEdges(oplog)
        .filter(col("rel") === "next" && col("deleted_at").isNull &&
          col("src").cast("long") < 20)
        .join(alive, Seq("dst"), "left")
        .select(col("src").cast("long").as("src_id"),
          col("dst").cast("long").as("dst_id"),
          coalesce(col("dst_alive"), lit(false)).as("dst_alive"))
        .orderBy(col("src_id"))
    }),

    // G13: top-k search + relation hydration of each result.
    "g13_search_hydrate" -> ((s, dir) => {
      val mem = RagQueries.ragView(s, dir)
      val q = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val top = mem.crossJoin(broadcast(q))
        .withColumn("d", lit(1.0) -
          VectorFunctions.cosineSimilarityWide(col("embedding"), col("qvec")))
        .orderBy(col("d"), col("doc_id"))
        .limit(5)
        .select(col("doc_id").cast("long").as("doc_id"))
      val cites = Tables.documents(s, dir).select(
        col("doc_id").cast("long").as("src"),
        (col("doc_id") + 3).cast("long").as("dst"))
      top.join(cites, top("doc_id") === cites("src"))
        .join(mem.select(col("doc_id").as("dst"), col("source").as("target_source")),
          Seq("dst"))
        .select(col("doc_id"), lit("cites").as("rel"),
          col("dst").as("target"), col("target_source"))
        .orderBy(col("doc_id"), col("target"))
    }),

    // G14: deterministic UI sample — first 25 nodes + induced edges.
    "g14_ui_sample" -> ((s, dir) => {
      val nodes = RagQueries.ragView(s, dir).filter(col("doc_id") < 25)
        .select(col("doc_id").cast("long").as("doc_id"))
      val cites = Tables.documents(s, dir).select(
        col("doc_id").cast("long").as("src"),
        (col("doc_id") + 3).cast("long").as("dst"))
      val induced = cites
        .join(nodes.withColumnRenamed("doc_id", "src"), Seq("src"), "left_semi")
        .join(nodes.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_semi")
      nodes.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(induced.agg(count(lit(1)).as("n_edges")))
    }),

    // The FLAGSHIP read path composed end-to-end (SURVEY §3.1 trace):
    // hybrid filter with CONTAINS extraction → metadata allow-list AND
    // graph BFS allow-list → parallel vector+BM25 branches → alpha fusion
    // → time-decay → top-k → relation hydration. One Catalyst plan.
    "h9_full_pipeline" -> ((s, dir) => {
      val mem = FusionQueries.memoryView(s, dir)
      val raw = "CONTAINS(text,'table merge query') AND doc_id < 450"
      val (boolFilter, textQuery, _) = FilterDsl.parseHybridFilter(raw)
      val metaPred = FilterDsl.compile(boolFilter, mem.schema)
      // Graph allow-list: docs within 3 cites-hops of doc 0 or doc 1.
      val cites = Tables.documents(s, dir).select(
        col("doc_id").cast("string").as("src"),
        (col("doc_id") + 3).cast("string").as("dst"),
        lit("cites").as("rel"), lit(1L).as("created_at"),
        lit(null).cast("long").as("deleted_at"))
      import s.implicits._
      val allowed = GraphOps.drained(GraphOps.bfsT(cites, Seq("0", "1").toDF("node"),
          rels = Seq("cites"), direction = "out", maxDepth = 3))
        .select(col("node").cast("long").as("doc_id"))
      val qdf = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val top = Fusion.searchWithFusionDF(mem, "doc_id", "embedding", "text",
        Some(qdf), textQuery,
        Fusion.FusionParams(alpha = 0.6, k = 5, metric = "cosine",
          memory = FusionQueries.memCfg, now = FusionQueries.Now, wide = true),
        filter = Some(metaPred), allowList = Some(allowed))
      // Relation hydration: expand each hit one cites-hop, hydrating the
      // target's source when it exists in the memory view.
      top
        .withColumn("target", col("doc_id") + 3)
        .join(RagQueries.ragView(s, dir)
            .select(col("doc_id").as("target"), col("source").as("target_source")),
          Seq("target"), "left")
        .select(col("doc_id"), round(col("score"), 6).as("score"),
          col("target"), col("target_source"))
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // T4: Italian analyzer pipeline end-to-end (tokenize → IT stopwords →
    // Snowball-Italian stem) over a deterministic Italian corpus.
    "t4_analyze_italian" -> ((s, dir) => {
      val vocab = MiscQueries.ItVocab.map(lit(_))
      def w(off: Int) = element_at(array(vocab: _*),
        ((col("vec_id") + off) % 16 + 1).cast("int"))
      val corpus = Tables.embeddings(s, dir).filter(col("vec_id") < 100)
        .select(col("vec_id").cast("long").as("id"),
          concat_ws(" ", w(0), w(3), w(7), lit("il e la")).as("text"))
      graft.text.Analyzer.tokensDF(corpus, "text", "italian")
        .groupBy(col("id"))
        .agg(concat_ws(" ", sort_array(collect_list(col("token")))).as("stems"))
        .orderBy(col("id"))
    }),

    // G8 guided expansion: BFS where a neighbor is admitted only if its
    // vector is within `thr` of the guide vector (graph.go:296-390's
    // guided subgraph) — pruning a branch cuts everything behind it.
    "g8_guided_subgraph" -> ((s, dir) => {
      val mem = RagQueries.ragView(s, dir)
      val guide = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("gvec"))
      val admitted = mem.crossJoin(broadcast(guide))
        .filter(lit(1.0) -
          VectorFunctions.cosineSimilarityWide(col("embedding"), col("gvec")) <= 1.0)
        .select(col("doc_id").cast("string").as("adm"))
      val cites = Tables.documents(s, dir).select(
          col("doc_id").cast("string").as("src"),
          (col("doc_id") + 3).cast("string").as("dst"),
          lit("cites").as("rel"), lit(1L).as("created_at"),
          lit(null).cast("long").as("deleted_at"))
        .join(admitted, col("dst") === col("adm"), "left_semi")
      import s.implicits._
      GraphOps.drained(GraphOps.bfsT(cites, Seq("0").toDF("node"),
          rels = Seq("cites"), direction = "out", maxDepth = 3))
        .select(col("node").cast("long").as("node"),
          col("depth").cast("long").as("depth"))
        .orderBy(col("node"))
    }),

    // V11: distance from stored nodes to an ad-hoc query, both metrics.
    "v11_distance_to_node" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      emb.filter(col("vec_id").between(1, 10))
        .crossJoin(broadcast(q))
        .select(col("vec_id").cast("long").as("id"),
          round(sqrt(VectorFunctions.euclideanSqWide(col("embedding"), col("qvec"))), 6)
            .as("euclidean"),
          round(lit(1.0) -
            VectorFunctions.cosineSimilarityWide(col("embedding"), col("qvec")), 6)
            .as("cosine"))
        .orderBy(col("id"))
    }),

    // M1: multimodal binary-column pipeline — payload → mapPartitions →
    // typed features. Half the rows are REAL PNGs (synthesized in-plan by
    // the deterministic Png writer) decoded with javax.imageio: doc_id%4=2
    // is a 9×8 image whose pixels are painted so its dHash equals a known
    // arithmetic target; %4=3 is a variable-width horizontal gradient
    // (every dHash comparison fires → phash = -1, true varying width).
    // The rest are text bytes riding the non-image stub fallback.
    "m1_multimodal" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val payload =
            if (id % 4 == 2) {
              val target = (id * 2654435761L) % 2147483647L
              Png.encodeGray(9, 8, (x, y) => {
                var g = 120
                var i = 0
                while (i < x) {
                  g += (if (((target >> (y * 8 + i)) & 1L) == 1L) 15 else -15)
                  i += 1
                }
                g
              })
            } else if (id % 4 == 3) {
              val w = 16 + (id % 7).toInt
              Png.encodeGray(w, 12, (x, _) => x * 255 / (w - 1))
            } else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (id, payload)
        }
      Multimodal.extractFeatures(media)
        .select(col("doc_id"), col("n_bytes"), col("phash"),
          col("width"), col("height"), col("channels"), col("format"))
        .orderBy(col("doc_id"))
    }),

    // M2: audio binary columns — REAL PCM WAV decode + 64-bit energy-
    // difference fingerprint. doc_id%3=0 synthesizes a mono square-wave
    // WAV whose per-window amplitudes are PAINTED so the fingerprint
    // equals a known arithmetic target (the audio mirror of m1's dHash
    // painting); %3=1 is a real stereo WAV too short to carry an envelope
    // (fingerprint 0, true duration math); the rest are text bytes riding
    // the non-audio fallback.
    "m2_audio" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val payload =
            if (id % 3 == 0) {
              val target = ((id + 13) * 2654435761L) % 2147483647L
              val winLen = 16 + (id % 5).toInt
              val amps = new Array[Int](65)
              amps(0) = 8000
              for (w <- 1 until 65)
                amps(w) = amps(w - 1) +
                  (if (((target >> (w - 1)) & 1L) == 1L) 120 else -120)
              Wav.encodePcm16(8000, 1, 65 * winLen) { (f, _) =>
                val a = amps(f / winLen)
                if (f % 2 == 0) a else -a
              }
            } else if (id % 3 == 1) {
              val rate = 16000 + (id % 4).toInt * 4000
              Wav.encodePcm16(rate, 2, 64)((f, c) => (f * 40 + c * 7) % 2000)
            } else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (id, payload)
        }
      Multimodal.extractAudioFeatures(media)
        .select(col("doc_id"), col("n_bytes"), col("fingerprint"),
          col("sample_rate"), col("channels"), col("n_frames"),
          col("duration_ms"), col("format"))
        .orderBy(col("doc_id"))
    }),

    // M3: video binary columns — REAL uncompressed-AVI container decode,
    // every-3rd-frame sampling, per-frame 9×8 dHash, per-bit majority
    // fingerprint. doc_id%4=0 paints each frame so its dHash equals a
    // known arithmetic target (the video mirror of m1's painting — the
    // oracle recomputes the majority vote bit-by-bit); %4=1 is a 4-frame
    // gradient clip (every dHash comparison fires → all frames hash -1,
    // majority -1, true non-4-aligned row padding and duration math); the
    // rest are text bytes riding the non-video fallback.
    "m3_video" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val payload =
            if (id % 4 == 0) {
              val nf = 6 + (id % 5).toInt
              Avi.encodeRgb24(9, 8, 10, nf) { (f, x, y) =>
                val target = ((id * 31 + f + 7) * 2654435761L) % 2147483647L
                var g = 120
                var i = 0
                while (i < x) {
                  g += (if (((target >> (y * 8 + i)) & 1L) == 1L) 15 else -15)
                  i += 1
                }
                (g << 16) | (g << 8) | g
              }
            } else if (id % 4 == 1) {
              val w = 16 + (id % 7).toInt
              Avi.encodeRgb24(w, 12, 25, 4) { (_, x, _) =>
                val g = x * 255 / (w - 1)
                (g << 16) | (g << 8) | g
              }
            } else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (id, payload)
        }
      Multimodal.extractVideoFeatures(media, stride = 3)
        .select(col("doc_id"), col("n_bytes"), col("fingerprint"),
          col("first_frame_hash"), col("width"), col("height"),
          col("n_frames"), col("n_sampled"), col("duration_ms"),
          col("format"))
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "f5_contains_fusion" ->
      s"""WITH $memSql,
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vec AS (
         |  SELECT doc_id, ${cosSql("m.embedding", "q.qv")} AS d
         |  FROM mem m CROSS JOIN q WHERE m.doc_id < 400),
         |vtopk AS (
         |  SELECT doc_id, 1.0 / (1.0 + d) AS vscore
         |  FROM (SELECT doc_id, d, row_number() OVER (ORDER BY d, doc_id) AS rn FROM vec)
         |  WHERE rn <= 15),
         |${TextQueries.analyzedOn("mem")},
         |doclens AS (
         |  SELECT m.doc_id, count(a.token) AS dl
         |  FROM mem m LEFT JOIN analyzed a USING (doc_id) GROUP BY m.doc_id),
         |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM doclens),
         |postings AS (SELECT doc_id, token, count(*) AS tf FROM analyzed GROUP BY 1, 2),
         |qt AS (SELECT * FROM (VALUES ('tabl', 1), ('merg', 1), ('queri', 1)) AS t(token, qn)),
         |dfreq AS (
         |  SELECT p.token, count(*) AS df FROM postings p
         |  JOIN (SELECT DISTINCT token FROM qt) x USING (token) GROUP BY p.token),
         |bm25 AS (
         |  SELECT p.doc_id,
         |    sum(qt.qn * ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) *
         |        (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS raw
         |  FROM postings p JOIN qt USING (token) JOIN dfreq f USING (token)
         |  JOIN doclens d USING (doc_id) CROSS JOIN stats s GROUP BY p.doc_id),
         |filtered AS (SELECT * FROM bm25 WHERE doc_id < 400),
         |tnorm AS (SELECT doc_id, raw / max(raw) OVER () AS tscore FROM filtered),
         |fused AS (
         |  SELECT coalesce(v.doc_id, t.doc_id) AS doc_id,
         |    0.5 * coalesce(v.vscore, 0) + 0.5 * coalesce(t.tscore, 0) AS score
         |  FROM vtopk v FULL OUTER JOIN tnorm t ON v.doc_id = t.doc_id)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, round(score, 6) AS score
         |FROM fused ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

    "t7_text_field" ->
      """SELECT * FROM (VALUES ('documents', 'text'), ('renamed', 'page_content'))
        |AS t(tbl, detected) ORDER BY tbl""".stripMargin,

    "f8_valid_ids" ->
      """SELECT CAST(vec_id AS BIGINT) AS id FROM embeddings
        |WHERE (vec_id % 17 <> 0 OR vec_id % 34 = 0) AND vec_id < 50
        |ORDER BY id""".stripMargin,

    "f9_cursor_page" ->
      """WITH page AS (
        |  SELECT doc_id, source FROM documents WHERE doc_id > 40
        |  ORDER BY doc_id LIMIT 20)
        |SELECT doc_id, source, max(doc_id) OVER () AS next_cursor
        |FROM page ORDER BY doc_id""".stripMargin,

    "g5_relations" ->
      s"""WITH ${GraphQueries.edgeViewSql},
         |act AS (SELECT * FROM edges WHERE deleted_at IS NULL OR deleted_at = 0),
         |rels AS (
         |  SELECT rel, 'out' AS direction, dst AS other FROM act WHERE src = 'part:1'
         |  UNION ALL
         |  SELECT rel, 'in', src FROM act WHERE dst = 'part:1')
         |SELECT rel, direction, CAST(count(*) AS BIGINT) AS n,
         |  array_to_string(list_slice(list_sort(list(other)), 1, 5), ',') AS first_targets
         |FROM rels GROUP BY rel, direction ORDER BY rel, direction""".stripMargin,

    "g7_graph_filtered_search" ->
      s"""WITH $memSql,
         |d0 AS (SELECT 0 AS id),
         |d1 AS (SELECT id + 3 AS id FROM d0),
         |d2 AS (SELECT id + 3 AS id FROM d1),
         |d3 AS (SELECT id + 3 AS id FROM d2),
         |allow AS (
         |  SELECT DISTINCT id FROM (
         |    SELECT id FROM d0 UNION ALL SELECT id FROM d1
         |    UNION ALL SELECT id FROM d2 UNION ALL SELECT id FROM d3)
         |  WHERE id IN (SELECT doc_id FROM documents)),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT m.doc_id, ${cosSql("m.embedding", "q.qv")} AS d
         |  FROM mem m JOIN allow a ON m.doc_id = a.id CROSS JOIN q)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, round(d, 6) AS dist
         |FROM (SELECT *, row_number() OVER (ORDER BY d, doc_id) AS rn FROM scored)
         |WHERE rn <= 10""".stripMargin,

    "g11_connections" ->
      """WITH mx AS (SELECT max(vec_id) AS m FROM embeddings),
        |active AS (
        |  SELECT vec_id AS src_id, vec_id + 1 AS dst_id FROM embeddings, mx
        |  WHERE vec_id < 20
        |    AND NOT (vec_id % 6 = 0 OR vec_id % 17 = 0
        |             OR ((vec_id + 1) % 17 = 0 AND vec_id + 1 <= mx.m)))
        |SELECT CAST(src_id AS BIGINT) AS src_id, CAST(dst_id AS BIGINT) AS dst_id,
        |  (dst_id <= (SELECT m FROM mx)
        |   AND (dst_id % 17 <> 0 OR dst_id % 34 = 0)) AS dst_alive
        |FROM active ORDER BY src_id""".stripMargin,

    "g13_search_hydrate" ->
      s"""WITH $memSql,
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT m.doc_id, ${cosSql("m.embedding", "q.qv")} AS d
         |  FROM mem m CROSS JOIN q),
         |top AS (
         |  SELECT doc_id FROM (SELECT doc_id, row_number() OVER (ORDER BY d, doc_id) AS rn
         |                      FROM scored) WHERE rn <= 5)
         |SELECT CAST(t.doc_id AS BIGINT) AS doc_id, 'cites' AS rel,
         |  CAST(t.doc_id + 3 AS BIGINT) AS target, m.source AS target_source
         |FROM top t JOIN mem m ON m.doc_id = t.doc_id + 3
         |ORDER BY doc_id, target""".stripMargin,

    "g14_ui_sample" ->
      s"""WITH $memSql,
         |nodes AS (SELECT doc_id FROM mem WHERE doc_id < 25),
         |induced AS (
         |  SELECT d.doc_id FROM documents d
         |  JOIN nodes a ON d.doc_id = a.doc_id
         |  JOIN nodes b ON d.doc_id + 3 = b.doc_id)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
         |       (SELECT CAST(count(*) AS BIGINT) FROM induced) AS n_edges""".stripMargin,

    "h9_full_pipeline" ->
      s"""WITH ${FusionQueries.memViewSql},
         |allow AS (
         |  SELECT DISTINCT id FROM (
         |    SELECT unnest([0, 1]) AS id
         |    UNION ALL SELECT unnest([3, 4]) UNION ALL SELECT unnest([6, 7])
         |    UNION ALL SELECT unnest([9, 10]))
         |  WHERE id IN (SELECT doc_id FROM documents)),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vec AS (
         |  SELECT doc_id,
         |    1.0 - list_cosine_similarity(CAST(m.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS d
         |  FROM mem m CROSS JOIN q
         |  WHERE m.doc_id < 450 AND m.doc_id IN (SELECT id FROM allow)),
         |vtopk AS (
         |  SELECT doc_id, 1.0 / (1.0 + d) AS vscore
         |  FROM (SELECT doc_id, d, row_number() OVER (ORDER BY d, doc_id) AS rn FROM vec)
         |  WHERE rn <= 5),
         |${TextQueries.analyzedOn("mem")},
         |doclens AS (
         |  SELECT m.doc_id, count(a.token) AS dl
         |  FROM mem m LEFT JOIN analyzed a USING (doc_id) GROUP BY m.doc_id),
         |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM doclens),
         |postings AS (SELECT doc_id, token, count(*) AS tf FROM analyzed GROUP BY 1, 2),
         |qt AS (SELECT * FROM (VALUES ('tabl', 1), ('merg', 1), ('queri', 1)) AS t(token, qn)),
         |dfreq AS (
         |  SELECT p.token, count(*) AS df FROM postings p
         |  JOIN (SELECT DISTINCT token FROM qt) x USING (token) GROUP BY p.token),
         |bm25 AS (
         |  SELECT p.doc_id,
         |    sum(qt.qn * ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) *
         |        (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS raw
         |  FROM postings p JOIN qt USING (token) JOIN dfreq f USING (token)
         |  JOIN doclens d USING (doc_id) CROSS JOIN stats s GROUP BY p.doc_id),
         |filtered AS (
         |  SELECT * FROM bm25
         |  WHERE doc_id < 450 AND doc_id IN (SELECT id FROM allow)),
         |tnorm AS (SELECT doc_id, raw / max(raw) OVER () AS tscore FROM filtered),
         |fused AS (
         |  SELECT coalesce(v.doc_id, t.doc_id) AS doc_id,
         |    0.6 * coalesce(v.vscore, 0) + 0.4 * coalesce(t.tscore, 0) AS fscore
         |  FROM vtopk v FULL OUTER JOIN tnorm t ON v.doc_id = t.doc_id),
         |decayed AS (
         |  SELECT f.doc_id, f.fscore * ${FusionQueries.decaySql} AS score
         |  FROM fused f JOIN (SELECT *, ${FusionQueries.hlSql} AS hl FROM mem) USING (doc_id)),
         |top AS (
         |  SELECT doc_id, score FROM decayed ORDER BY score DESC, doc_id LIMIT 5)
         |SELECT t.doc_id, round(t.score, 6) AS score,
         |  CAST(t.doc_id + 3 AS BIGINT) AS target, m.source AS target_source
         |FROM top t LEFT JOIN (
         |  SELECT d.doc_id, d.source FROM documents d
         |  JOIN embeddings e ON d.doc_id = e.vec_id) m
         |  ON m.doc_id = t.doc_id + 3
         |ORDER BY score DESC, t.doc_id""".stripMargin,

    "t4_analyze_italian" -> {
      val stemList = ItStems.map(s => s"'$s'").mkString("[", ",", "]")
      s"""WITH v AS (SELECT vec_id FROM embeddings WHERE vec_id < 100),
         |stems AS (
         |  SELECT vec_id AS id, $stemList AS sl,
         |    [CAST(vec_id % 16 AS INT) + 1, CAST((vec_id + 3) % 16 AS INT) + 1,
         |     CAST((vec_id + 7) % 16 AS INT) + 1] AS idx
         |  FROM v)
         |SELECT CAST(id AS BIGINT) AS id,
         |  array_to_string(list_sort([sl[idx[1]], sl[idx[2]], sl[idx[3]]]), ' ') AS stems
         |FROM stems ORDER BY id""".stripMargin
    },

    "g8_guided_subgraph" ->
      s"""WITH $memSql,
         |g AS (SELECT embedding AS gvec FROM embeddings WHERE vec_id = 0),
         |adm AS (
         |  SELECT m.doc_id FROM mem m CROSS JOIN g
         |  WHERE ${cosSql("m.embedding", "g.gvec")} <= 1.0),
         |e AS (
         |  SELECT d.doc_id AS src, d.doc_id + 3 AS dst FROM documents d
         |  JOIN adm ON adm.doc_id = d.doc_id + 3),
         |d0 AS (SELECT 0 AS node),
         |d1 AS (SELECT e.dst AS node FROM e JOIN d0 ON e.src = d0.node),
         |d2 AS (SELECT e.dst AS node FROM e JOIN d1 ON e.src = d1.node),
         |d3 AS (SELECT e.dst AS node FROM e JOIN d2 ON e.src = d2.node),
         |lv AS (
         |  SELECT node, 0 AS depth FROM d0
         |  UNION ALL SELECT node, 1 FROM d1
         |  UNION ALL SELECT node, 2 FROM d2
         |  UNION ALL SELECT node, 3 FROM d3),
         |mn AS (SELECT node, min(depth) AS depth FROM lv GROUP BY node)
         |SELECT CAST(node AS BIGINT) AS node, CAST(depth AS BIGINT) AS depth
         |FROM mn ORDER BY node""".stripMargin,

    "v11_distance_to_node" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT CAST(vec_id AS BIGINT) AS id,
        |  round(list_distance(CAST(embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS euclidean,
        |  round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS cosine
        |FROM embeddings CROSS JOIN q
        |WHERE vec_id BETWEEN 1 AND 10 ORDER BY id""".stripMargin,

    // Image rows are arithmetic: the 9×8 fixture's dHash was PAINTED to
    // equal (doc_id * 2654435761) % 2147483647; the gradient fixture sets
    // all 64 comparison bits (-1); PNG length is the stored-block formula
    // raw + 68 where raw = height * (1 + 3*width) (Png.encodedLength).
    "m1_multimodal" ->
      """WITH h AS (
        |  SELECT doc_id, length(text) AS n_bytes,
        |    list_reduce([CAST(0 AS BIGINT)] ||
        |      list_transform(str_split(text, ''), c -> CAST(ord(c) AS BIGINT)),
        |      (acc, x) -> (acc * 31 + x) % 2147483647) AS ph,
        |    16 + doc_id % 7 AS gw
        |  FROM documents WHERE doc_id < 100)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 8 * (1 + 3 * 9) + 68
        |            WHEN doc_id % 4 = 3 THEN 12 * (1 + 3 * gw) + 68
        |            ELSE n_bytes END AS BIGINT) AS n_bytes,
        |  CASE WHEN doc_id % 4 = 2 THEN (doc_id * 2654435761) % 2147483647
        |       WHEN doc_id % 4 = 3 THEN CAST(-1 AS BIGINT)
        |       ELSE ph END AS phash,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 9
        |            WHEN doc_id % 4 = 3 THEN gw
        |            ELSE 64 + ph % 512 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 8
        |            WHEN doc_id % 4 = 3 THEN 12
        |            ELSE 64 + (ph // 512) % 512 END AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  CASE WHEN doc_id % 4 >= 2 THEN 'png'
        |       WHEN ph % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
        |FROM h ORDER BY doc_id""".stripMargin,

    // Audio rows are arithmetic: the painted square-wave WAV's energy-
    // difference fingerprint equals ((doc_id+13)*2654435761) % 2147483647
    // by construction; WAV byte length is the canonical-header formula
    // 44 + 2*channels*frames (Wav.encodedLength); the 64-frame stereo clip
    // is too short for an envelope (fingerprint 0) but has true duration.
    "m2_audio" ->
      """WITH h AS (
        |  SELECT doc_id, length(text) AS n_chars,
        |    list_reduce([CAST(0 AS BIGINT)] ||
        |      list_transform(str_split(text, ''), c -> CAST(ord(c) AS BIGINT)),
        |      (acc, x) -> (acc * 31 + x) % 2147483647) AS ph,
        |    65 * (16 + doc_id % 5) AS nf,
        |    16000 + (doc_id % 4) * 4000 AS rate
        |  FROM documents WHERE doc_id < 100)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 44 + 2 * nf
        |            WHEN doc_id % 3 = 1 THEN 44 + 2 * 2 * 64
        |            ELSE n_chars END AS BIGINT) AS n_bytes,
        |  CASE WHEN doc_id % 3 = 0 THEN ((doc_id + 13) * 2654435761) % 2147483647
        |       WHEN doc_id % 3 = 1 THEN CAST(0 AS BIGINT)
        |       ELSE ph END AS fingerprint,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 8000
        |            WHEN doc_id % 3 = 1 THEN rate ELSE 0 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1
        |            WHEN doc_id % 3 = 1 THEN 2 ELSE 0 END AS INT) AS channels,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN nf
        |            WHEN doc_id % 3 = 1 THEN 64 ELSE 0 END AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN nf * 1000 // 8000
        |            WHEN doc_id % 3 = 1 THEN 64000 // rate ELSE 0 END AS BIGINT) AS duration_ms,
        |  CASE WHEN doc_id % 3 <= 1 THEN 'wav' ELSE 'unknown' END AS format
        |FROM h ORDER BY doc_id""".stripMargin,

    // Video rows are arithmetic end-to-end: painted frames dHash to
    // ((doc_id*31 + f + 7)*2654435761) % 2^31-1, the per-bit majority over
    // sampled frames f ∈ {0,3,...} is recomputed bit-by-bit (31 terms —
    // targets are mod 2^31, higher bits never reach majority), byte length
    // is the canonical-container formula 224 + nFrames*(8 + rowBytes*h)
    // (Avi.encodedLength), and the gradient clip hashes every frame to -1.
    "m3_video" ->
      s"""WITH h AS (
         |  SELECT doc_id, length(text) AS n_chars,
         |    list_reduce([CAST(0 AS BIGINT)] ||
         |      list_transform(str_split(text, ''), c -> CAST(ord(c) AS BIGINT)),
         |      (acc, x) -> (acc * 31 + x) % 2147483647) AS ph,
         |    6 + doc_id % 5 AS nf,
         |    16 + doc_id % 7 AS gw
         |  FROM documents WHERE doc_id < 100),
         |vids AS (SELECT doc_id, nf FROM h WHERE doc_id % 4 = 0),
         |sf AS (SELECT doc_id, unnest(range(0, nf, 3)) AS f FROM vids),
         |fh AS (SELECT doc_id,
         |    ((doc_id * 31 + f + 7) * 2654435761) % 2147483647 AS t FROM sf),
         |maj AS (
         |  SELECT doc_id,
         |${(0 until 31).map(b =>
            s"    CAST(CASE WHEN 2 * sum((t >> $b) & 1) > count(*) " +
            s"THEN ${1L << b} ELSE 0 END AS BIGINT)").mkString(" +\n")}
         |      AS fp
         |  FROM fh GROUP BY doc_id)
         |SELECT CAST(h.doc_id AS BIGINT) AS doc_id,
         |  CAST(CASE WHEN h.doc_id % 4 = 0 THEN 224 + nf * 232
         |            WHEN h.doc_id % 4 = 1 THEN 224 + 4 * (8 + ((3 * gw + 3) // 4) * 4 * 12)
         |            ELSE n_chars END AS BIGINT) AS n_bytes,
         |  CASE WHEN h.doc_id % 4 = 0 THEN maj.fp
         |       WHEN h.doc_id % 4 = 1 THEN CAST(-1 AS BIGINT)
         |       ELSE ph END AS fingerprint,
         |  CASE WHEN h.doc_id % 4 = 0 THEN ((h.doc_id * 31 + 7) * 2654435761) % 2147483647
         |       WHEN h.doc_id % 4 = 1 THEN CAST(-1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS first_frame_hash,
         |  CAST(CASE WHEN h.doc_id % 4 = 0 THEN 9
         |            WHEN h.doc_id % 4 = 1 THEN gw ELSE 0 END AS INT) AS width,
         |  CAST(CASE WHEN h.doc_id % 4 = 0 THEN 8
         |            WHEN h.doc_id % 4 = 1 THEN 12 ELSE 0 END AS INT) AS height,
         |  CAST(CASE WHEN h.doc_id % 4 = 0 THEN nf
         |            WHEN h.doc_id % 4 = 1 THEN 4 ELSE 0 END AS BIGINT) AS n_frames,
         |  CAST(CASE WHEN h.doc_id % 4 = 0 THEN (nf + 2) // 3
         |            WHEN h.doc_id % 4 = 1 THEN 2 ELSE 0 END AS INT) AS n_sampled,
         |  CAST(CASE WHEN h.doc_id % 4 = 0 THEN nf * 100
         |            WHEN h.doc_id % 4 = 1 THEN 160 ELSE 0 END AS BIGINT) AS duration_ms,
         |  CASE WHEN h.doc_id % 4 <= 1 THEN 'avi' ELSE 'unknown' END AS format
         |FROM h LEFT JOIN maj ON maj.doc_id = h.doc_id
         |ORDER BY h.doc_id""".stripMargin
  )
}
