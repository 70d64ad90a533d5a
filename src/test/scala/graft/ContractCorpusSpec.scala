package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.compiler.Compiler
import graft.filter.FilterDsl
import graft.graph.GraphOps
import graft.memory.MemoryOps
import graft.oplog.Oplog
import graft.search.VectorSearch
import graft.streaming.Streams

/** The FULL cross-client contract corpus
  * (`testdata/api_contracts.json:1-547`), one test per case id, expressed
  * against the engine surfaces (ContractSpec holds the six load-bearing
  * regressions ported first; this file covers the rest). HTTP-protocol
  * details (status codes, auth) map to their engine-semantic analogue:
  * 200 → the operation's state change is observable in the folded views,
  * 409/400 → `Oplog.violations` flags the row, 404 → the folded view has
  * no row, 202 → the trigger fires asynchronously (ThinkScheduler).
  */
class ContractCorpusSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("seq", LongType), StructField("ts", LongType),
    StructField("op", StringType), StructField("index_name", StringType),
    StructField("id", StringType),
    StructField("vector", ArrayType(FloatType)),
    StructField("meta", MapType(StringType, StringType)),
    StructField("src", StringType), StructField("dst", StringType),
    StructField("rel", StringType), StructField("weight", DoubleType),
    StructField("payload", StringType)))

  private def log(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  private val Idx = "CONTRACT_TEST_IDX"
  private def vcreate(seq: Long, idx: String = Idx): Row =
    Row(seq, seq, "VCREATE", idx, null, null, null, null, null, null, null, null)
  private def vdrop(seq: Long, idx: String = Idx): Row =
    Row(seq, seq, "VDROP", idx, null, null, null, null, null, null, null, null)
  private def vadd(seq: Long, id: String, vec: Seq[Float],
      meta: Map[String, String], idx: String = Idx): Row =
    Row(seq, seq, "VADD", idx, id, vec, meta, null, null, null, null, null)
  private def vmeta(seq: Long, id: String, meta: Map[String, String]): Row =
    Row(seq, seq, "VMETA", Idx, id, null, meta, null, null, null, null, null)
  private def vdel(seq: Long, id: String): Row =
    Row(seq, seq, "VDEL", Idx, id, null, null, null, null, null, null, null)
  private def glink(seq: Long, s: String, d: String, rel: String): Row =
    Row(seq, seq, "GLINK", Idx, null, null, null, s, d, rel, 1.0, null)
  private def gunlink(seq: Long, s: String, d: String, rel: String): Row =
    Row(seq, seq, "GUNLINK", Idx, null, null, null, s, d, rel, null, null)
  private def config(seq: Long, op: String, p: String): Row =
    Row(seq, seq, op, Idx, null, null, null, null, null, null, null, p)

  /** The corpus flow on CONTRACT_TEST_IDX: create, config, rules, the four
    * adds (vec_1 / entity_1 / batch vec_2+vec_3), the mentions link + its
    * inverse, the set-properties VMETA, a reflection node.
    */
  private lazy val corpusLog: DataFrame = log(Seq(
    vcreate(1),
    config(2, "VCONFIG", """{"vacuum_interval":"300s"}"""),
    config(3, "VAUTOLINKS",
      """[{"metadata_field":"project_id","relation_type":"belongs_to"}]"""),
    vadd(10, "vec_1", Seq(0.1f, 0.2f, 0.3f, 0.4f),
      Map("content" -> "test memory", "type" -> "memory",
        "project_id" -> "proj_1")),
    vadd(11, "entity_1", Seq(0f, 0f, 0f, 0f),
      Map("name" -> "Python", "type" -> "entity", "entity_id" -> "entity_1")),
    vadd(12, "vec_2", Seq(0.15f, 0.25f, 0.35f, 0.45f),
      Map("content" -> "batch 1")),
    vadd(13, "vec_3", Seq(0.2f, 0.3f, 0.4f, 0.5f),
      Map("content" -> "batch 2")),
    vadd(14, "refl_1", Seq(0f, 0f, 0f, 1f),
      Map("type" -> "user_profile_insight", "content" -> "insight")),
    glink(20, "vec_1", "entity_1", "mentions"),
    glink(21, "entity_1", "vec_1", "mentioned_in"), // inverse_relation_type
    vmeta(30, "vec_1", Map("content" -> "updated test memory"))))

  private lazy val vstate: Map[String, Row] =
    Oplog.foldVectors(corpusLog).collect()
      .map(r => r.getString(r.fieldIndex("id")) -> r).toMap
  private lazy val estate: DataFrame = Oplog.foldEdges(corpusLog)

  private def metaOf(id: String): Map[String, String] = {
    val r = vstate(id)
    r.getMap[String, String](r.fieldIndex("meta")).toMap
  }
  private def aliveIds: Set[String] =
    vstate.filter(_._2.getBoolean(vstate.head._2.fieldIndex("alive"))).keySet

  /** Live (id, vector, type) view for the search cases. */
  private lazy val liveVectors: DataFrame =
    Oplog.foldVectors(corpusLog).filter(col("alive"))
      .select(col("id"), col("vector"),
        try_element_at(col("meta"), lit("type")).as("type"))

  test("healthz: engine liveness — session up, tables readable") {
    assert(graft.core.Tables.documents(spark, sf()).limit(1).count() == 1)
  }

  test("create_index: VCREATE lands in the catalog as existing") {
    val cat = Oplog.catalog(corpusLog).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("exists")).toMap
    assert(cat(Idx))
  }

  test("list_indexes: catalog lists CONTRACT_TEST_IDX") {
    assert(Oplog.catalog(corpusLog).select("index_name")
      .as[String].collect().contains(Idx))
  }

  test("get_index_info: name, existence, vector_count") {
    val n = Oplog.foldVectors(corpusLog)
      .filter(col("index_name") === Idx && col("alive")).count()
    assert(n == 5) // vec_1..3, entity_1, refl_1
  }

  test("add_vector: vector + metadata observable after replay") {
    assert(aliveIds.contains("vec_1"))
    val r = vstate("vec_1")
    assert(r.getSeq[Float](r.fieldIndex("vector")) ==
      Seq(0.1f, 0.2f, 0.3f, 0.4f))
    assert(metaOf("vec_1")("type") == "memory")
  }

  test("add_vector_entity: entity-typed metadata preserved verbatim") {
    assert(metaOf("entity_1") ==
      Map("name" -> "Python", "type" -> "entity", "entity_id" -> "entity_1"))
  }

  test("add_batch: both batch records land") {
    assert(Set("vec_2", "vec_3").subsetOf(aliveIds))
    assert(metaOf("vec_2")("content") == "batch 1")
  }

  test("get_vector: id, vector, metadata fields for a point read") {
    val row = Oplog.foldVectors(corpusLog)
      .filter(col("id") === "vec_1").select("id", "vector", "meta").collect()
    assert(row.length == 1 && !row.head.isNullAt(1) && !row.head.isNullAt(2))
  }

  test("get_vectors_batch: multi-id read returns exactly the asked set") {
    val got = Oplog.foldVectors(corpusLog)
      .filter(col("id").isin("vec_1", "vec_2"))
      .select("id").as[String].collect().toSet
    assert(got == Set("vec_1", "vec_2"))
  }

  test("search_vector: k-NN over the live state, self is nearest") {
    val hits = VectorSearch.topK(liveVectors, Seq(0.1f, 0.2f, 0.3f, 0.4f),
      k = 5, metric = "euclidean").select("id").as[String].collect()
    assert(hits.nonEmpty && hits.head == "vec_1")
  }

  test("search_with_scores: results carry id + score, sorted ascending") {
    val rows = VectorSearch.topK(liveVectors, Seq(0.1f, 0.2f, 0.3f, 0.4f),
      k = 3).select(col("id"), col("distance")).collect()
    val dists = rows.map(_.getAs[Double]("distance")).toSeq
    assert(rows.length == 3 && dists == dists.sorted)
  }

  test("search_filter_only: empty query + filter returns filtered set") {
    val pred = FilterDsl.compile("type = 'memory'", liveVectors.schema)
    val got = liveVectors.filter(pred).select("id").as[String].collect().toSet
    assert(got == Set("vec_1"))
  }

  test("graph_link: edge + inverse edge active after replay") {
    val active = estate.filter(col("deleted_at").isNull)
      .select("src", "dst", "rel").as[(String, String, String)].collect().toSet
    assert(active.contains(("vec_1", "entity_1", "mentions")))
    assert(active.contains(("entity_1", "vec_1", "mentioned_in")))
  }

  test("get_links: targets of vec_1 via mentions contains entity_1") {
    val targets = GraphOps.outEdges(estate, "vec_1", Some("mentions"))
      .select("dst").as[String].collect()
    assert(targets.toSeq == Seq("entity_1"))
  }

  test("get_incoming: sources pointing at entity_1 via mentions") {
    val sources = GraphOps.inEdges(estate, "entity_1", Some("mentions"))
      .select("src").as[String].collect()
    assert(sources.toSeq == Seq("vec_1"))
  }

  test("get_all_relations: rel → sorted targets, both directions") {
    val rels = GraphOps.relations(estate, "vec_1").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getSeq[String](2)).toMap
    assert(rels(("mentions", "out")) == Seq("entity_1"))
    assert(rels(("mentioned_in", "in")) == Seq("entity_1"))
  }

  test("get_all_incoming: incoming relation map of entity_1") {
    val rels = GraphOps.relations(estate, "entity_1", "in").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(rels("mentions") == Seq("vec_1"))
  }

  test("extract_subgraph: root, nodes, edges of the depth-2 neighborhood") {
    val (nodes, edges) = GraphOps.subgraph(estate, "vec_1", depth = 2)
    val ns = nodes.select("node").as[String].collect().toSet
    assert(Set("vec_1", "entity_1").subsetOf(ns))
    assert(edges.count() >= 2)
  }

  test("find_path: shortest path vec_1 → entity_1 has length 1") {
    val d = GraphOps.shortestPaths(estate, "vec_1", rels = Seq("mentions"))
      .filter(col("node") === "entity_1")
      .select(col("hops").cast("long"), col("path")).collect()
    assert(d.length == 1 && d.head.getLong(0) == 1L)
    assert(d.head.getSeq[String](1) == Seq("vec_1", "entity_1"))
  }

  test("set_node_properties: VMETA merge updates the key") {
    assert(metaOf("vec_1")("content") == "updated test memory")
  }

  test("get_node_properties: untouched keys survive the merge") {
    assert(metaOf("vec_1")("type") == "memory")
    assert(metaOf("vec_1")("project_id") == "proj_1")
  }

  test("reinforce: _access_count += 1, _last_accessed = now for hit ids") {
    val out = MemoryOps.reinforce(
      liveVectors, "id", col("id") === "vec_1", now = 777.0)
      .select(col("id"), col("_access_count"), col("_last_accessed"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("vec_1").getDouble(1) == 1.0 && out("vec_1").getDouble(2) == 777.0)
    assert(out("vec_2").getDouble(1) == 0.0 && out("vec_2").isNullAt(2))
  }

  test("get_reflections: insight-typed nodes are listable") {
    val refl = Oplog.foldVectors(corpusLog).filter(col("alive") &&
        try_element_at(col("meta"), lit("type")).isin(
          "user_profile_insight", "knowledge_evolution", "core_fact"))
      .select("id").as[String].collect()
    assert(refl.toSeq == Seq("refl_1"))
  }

  test("cognitive_think: trigger accepted asynchronously (202 analogue)") {
    val sched = Streams.ThinkScheduler(writeThreshold = 5, minIntervalMs = 100)
    assert(sched.shouldThink(writesSinceLast = 5, lastThinkMs = 0, nowMs = 200))
    assert(!sched.shouldThink(writesSinceLast = 4, lastThinkMs = 0, nowMs = 200))
    assert(!sched.shouldThink(writesSinceLast = 9, lastThinkMs = 150, nowMs = 200))
  }

  test("save_snapshot: snapshot + tail reproduces live state") {
    val cut = 15L
    val compact = Oplog.snapshot(corpusLog, cut)
      .unionByName(corpusLog.filter(col("seq") > cut))
    val a = Oplog.foldVectors(corpusLog).filter(col("alive"))
      .select("id").as[String].collect().toSet
    val b = Oplog.foldVectors(compact).filter(col("alive"))
      .select("id").as[String].collect().toSet
    assert(a == b)
  }

  test("update_config: VCONFIG replays into the surviving config") {
    val cfg = Oplog.foldConfig(corpusLog).filter(col("op") === "VCONFIG")
      .select("payload").as[String].collect()
    assert(cfg.toSeq == Seq("""{"vacuum_interval":"300s"}"""))
  }

  test("set_auto_links: VAUTOLINKS replays into the surviving rule set") {
    val rules = Oplog.foldConfig(corpusLog).filter(col("op") === "VAUTOLINKS")
      .select("payload").as[String].collect()
    assert(rules.toSeq ==
      Seq("""[{"metadata_field":"project_id","relation_type":"belongs_to"}]"""))
  }

  test("get_auto_links: replayed rules derive the auto-link edges") {
    val links = Oplog.autoLinksFromLog(corpusLog)
      .select("src", "dst", "rel").as[(String, String, String)].collect().toSet
    assert(links == Set(("vec_1", "proj_1", "belongs_to")))
  }

  test("export_vectors: limit/offset page with has_more") {
    val page = Oplog.foldVectors(corpusLog).filter(col("alive"))
      .orderBy(col("id")).limit(3).select("id").as[String].collect()
    assert(page.length == 3 && page.toSeq == page.toSeq.sorted)
    val hasMore = Oplog.foldVectors(corpusLog).filter(col("alive")).count() > 3
    assert(hasMore) // 5 live records, page of 3
  }

  test("delete_vector: VDEL tombstones the record") {
    val l = log(Seq(vcreate(1),
      vadd(2, "gone", Seq(1f), Map()), vdel(3, "gone")))
    val alive = Oplog.foldVectors(l).filter(col("alive")).count()
    assert(alive == 0)
  }

  test("graph_unlink: GUNLINK closes the open edge version") {
    val l = log(Seq(vcreate(1),
      glink(2, "a", "b", "r"), gunlink(3, "a", "b", "r")))
    val e = Oplog.foldEdges(l).collect().head
    assert(e.getLong(e.fieldIndex("deleted_at")) == 3L)
  }

  test("embedder_status: deterministic embedder is live and stable") {
    val e = Seq("same content", "same content", "other").toDF("text")
      .select(Streams.hashEmbedding(col("text"), 8).as("v"))
      .collect().map(_.getSeq[Float](0))
    assert(e(0) == e(1) && e(0) != e(2) && e(0).length == 8)
  }

  test("compile_entity_card: all template fields compile with confidence") {
    val nodes = Seq(
      ("entity_1", 0L, "Python", 100L, true, 2L, Seq("mentions")),
      ("vec_1", 1L, "test memory", 200L, false, 1L, Seq("mentions")))
      .toDF("id", "rank", "content", "created_at", "pinned",
        "relation_count", "relation_types")
    val card = Compiler.compileEntityCard(nodes).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(card.keySet == Compiler.EntityCardTemplate.map(_._1).toSet)
    assert(card("name")._1 == "Python" && card("node_count")._1 == "2")
    assert(card.values.forall(_._2 > 0.0))
  }

  test("list_compile_templates: built-in template registry is exposed") {
    val fields = Compiler.EntityCardTemplate
    assert(fields.nonEmpty && fields.map(_._1).contains("core_facts"))
    assert(fields.toMap.apply("node_count") == "computed")
  }

  test("list_artifacts: artifacts listable per index") {
    val arts = Seq(("entity_card", 1L, "stale", 100L),
        ("entity_card", 2L, "current", 200L))
      .toDF("name", "version", "status", "compiled_at")
    val kept = Compiler.pruneVersions(arts, maxVersions = 3)
      .filter(col("kept")).select("name").as[String].collect()
    assert(kept.length == 2 && kept.forall(_ == "entity_card"))
  }

  test("get_artifact: current version resolvable with name + version") {
    val arts = Seq(("entity_card", 1L, "stale", 100L),
        ("entity_card", 2L, "current", 200L))
      .toDF("name", "version", "status", "compiled_at")
    val cur = Compiler.pruneVersions(arts, maxVersions = 3)
      .filter(col("status") === "current").collect()
    assert(cur.length == 1 && cur.head.getLong(1) == 2L)
  }

  test("delete_index: VDROP removes the index from the catalog") {
    val l = log(Seq(vcreate(1), vadd(2, "v", Seq(1f), Map()), vdrop(3)))
    val cat = Oplog.catalog(l).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("exists")).toMap
    assert(!cat(Idx))
  }

  test("get_index_not_found: reads after drop see nothing (404 analogue)") {
    val l = log(Seq(vcreate(1), vadd(2, "v", Seq(1f), Map()), vdrop(3)))
    assert(Oplog.foldVectors(l).count() == 0)
  }

  test("create_bugfix_index + delete_bugfix_index: scratch index lifecycle") {
    val l = log(Seq(vcreate(1, "BUGFIX_TEST_IDX"),
      vadd(2, "x", Seq(1f), Map(), idx = "BUGFIX_TEST_IDX"),
      vdrop(3, "BUGFIX_TEST_IDX"), vcreate(4, "BUGFIX_TEST_IDX")))
    val cat = Oplog.catalog(l).collect().head
    assert(cat.getAs[Boolean]("exists")) // recreated clean
    assert(Oplog.foldVectors(l).count() == 0) // history erased
  }

  test("vadd_duplicate_returns_409_conflict: second live add is flagged") {
    val l = log(Seq(vcreate(1),
      vadd(2, "dup", Seq(1f), Map("v" -> "1")),
      vadd(3, "dup", Seq(1f), Map("v" -> "2"))))
    val v = Oplog.violations(l).collect()
    assert(v.map(r => (r.getLong(0), r.getString(3))).toSet ==
      Set((3L, "duplicate_add")))
  }

  test("search_nodes_returns_metadata: every node row has id + properties") {
    val rows = Oplog.foldVectors(corpusLog).filter(col("alive"))
      .select("id", "meta").limit(10).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
  }

  // --- validation-limit cases the corpus encodes implicitly
  //     (ops.go:1438 dimension check, core.go:1398-1516 type dispatch) ---

  test("add_batch_dimension_mismatch_rejected: wrong-dim rows are counted out") {
    val batch = Seq(("a", Seq(1f, 2f, 3f, 4f)), ("b", Seq(1f, 2f)),
      ("c", Seq(4f, 3f, 2f, 1f))).toDF("id", "vector")
    val counts = batch
      .withColumn("ok", size(col("vector")) === 4)
      .agg(sum(when(col("ok"), 1L).otherwise(0L)).as("n_imported"),
        sum(when(!col("ok"), 1L).otherwise(0L)).as("n_rejected"))
      .collect().head
    assert(counts.getLong(0) == 2 && counts.getLong(1) == 1)
  }

  test("metadata_unsupported_type_skipped: non-indexable keys act as missing") {
    // core.go:1398-1516: string/bool/float/array metadata is indexed;
    // anything else hits `default: continue` — the key simply never enters
    // an index. The filter compiler mirrors that: an unindexed key matches
    // nothing under '=' / ranges, everything under '!=' (F4 semantics).
    val df = Seq((1L, "m", Seq("x", "y")), (2L, "e", Seq.empty[String]))
      .toDF("id", "type", "tags")
    assert(df.filter(FilterDsl.compile("nested = 'v'", df.schema)).count() == 0)
    assert(df.filter(FilterDsl.compile("nested != 'v'", df.schema)).count() == 2)
    assert(df.filter(FilterDsl.compile("nested > 3", df.schema)).count() == 0)
    // while indexable types still bind
    assert(df.filter(FilterDsl.compile("tags = 'x'", df.schema)).count() == 1)
  }
}
