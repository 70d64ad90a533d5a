package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Gardener

/** Golden frames for every LLM-stub seam (C8/C13/C14/C15/K3/R5): pins the
  * EXACT prompt a real model would receive — ids and ordered fields — the
  * way StemmerSpec pins token output, so refactors of the deterministic
  * scaffolding can't silently change what the LLM sees.
  *
  * Inputs are tiny fixed literals (not sf-dependent): the point is exact
  * string equality on the frame text.
  */
class LlmFrameGoldenSpec extends SparkSpec {

  private def frames(df: DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("C8 golden: contradiction judge frames") {
    import spark.implicits._
    val cands = Seq(
      ("acme", 11L, 42L),
      ("globex", 7L, 9L)).toDF("entity", "pos_mem", "neg_mem")
    val bodies = Seq(
      (11L, "acme shipped a great release"),
      (42L, "acme outage was awful"),
      (7L, "globex won the deal"),
      (9L, "globex audit failed")).toDF("mem_id", "body")
    assert(frames(LlmFrames.contradictionFrames(cands, bodies)) === Map(
      "acme" -> ("contradiction_judge entity=acme\n" +
        "A[11]: acme shipped a great release\n" +
        "B[42]: acme outage was awful"),
      "globex" -> ("contradiction_judge entity=globex\n" +
        "A[7]: globex won the deal\n" +
        "B[9]: globex audit failed")))
  }

  test("C8 golden: similarity-seam judge frames (reference user-prompt format)") {
    import spark.implicits._
    val pairs = Seq((11L, 42L, 0.83)).toDF("src_mem", "dst_mem", "sim")
    // 2021-03-01T12:00:00Z and 2023-07-15T23:59:59Z — the date formats to
    // the reference's time.Unix(...).Format("2006-01-02").
    val mem = Seq(
      (11L, "the deploy failed on friday", 1614600000L),
      (42L, "the deploy succeeded on friday", 1689465599L))
      .toDF("mem_id", "content", "created_at")
    assert(frames(LlmFrames.contradictionPairFrames(pairs, mem)) === Map(
      "11:42" -> ("Memory A (from 2021-03-01): the deploy failed on friday\n" +
        "Memory B (from 2023-07-15): the deploy succeeded on friday")))
  }

  test("C13 golden: preference synthesis frames over the candidate seam") {
    import spark.implicits._
    val mem = Seq(
      (1L, Seq("user_interaction"), "likes terse answers"),
      (1L, Seq("observation"), "asked about scala twice"),
      (1L, Seq("note"), "EXCLUDED wrong tag"),
      (2L, Seq("observation"), ""),               // excluded: empty content
      (2L, Seq("user_interaction"), "prefers dark mode"))
      .toDF("user_id", "tags", "content")
    assert(frames(LlmFrames.preferenceFrames(
      Gardener.preferenceCandidates(mem))) === Map(
      "1" -> ("user_preferences user=1\n" +
        "1. asked about scala twice\n2. likes terse answers"),
      "2" -> "user_preferences user=2\n1. prefers dark mode"))
  }

  test("C14 golden: core-fact frames over the candidate seam") {
    import spark.implicits._
    // Exercises: fallback chain (content→text→summary), archived exclusion,
    // processed exclusion, null-user solo group, numbered mem_id order.
    val mem = Seq(
      (1L, "u1", "user_interaction", "semantic", false, false,
        "c1", "", "", ""),
      (2L, "u1", "user_interaction", "semantic", false, false,
        "", "t2", "", ""),
      (3L, "u1", "user_interaction", "semantic", true, false,
        "c3", "", "", ""),                         // archived: excluded
      (4L, "u1", "user_interaction", "semantic", false, true,
        "c4", "", "", ""),                         // processed: excluded
      (5L, null, "note", "episodic", false, false,
        "", "", "s5", ""))
      .toDF("mem_id", "user_id", "typ", "layer", "archived", "processed",
        "content", "text", "summary", "description")
    assert(frames(LlmFrames.coreFactFrames(
      Gardener.coreFactCandidates(mem))) === Map(
      "user:u1" -> "core_facts group=user:u1\n1. c1\n2. t2",
      "solo:5" -> "core_facts group=solo:5\n1. s5"))
  }

  test("C15 golden: evolution narrative frames in chronological snap order") {
    import spark.implicits._
    // A hub with in-degree 15 (the minDegree floor) whose neighborhood
    // grows over the three snapshots.
    val now = 100L * 86400
    val hubEdges = (1 to 15).map(i =>
      (s"m$i", "supp:hub", (70L + i) * 86400, None: Option[Long]))
    val edges = (hubEdges ++ Seq(
      ("m1", "m16", 95L * 86400, None),            // 2nd hop, "now" only
      ("supp:hub", "m17", 60L * 86400, Some(80L * 86400))))  // deleted mid
      .toDF("src", "dst", "created_at", "deleted_at")
    val snaps = Gardener.knowledgeEvolution(
      edges, _.startsWith("supp:"), now)
    val f = frames(LlmFrames.evolutionFrames(snaps))
    assert(f.keySet === Set("supp:hub"))
    // past = now-30d = day 70: no spokes yet, but the m17 edge (created
    // day 60, deleted day 80) is active → connected=1; mid = day 85: all
    // 15 spokes (created days 71-85), m17 already deleted, m16 edge not
    // yet → 15; now-1d = day 99: 15 spokes + m16 via the m1 second hop.
    assert(f("supp:hub") ===
      "knowledge_evolution root=supp:hub in_degree=15\n" +
        "past: connected=1\nmid: connected=15\nnow: connected=16")
  }

  test("K3 golden: compile frames number snippets in rank order") {
    import spark.implicits._
    val nodes = Seq(
      (2L, "beta snippet"), (1L, "alpha snippet"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("rank", "content")
    assert(frames(LlmFrames.compileFrames(nodes, "summary", "string")) ===
      Map("summary" ->
        "compile field=summary type=string\n1. alpha snippet\n2. beta snippet"))
  }

  test("R5 golden: the CQR→HyDe prompt chain") {
    val f = LlmFrames.r5Frames(
      "how do tables merge during a compaction query",
      "user asked about merge strategies")
    assert(f.map(_._1) === Seq("cqr", "hyde"))
    assert(f.head._2 ===
      "cqr: how do tables merge during a compaction query | user asked about merge strategies")
    // The hyde frame embeds the stub's completion of the cqr frame — the
    // chain (second call consumes first completion) is part of the pin.
    assert(f.last._2 === "hyde: " + StubLlm.complete(f.head._2))
    assert(f.last._2.startsWith("hyde: stub["))
  }
}
