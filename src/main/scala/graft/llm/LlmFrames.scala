package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prompt-frame builders for every LLM seam — the exact, ordered input a
  * real model would receive where [[StubLlm]] stands in today.
  *
  * The reference assembles these prompts imperatively right before its LLM
  * calls (contradiction judge `pkg/cognitive/gardener.go:2320-2400`,
  * preference synthesis `:3418-3480`, core-fact extraction `:3766-3800`,
  * evolution narrative `:3050-3100`, compile fields
  * `pkg/compiler/compiler.go:180-240`, HyDe/CQR `internal/rag/proxy.go:
  * 342-359`). Here each frame is a DataFrame transform over the SAME
  * deterministic candidate seams the oracle-checked queries use
  * ([[graft.analytics.Gardener.preferenceCandidates]],
  * [[graft.analytics.Gardener.coreFactCandidates]],
  * [[graft.compiler.Compiler.compileSnippets]]), so a refactor that
  * changes what a real LLM would see breaks LlmFrameGoldenSpec's pinned
  * golden frames instead of drifting silently.
  *
  * Ordering inside a frame is always explicit (sort_array / array_sort on
  * a (key, …) struct) — prompt text must not depend on partitioning.
  */
object LlmFrames {

  /** Numbered list body: "1. a\n2. b\n…" from an already-ordered array.
    * Empty-array guard matters: sequence(1, 0) counts DOWN, which would
    * zip garbage rather than produce an empty list.
    */
  private def numbered(ordered: Column): Column =
    when(size(ordered) === 0, lit(""))
      .otherwise(array_join(
        zip_with(sequence(lit(1), size(ordered)), ordered,
          (i, v) => concat(i.cast("string"), lit(". "), v)),
        "\n"))

  /** C8 — contradiction judge: one frame per candidate pair, the positive
    * and negative sides' bodies in fixed (A, B) order.
    * `cands`: (entity, pos_mem, neg_mem); `bodies`: (mem_id, body).
    */
  def contradictionFrames(cands: DataFrame, bodies: DataFrame): DataFrame =
    cands
      .join(bodies.select(col("mem_id").as("pos_mem"),
        col("body").as("pos_body")), Seq("pos_mem"))
      .join(bodies.select(col("mem_id").as("neg_mem"),
        col("body").as("neg_body")), Seq("neg_mem"))
      .select(col("entity").as("frame_id"),
        concat(
          lit("contradiction_judge entity="), col("entity"),
          lit("\nA["), col("pos_mem").cast("string"), lit("]: "),
          col("pos_body"),
          lit("\nB["), col("neg_mem").cast("string"), lit("]: "),
          col("neg_body")).as("prompt"))

  /** C8 similarity seam — the judge's user prompt for one candidate pair
    * from [[graft.analytics.Gardener.contradictionCandidates]], exactly
    * the reference's format (`gardener.go:1408`):
    * `Memory A (from <yyyy-MM-dd>): <contentA>\nMemory B (from ...): <contentB>`.
    * `pairs`: (src_mem, dst_mem, ...); `mem`: (mem_id, content, created_at
    * epoch seconds).
    */
  def contradictionPairFrames(pairs: DataFrame, mem: DataFrame): DataFrame = {
    // UTC calendar date via pure day arithmetic on DateType, which carries
    // no timezone — unlike date_format(timestamp), whose rendering follows
    // spark.sql.session.timeZone, this cannot shift across day boundaries
    // in a non-UTC session (floor handles pre-epoch seconds correctly).
    def side(key: String, as: String) = mem.select(
      col("mem_id").as(key), col("content").as(s"${as}_body"),
      date_add(to_date(lit("1970-01-01")),
        floor(col("created_at") / 86400L).cast("int")).cast("string")
        .as(s"${as}_date"))
    pairs
      .join(side("src_mem", "a"), Seq("src_mem"))
      .join(side("dst_mem", "b"), Seq("dst_mem"))
      .select(
        concat(col("src_mem").cast("string"), lit(":"),
          col("dst_mem").cast("string")).as("frame_id"),
        concat(lit("Memory A (from "), col("a_date"), lit("): "),
          col("a_body"),
          lit("\nMemory B (from "), col("b_date"), lit("): "),
          col("b_body")).as("prompt"))
  }

  /** C13 — preference synthesis: one frame per user, that user's candidate
    * contents numbered in (content, …) sorted order.
    * `candidates`: [[graft.analytics.Gardener.preferenceCandidates]] output
    * — (user_id, content, …).
    */
  def preferenceFrames(candidates: DataFrame): DataFrame =
    candidates.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("content"))).as("cs"))
      .select(col("user_id").cast("string").as("frame_id"),
        concat(lit("user_preferences user="), col("user_id"),
          lit("\n"), numbered(col("cs"))).as("prompt"))

  /** C14 — core-fact extraction: one frame per group, member bodies
    * numbered in mem_id order.
    * `candidates`: [[graft.analytics.Gardener.coreFactCandidates]] output
    * — (group_id, mem_id, body).
    */
  def coreFactFrames(candidates: DataFrame): DataFrame =
    candidates.groupBy(col("group_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("mem_id"), col("body")))),
        e => e.getField("body")).as("bs"))
      .select(col("group_id").as("frame_id"),
        concat(lit("core_facts group="), col("group_id"),
          lit("\n"), numbered(col("bs"))).as("prompt"))

  /** C15 — evolution narrative: one frame per root, its snapshots in the
    * chronological label order the snapshot pass used (NOT alphabetical).
    * `snapshots`: [[graft.analytics.Gardener.knowledgeEvolution]] output —
    * (root, snap, in_degree, n_connected, …).
    */
  def evolutionFrames(
      snapshots: DataFrame,
      snapOrder: Seq[String] = Seq("past", "mid", "now")): DataFrame = {
    val orderArr = array(snapOrder.map(lit): _*)
    snapshots
      .withColumn("snap_ord", array_position(orderArr, col("snap")))
      .groupBy(col("root"), col("in_degree"))
      .agg(transform(
        array_sort(collect_list(struct(col("snap_ord"), col("snap"),
          col("n_connected")))),
        e => concat(e.getField("snap"), lit(": connected="),
          e.getField("n_connected").cast("string"))).as("ls"))
      .select(col("root").as("frame_id"),
        concat(lit("knowledge_evolution root="), col("root"),
          lit(" in_degree="), col("in_degree").cast("string"),
          lit("\n"), array_join(col("ls"), "\n")).as("prompt"))
  }

  /** K3 — LLM field compile: one frame for the field, source snippets
    * numbered in rank order.
    * `nodes`: the compile source rows (rank, content) — filtered through
    * [[graft.compiler.Compiler.compileSnippets]], the same seam the
    * model-less fallback aggregates.
    */
  def compileFrames(nodes: DataFrame, fieldName: String,
      fieldType: String): DataFrame =
    graft.compiler.Compiler.compileSnippets(nodes)
      .agg(transform(
        array_sort(collect_list(struct(col("rank"), col("content")))),
        e => e.getField("content")).as("cs"))
      .select(lit(fieldName).as("frame_id"),
        concat(lit(s"compile field=$fieldName type=$fieldType"),
          lit("\n"), numbered(col("cs"))).as("prompt"))

  /** R5 — the CQR→HyDe prompt chain: exactly the two strings the rewrite
    * LLM sees, in call order. The second frame is built from the FIRST
    * call's completion, so the chain shape itself is pinned.
    */
  def r5Frames(query: String, history: String,
      llm: LlmClient = StubLlm): Seq[(String, String)] = {
    val cqrPrompt = s"cqr: $query | $history"
    val rewritten = llm.complete(cqrPrompt)
    Seq("cqr" -> cqrPrompt, "hyde" -> s"hyde: $rewritten")
  }
}
