package graft.compiler

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.StubLlm

/** Compiler unit behavior beyond the oracle queries. */
class CompilerSpec extends SparkSpec {

  import spark.implicits._

  private def nodes(rows: Seq[(String, Long, String)]) =
    rows.toDF("id", "rank", "content")

  test("K3 best-effort: string field takes the first snippet by rank") {
    val r = Compiler.bestEffort(
      nodes(Seq(("a", 2L, "second"), ("b", 1L, "first"), ("c", 3L, ""))),
      "string").collect().head
    assert(r.getString(0) === "first")
    assert(r.getDouble(1) === 0.4)
  }

  test("K3 best-effort: array field joins all snippets in rank order") {
    val r = Compiler.bestEffort(
      nodes(Seq(("a", 2L, "s2"), ("b", 1L, "s1"))), "array").collect().head
    assert(r.getString(0) === "s1|s2")
  }

  test("K3 best-effort: no snippets → null value, zero confidence") {
    val r = Compiler.bestEffort(nodes(Seq(("a", 1L, ""))), "string")
      .collect().head
    assert(r.isNullAt(0) && r.getDouble(1) === 0.0)
  }

  test("stub LLM is deterministic and tagged") {
    val a = StubLlm.complete("summarize this")
    assert(a === StubLlm.complete("summarize this"))
    assert(a.startsWith("stub["))
  }

  test("K4 pruning keeps current + newest maxVersions-1 stale") {
    val arts = Seq(
      ("a", 0L, "stale", 100L), ("a", 1L, "stale", 200L),
      ("a", 2L, "stale", 300L), ("a", 3L, "current", 400L))
      .toDF("name", "version", "status", "compiled_at")
    val kept = Compiler.pruneVersions(arts, maxVersions = 3)
      .filter(col("kept")).select("version").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 2L, 3L))
  }
}
