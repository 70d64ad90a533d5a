package graft.text

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {

  private def profile(docs: Seq[(Long, String)]): Map[Long, Map[String, Any]] = {
    import spark.implicits._
    val df = Repetition.ngramRepetition(docs.toDF("doc_id", "text"), "doc_id", "text")
    val cols = df.columns
    df.collect().map { r =>
      r.getLong(0) -> cols.zipWithIndex.drop(1).map { case (c, i) => c -> r.get(i) }.toMap
    }.toMap
  }

  test("top-n-gram fraction: counts times chars over word chars") {
    // "a a a b": tot=4; top 2-gram "a a" x2, chars 2 -> 2*2/4 = 1.0 (capped
    // nowhere - top frac is not capped, 1.0 here exactly); top 3-gram all
    // unique, chars 3 -> 0.75; top 4-gram = whole doc -> 1.0; no 5-grams.
    val p = profile(Seq((1L, "a a a b")))(1L)
    assert(p("top_2gram_frac") === 1.0)
    assert(p("top_3gram_frac") === 0.75)
    assert(p("top_4gram_frac") === 1.0)
    assert(p("dup_5gram_frac") === 0.0)
    assert(p("passes") === false)
  }

  test("duplicated-n-gram fraction: every occurrence counted, capped at 1.0") {
    // 10 words, tot=10. 5-gram "x y z w v" occurs at pos 1 and 6 -> dup
    // chars 2*5=10 -> frac 1.0; 6-grams all unique -> 0.0. Top 2-gram
    // cnt=2 chars=2 -> 0.4.
    val p = profile(Seq((1L, "x y z w v x y z w v")))(1L)
    assert(p("dup_5gram_frac") === 1.0)
    assert(p("dup_6gram_frac") === 0.0)
    assert(p("top_2gram_frac") === 0.4)
    assert(p("passes") === false)
  }

  test("top gram ties on count break by chars (longest wins)") {
    // All 2-grams unique; the longest is "abc abc" (6 chars of 10).
    val p = profile(Seq((1L, "abc abc de de")))(1L)
    assert(p("top_2gram_frac") === 0.6)
  }

  test("short and gram-free docs score 0.0 and pass") {
    val ps = profile(Seq((1L, "solo"), (2L, "uv wx")))
    assert(ps(1L)("top_2gram_frac") === 0.0)
    assert(ps(1L)("passes") === true)
    // two words: one 2-gram (cnt 1, chars 4/4) -> top2 = 1.0, no 3-grams.
    assert(ps(2L)("top_2gram_frac") === 1.0)
    assert(ps(2L)("top_3gram_frac") === 0.0)
    assert(ps(2L)("passes") === false)
  }

  test("thresholds match the published Gopher battery") {
    assert(Repetition.Thresholds === Map(
      2 -> 0.20, 3 -> 0.18, 4 -> 0.16,
      5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10))
  }
}
