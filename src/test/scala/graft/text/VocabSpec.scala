package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The x15 vocabulary stats ship two paths: exact `count_distinct`
  * (oracle-checked) and the HLL sketch `approx_count_distinct` — the
  * 100 TB default, whose map-side sketch merge replaces the exact
  * count's (source, token) shuffle. The sketch has no DuckDB twin, so
  * its accuracy contract lives here: within 5% of exact on a skewed
  * vocabulary, at the default rsd.
  */
class VocabSpec extends SparkSpec {

  test("approx_count_distinct tracks exact vocabulary within 5%") {
    import spark.implicits._
    // Zipf-ish: token rank r appears ~N/r times; ~3k distinct tokens.
    val docs = (0 until 3000).flatMap { r =>
      Seq.fill(math.max(1, 3000 / (r + 1)))(s"tok$r")
    }.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val row = toks.agg(
      count_distinct(col("tok")).as("exact"),
      approx_count_distinct(col("tok")).as("approx")).collect().head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
