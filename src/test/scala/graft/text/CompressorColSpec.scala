package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** compressCol (pure column math) must be output-identical to the Scala
  * reference implementation `Compressor.compress` — the UDF it replaced
  * applied compress() per row, so equality on a tricky corpus IS the
  * regression bar.
  */
class CompressorColSpec extends SparkSpec {

  private val samples = Seq(
    "The cat is not on the table",
    "I will do it if you ask",
    "a b",
    "",
    "  leading, (and) trailing!  ",
    "don't re-enter the room; it's off-limits",
    "The CAT Is ON THE Mat",       // casing preserved, stopwords any case
    "all of the things are here",  // 'all' important, 'of'/'the'/'are' safe
    "numbers 42 and 7-11 do count",
    "punct...only???",
    "è solo una prova, non il solito test",
    // supplementary-plane letters (mathematical double-struck X) — code
    // points, not UTF-16 chars, decide word membership on both paths
    "the 𝕏 factor is 𝕏𝕐 here")

  test("compressCol == compress on english samples") {
    val s = spark
    import s.implicits._
    val got = samples.toDF("t")
      .select(Compressor.compressCol(col("t")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === samples.map(Compressor.compress(_)))
  }

  test("compressCol == compress on italian samples") {
    val s = spark
    import s.implicits._
    val got = samples.toDF("t")
      .select(Compressor.compressCol(col("t"), "italian").as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === samples.map(Compressor.compress(_, "italian")))
  }

  test("null text compresses to empty string") {
    val s = spark
    import s.implicits._
    val got = Seq(Option.empty[String]).toDF("t")
      .select(Compressor.compressCol(col("t")).as("c"))
      .collect().head.getString(0)
    assert(got === "")
  }
}
