package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance weights (x34) and bigram-LM surprisal scoring (x36):
  * hand-computed expectations over tiny synthetic `documents` tables fed
  * through the REGISTERED queries (same code path the oracle checks).
  */
class LmPipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Write a tiny documents table and return its directory. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("lmspec").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x34_dsir: en-like raw docs keep, target-language docs are not scored") {
    // Target slice (en): tokens alpha alpha beta. Raw pool: doc 1 speaks
    // the target's vocabulary (keeps), doc 2 speaks its own (drops).
    val dir = docsDir(Seq(
      (0L, "alpha alpha beta", "en", "src0"),
      (1L, "alpha beta", "de", "src0"),
      (2L, "gamma gamma", "fr", "src0")))
    val out = graft.SparkEntry.queries("x34_dsir")(spark, dir)
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // en doc excluded
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // Hand-derived (no bucket collisions among 3 distinct tokens):
    // target ppm: alpha 2e6/3 = 666666, beta 333333, gamma 0
    // raw ppm:    alpha 1e6/4 = 250000, beta 250000, gamma 500000
    // diff:       alpha 416666, beta 83333, gamma -500000
    assert(byId(1L) === ((2L, 416666L + 83333L, true)))
    assert(byId(2L) === ((2L, -1000000L, false)))
  }

  test("x36_lm_surprisal: hand-computed bits and corpus-mean cut") {
    // LM slice = doc_id % 5 == 0 → doc 0 only: "a b a b".
    //   c12: (a,b)=2, (b,a)=1; c1: a=2, b=1; V=2.
    // doc 0 bigrams: (a,b)→(2+2)div(2+1)=1→0 bits ×2; (b,a)→(1+2)div(1+1)=1→0.
    // doc 1 "a b c": (a,b)→0 bits; (b,c)→(1+2)div(0+1)=3→1 bit.
    // corpus mean_milli = 1000*(0+1) div (3+2) = 200.
    val dir = docsDir(Seq(
      (0L, "a b a b", "en", "src0"),
      (1L, "a b c", "en", "src0")))
    val out = graft.SparkEntry.queries("x36_lm_surprisal")(spark, dir)
      .orderBy(col("doc_id")).collect()
    // (doc_id, n_bigrams, surprisal_bits, mean_milli, keep)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4))).toSeq === Seq(
      (0L, 3L, 0L, 0L, true),
      (1L, 2L, 1L, 500L, false)))
  }

  test("x36_lm_surprisal: single-token docs emit no row") {
    val dir = docsDir(Seq(
      (0L, "a b a b", "en", "src0"),
      (1L, "solo", "en", "src0")))
    val ids = graft.SparkEntry.queries("x36_lm_surprisal")(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids === Set(0L))
  }

  test("x34_dsir: OOV-free construction — every raw token has a raw bucket") {
    // The scorer joins raw tokens to the raw-keyed diff table INNER; by
    // construction every raw token's bucket exists, so n_tokens must equal
    // the doc's whitespace token count for every raw doc.
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("lang") =!= "en")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val out = graft.SparkEntry.queries("x34_dsir")(spark, dir)
      .select(col("doc_id"), col("n_tokens"))
    assert(out.join(docs, Seq("doc_id"))
      .filter(col("n_tokens") =!= col("n")).count() === 0L)
    assert(out.count() === docs.count())
  }
}
