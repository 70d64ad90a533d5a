package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQL registration must be value-identical to the Column API — every
  * registered function is exercised through `spark.sql` against its
  * Column-API twin on the same rows.
  */
class GraftFunctionRegistrySpec extends SparkSpec {

  GraftFunctionRegistry.register(spark)

  private lazy val t = {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1f, 2f, 3f, 4f), Seq(4f, 3f, 2f, 1f), "running foxes jumped"),
      (2L, Seq(0.5f, -1f, 2f, 0f), Seq(1f, 1f, 1f, 1f), "the cats are sleeping"))
      .toDF("id", "a", "b", "text")
    df.createOrReplaceTempView("vt")
    df
  }

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql FROM vt WHERE id = 1").collect().head.get(0)

  test("vector kernels match the Column API through SQL") {
    t
    val viaCol = t.filter(col("id") === 1).select(
      VectorFunctions.cosineDistance(col("a"), col("b")),
      VectorFunctions.euclideanSq(col("a"), col("b")),
      VectorFunctions.dotProduct(col("a"), col("b")),
      VectorFunctions.normalize(col("a"))).collect().head
    assert(one("vec_cosine_distance(a, b)") === viaCol.get(0))
    assert(one("vec_euclidean_sq(a, b)") === viaCol.get(1))
    assert(one("vec_dot(a, b)") === viaCol.get(2))
    assert(one("vec_normalize(a)") === viaCol.get(3))
  }

  test("hashing / quantization kernels through SQL") {
    t
    val viaCol = t.filter(col("id") === 1).select(
      graft.dedup.Dedup.polyHash(col("text")),
      VectorFunctions.wordShingles(col("text"), 2),
      VectorFunctions.packSignBits(col("a")),
      F16.pack(col("a"))).collect().head
    assert(one("poly_hash(text)") === viaCol.get(0))
    assert(one("word_shingles(text, 2)") === viaCol.get(1))
    assert(one("pack_sign_bits(a)") === viaCol.get(2))
    assert(one("f16_pack(a)") === viaCol.get(3))
    assert(one("hamming_packed(pack_sign_bits(a), pack_sign_bits(b))") ===
      t.filter(col("id") === 1).select(
        VectorFunctions.hammingPacked(
          VectorFunctions.packSignBits(col("a")),
          VectorFunctions.packSignBits(col("b")))).collect().head.get(0))
    assert(one("f16_euclidean_sq(f16_pack(a), f16_pack(b))") ===
      t.filter(col("id") === 1).select(
        F16.euclideanSq(F16.pack(col("a")), F16.pack(col("b"))))
        .collect().head.get(0))
    assert(one("vec_dot(f16_unpack(f16_pack(a)), b)") ===
      t.filter(col("id") === 1).select(
        VectorFunctions.dotProduct(F16.unpack(F16.pack(col("a"))), col("b")))
        .collect().head.get(0))
  }

  test("stem and the top-k aggregate through SQL") {
    t
    val sqlStems = spark.sql(
      "SELECT transform(split(text, ' '), w -> stem(w, 'english')) " +
        "FROM vt WHERE id = 1").collect().head.getSeq[String](0)
    assert(sqlStems == Seq("running", "foxes", "jumped")
      .map(graft.text.EnglishStemmer.stem))
    val sqlTop = spark.sql(
      "SELECT explode(topk_by_distance(id, vec_euclidean_sq(a, b), 1)) FROM vt")
      .select("col.id", "col.rank").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(sqlTop.length == 1 && sqlTop.head._2 == 1)
  }

  test("literal-argument validation fails loudly") {
    t
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, id) FROM vt").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("GraftExtensions injects the same registry") {
    val ext = new SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must not throw
  }
}
