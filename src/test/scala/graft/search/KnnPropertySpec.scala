package graft.search

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based exact-kNN oracle (SURVEY §5 implication (b)): the engine's
  * top-k must equal a driver-side brute force on arbitrary corpora —
  * mirroring the reference's NumPy recall oracle
  * (`clients/python/stress_test_recall.py`) as properties instead of one
  * fixture. Raw ScalaCheck generators with fixed seeds (the scalatest
  * bridge isn't on the offline classpath); failures reproduce exactly.
  */
class KnnPropertySpec extends SparkSpec {

  import spark.implicits._

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(6, Gen.chooseNum(-5.0f, 5.0f)).map(_.toSeq)

  private val corpusGen: Gen[List[Seq[Float]]] =
    Gen.chooseNum(2, 24).flatMap(n => Gen.listOfN(n, vecGen))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    samples(g, n).foreach(body)

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 8)(body: (A, B) => Unit): Unit =
    (1 to n).foreach { i =>
      body(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    }

  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  private def bruteForce(corpus: List[Seq[Float]], q: Seq[Float], k: Int): Seq[Long] =
    corpus.zipWithIndex
      .map { case (v, i) =>
        val d = v.zip(q).map { case (a, b) => val t = a - b; t * t }.sum.toDouble
        (d, i.toLong)
      }
      .sortBy(identity)
      .take(k)
      .map(_._2)

  test("property: engine top-k ids == driver brute force (euclidean)") {
    forAll2(corpusGen, vecGen) { (corpus, q) =>
      whenever(corpus.nonEmpty) {
        val df = corpus.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "vector")
          .withColumn("vector", col("vector").cast("array<float>"))
        val k = math.min(5, corpus.size)
        val got = VectorSearch.topK(df, q, k, metric = "euclidean")
          .select("id").as[Long].collect().toSeq
        // Float-sum distance ties are broken by id on both sides; compare
        // as sets of (rounded distance bucket) via exact id sequence when
        // distances are distinct, else set equality.
        val want = bruteForce(corpus, q, k)
        assert(got.toSet == want.toSet || got == want,
          s"got=$got want=$want corpus=${corpus.size}")
      }
    }
  }

  test("property: batched top-k agrees with single-query top-k") {
    forAll(corpusGen) { corpus =>
      whenever(corpus.size >= 3) {
        val df = corpus.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "vector")
          .withColumn("vector", col("vector").cast("array<float>"))
        val queries = df.limit(2).select(col("id").as("qid"), col("vector").as("qvec"))
        val k = math.min(4, corpus.size)
        val batched = VectorSearch.topKBatch(df, queries, k, metric = "euclidean")
          .select("qid", "id", "rank").collect()
          .groupBy(_.getLong(0))
          .map { case (q, rows) => q -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
        val singles = queries.collect().map { r =>
          r.getLong(0) -> VectorSearch.topK(df, r.getSeq[Float](1), k, metric = "euclidean")
            .select("id").as[Long].collect().toSeq
        }.toMap
        assert(batched == singles)
      }
    }
  }

  test("property: int8 kernel == driver reference formula (dot/norms/clamp)") {
    import graft.functions.VectorFunctions
    forAll(Gen.listOfN(2, Gen.listOfN(8, Gen.chooseNum(-127, 127)))) { vs =>
      val Seq(a, b) = vs.map(_.map(_.toByte))
      def norm(v: Seq[Byte]): Float =
        math.sqrt(v.map(x => x.toLong * x.toLong).sum.toDouble).toFloat
      val expect = {
        val dot = a.zip(b).map { case (x, y) => x.toInt * y.toInt }.sum
        val (na, nb) = (norm(a), norm(b))
        if (na == 0f || nb == 0f) 1.0
        else 1.0 - math.max(-1.0, math.min(1.0, dot.toDouble / (na.toDouble * nb.toDouble)))
      }
      val df = Seq((a, b)).toDF("a", "b")
        .select(col("a").cast("array<tinyint>").as("a"),
          col("b").cast("array<tinyint>").as("b"))
        .select(VectorFunctions.int8CosineDistance(col("a"), col("b"),
          lit(norm(a)), lit(norm(b))).as("d"))
      assert(df.collect().head.getDouble(0) == expect)
    }
    // zero-norm vector → max distance 1.0 (hnsw_index.go:309-311)
    val z = Seq((Seq.fill(4)(0.toByte), Seq[Byte](1, 2, 3, 4))).toDF("a", "b")
      .select(col("a").cast("array<tinyint>").as("a"),
        col("b").cast("array<tinyint>").as("b"))
      .select(graft.functions.VectorFunctions.int8CosineDistance(
        col("a"), col("b"), lit(0f), lit(math.sqrt(30.0).toFloat)).as("d"))
    assert(z.collect().head.getDouble(0) == 1.0)
  }

  test("property: quantizer round-trip error bounded by half a code step") {
    forAll(Gen.listOfN(12, Gen.chooseNum(-3.0f, 3.0f))) { values =>
      whenever(values.exists(_ != 0f)) {
        val df = Seq((1L, values)).toDF("id", "embedding")
          .withColumn("embedding", col("embedding").cast("array<float>"))
        val am = Quantizer.train(df, "embedding")
        val absMax = am.collect().head.getDouble(0)
        val row = Quantizer.quantizeVectors(df, "embedding", am)
          .select(col("qcodes"), col("absmax")).collect().head
        val codes = row.getSeq[Long](0)
        val step = absMax / 127.0
        values.map(_.toDouble).zip(codes).foreach { case (x, q) =>
          val deq = q / 127.0 * absMax
          if (math.abs(x) <= absMax) // inside range: round-off only
            assert(math.abs(x - deq) <= step / 2 + 1e-9, s"x=$x deq=$deq")
          else // clipped
            assert(math.abs(q) === 127L)
        }
      }
    }
  }
}
