package graft.memory

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mirrors `pkg/engine/epistemic_test.go` edge cases. */
class EpistemicSpec extends SparkSpec {

  import spark.implicits._

  private def nodes(rows: Seq[(Long, Seq[Float], Double, Int, Boolean)]): DataFrame =
    rows.toDF("id", "vector", "created_at", "access_count", "is_historical")
      .withColumn("vector", col("vector").cast("array<float>"))

  private def edges(rows: Seq[(String, Long, String, Long, Option[Long])]): DataFrame =
    rows.toDF("src", "dst", "rel", "created_at", "deleted_at")

  private val noEdges = edges(Seq.empty)
  private def q(v: Seq[Float]): DataFrame =
    Seq(Tuple1(v)).toDF("qvec").withColumn("qvec", col("qvec").cast("array<float>"))

  private val now = 1000000.0

  test("single candidate → consensus 1, variance 0") {
    val r = Epistemic.beliefState(
      nodes(Seq((1L, Seq(1f, 0f), now - 86400, 0, false))),
      noEdges, q(Seq(1f, 0f)), k = 5, now = now).collect().head
    assert(r.getAs[Double]("consensus") === 1.0)
    assert(r.getAs[Double]("variance") === 0.0)
    assert(r.getAs[Long]("contradictions") === 0L)
    assert(r.getAs[String]("state") != null)
  }

  test("identical vectors → consensus 1 (maxVar epsilon path)") {
    val v = Seq(0.6f, 0.8f)
    val r = Epistemic.beliefState(
      nodes(Seq((1L, v, now - 3600, 5, false), (2L, v, now - 7200, 3, false),
        (3L, v, now - 1800, 1, false))),
      noEdges, q(v), k = 5, now = now).collect().head
    assert(r.getAs[Double]("consensus") === 1.0)
  }

  test("historical nodes excluded from pillars") {
    val r = Epistemic.beliefState(
      nodes(Seq(
        (1L, Seq(1f, 0f), now - 3600, 0, false),
        (2L, Seq(1f, 0f), now - 3600, 0, true))), // historical twin
      noEdges, q(Seq(1f, 0f)), k = 5, now = now).collect().head
    assert(r.getAs[Long]("n_sources") === 1L)
  }

  test("friction floors at 0 and forces contested state") {
    val e = edges((1 to 6).map(i => (s"x$i", 1L, "invalidates", 0L, None)))
    val r = Epistemic.beliefState(
      nodes(Seq((1L, Seq(1f, 0f), now - 3600, 0, false))),
      e, q(Seq(1f, 0f)), k = 5, now = now).collect().head
    assert(r.getAs[Double]("friction") === 0.0) // 1 - 6*0.5 clamped
    assert(r.getAs[Long]("invalidations") === 6L)
    assert(r.getAs[String]("state") === "contested")
  }

  test("soft-deleted negative edges don't count at now") {
    val e = edges(Seq(("x", 1L, "contradicts", 0L, Some(500000L))))
    val r = Epistemic.beliefState(
      nodes(Seq((1L, Seq(1f, 0f), now - 3600, 0, false))),
      e, q(Seq(1f, 0f)), k = 5, now = now).collect().head
    assert(r.getAs[Long]("contradictions") === 0L)
    assert(r.getAs[Double]("friction") === 1.0)
  }

  test("ebbinghaus stability: higher access count decays slower") {
    val age = 40.0 * 24 * 3600 // 40 days
    def stab(access: Int): Double = Epistemic.beliefState(
      nodes(Seq((1L, Seq(1f, 0f), now - age, access, false))),
      noEdges, q(Seq(1f, 0f)), k = 5, now = now)
      .collect().head.getAs[Double]("stability")
    assert(stab(10) > stab(0))
    val expected = math.exp(-age / (Epistemic.BaseHalfLife * (1.0 + math.log1p(10))))
    assert(math.abs(stab(10) - expected) < 1e-12)
  }

  test("evolution chain follows superseded_by only while edges are live") {
    val e = edges(Seq(
      ("a", 0L, "superseded_by", 0L, None),
      ("b", 0L, "superseded_by", 0L, None)))
      .withColumn("dst", when(col("src") === "a", "b").otherwise("c"))
    val roots = Seq("a").toDF("root")
    val chain = Epistemic.evolutionChain(e, roots, maxDepth = 4)
      .orderBy("pos").collect()
    assert(chain.map(_.getAs[String]("node")).toSeq === Seq("a", "b", "c"))
    assert(chain.map(_.getAs[Long]("pos")).toSeq === Seq(0L, 1L, 2L))
  }
}
