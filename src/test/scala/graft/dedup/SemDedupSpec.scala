package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup semantics (arXiv:2303.09540): duplicate groups inside embedding
  * clusters keep exactly one survivor — the member with the LOWEST cosine
  * to its cluster centroid (the informative outlier). The vectors below are
  * built so every hyperplane dot sits far from zero: the perturbed member
  * stays in the base vectors' sign bucket (margins ≥ 5 against weight ±7
  * per unit of perturbation) while `-w` lands elsewhere / pairs with
  * nothing.
  */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  private val v = Array(10f, 10f, 10f, 5f)
  private val w = Array(10f, 10f, 11.5f, 5f) // cos(v, w) ≈ 0.9978

  test("survivor is the member furthest from the cluster centroid") {
    val emb = Seq(
      (1L, v.toSeq), (2L, v.toSeq), (3L, w.toSeq),
      (4L, w.map(-_).toSeq) // opposite direction: singleton, never emitted
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

    val out = Dedup.semDedup(emb, "vec_id", "embedding", threshold = 0.9)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("component") === 1L)
    assert(r.getAs[Long]("n_members") === 3L)
    // centroid ≈ (10, 10, 10.5, 5): cos(v,·) ≈ 0.99969 > cos(w,·) ≈ 0.99905
    assert(r.getAs[Long]("survivor") === 3L)
    assert(r.getAs[Double]("centroid_sim") < 1.0)
  }

  test("output is invariant to input partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0L until 60L).map { i =>
      // 20 groups of 3: two near-identical members + the group's base
      val g = (i % 20).toInt
      val seed = Array.tabulate(8)(d => (math.sin(g * 8 + d) * 10).toFloat + 11f)
      val eps = (i / 20).toFloat * 0.02f
      (i, seed.map(_ + eps).toSeq)
    }
    val df1 = base.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val df2 = df1.repartition(7, col("vec_id") % 3)
    val a = Dedup.semDedup(df1, "vec_id", "embedding", threshold = 0.9)
      .orderBy("component").collect().toSeq
    val b = Dedup.semDedup(df2, "vec_id", "embedding", threshold = 0.9)
      .orderBy("component").collect().toSeq
    assert(a.nonEmpty)
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ===
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    // centroid sims agree to float-noise tolerance (avg order may differ)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x.getDouble(3) - y.getDouble(3)) < 1e-9)
    }
  }

  test("exact ties fall to the smallest id") {
    val emb = Seq((7L, v.toSeq), (8L, v.toSeq), (9L, v.toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Dedup.semDedup(emb, "vec_id", "embedding", threshold = 0.9)
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("component") === 7L)
    assert(out.head.getAs[Long]("survivor") === 7L)
    assert(math.abs(out.head.getAs[Double]("centroid_sim") - 1.0) < 1e-9)
  }
}
