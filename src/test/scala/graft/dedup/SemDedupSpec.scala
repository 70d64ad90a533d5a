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

  test("clustered variant over TRAINED KMeans centroids applies the same rule") {
    import graft.search.Ivf
    // Two well-separated latent clusters (v-side and its mirror), each a
    // near-dup trio. KMeans k=2 (init = two smallest ids = one per side)
    // recovers the sides; the survivor is the member with the LOWEST cosine
    // to its TRAINED centroid — the cluster mean, i.e. the paper's rule
    // with real trained centroids, not the hyperplane stand-in.
    val emb = Seq(
      (1L, v.toSeq), (2L, v.map(-_).toSeq),
      (3L, v.toSeq), (4L, v.map(-_).toSeq),
      (5L, w.toSeq), (6L, w.map(-_).toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val cents = Ivf.trainKMeansArrays(emb, k = 2, iters = 5,
      idCol = "vec_id", vecCol = "embedding")
    val centsDf = cents.zipWithIndex.toSeq
      .map { case (cv, i) => (i.toLong, cv.toSeq) }
      .toDF("cid", "cvec")
      .select(col("cid"), col("cvec").cast("array<float>").as("cvec"))
    val out = Dedup.semDedupClustered(emb, "vec_id", "embedding",
        threshold = 0.9, centroids = centsDf)
      .orderBy("component").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("component") === 1L)
    assert(out(0).getAs[Long]("n_members") === 3L)
    // centroid = mean(v, v, w): w is the outlier → survivor
    assert(out(0).getAs[Long]("survivor") === 5L)
    assert(out(1).getAs[Long]("component") === 2L)
    assert(out(1).getAs[Long]("n_members") === 3L)
    assert(out(1).getAs[Long]("survivor") === 6L)
  }

  test("clustered variant's maxBucket drops hot clusters before the pair step") {
    // Hot cluster: 5 members around v (over the cap of 4); cold cluster: a
    // pair around -v. The cap must remove the hot cluster's pairs entirely
    // while the organic cold pair survives.
    val emb = (Seq.tabulate(5)(i => ((i + 1).toLong, v.toSeq)) ++
      Seq((10L, v.map(-_).toSeq), (11L, v.map(-_).toSeq)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val centsDf = Seq((0L, v.toSeq), (1L, v.map(-_).toSeq))
      .toDF("cid", "cvec")
      .select(col("cid"), col("cvec").cast("array<float>").as("cvec"))
    val out = Dedup.semDedupClustered(emb, "vec_id", "embedding",
        threshold = 0.9, centroids = centsDf, maxBucket = 4)
      .collect()
    assert(out.map(_.getAs[Long]("component")).toSeq === Seq(10L))
    assert(out.head.getAs[Long]("n_members") === 2L)
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
