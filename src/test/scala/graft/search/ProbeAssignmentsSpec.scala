package graft.search

import scala.util.Random

import graft.SparkSpec

/** Pins [[Ivf.probeAssignments]] (the r12 parallel bounded-insertion fast
  * path) bit-identical to the selection it replaced — per query,
  * `.sorted.take(nProbe)` over (score, centroid-id) tuples with the Scala
  * total order on Double — including exact-tie and ±0.0 cases.
  */
class ProbeAssignmentsSpec extends SparkSpec {

  /** The replaced implementation, verbatim semantics. */
  private def reference(cents: Array[Array[Float]], adj: Array[Float],
      l2: Boolean, qvecs: Array[Array[Float]], nProbe: Int): Array[Array[Int]] = {
    val bucketQs = new Array[Array[Int]](cents.length)
    qvecs.zipWithIndex.foreach { case (qv, qi) =>
      cents.indices.map { c =>
        val cv = cents(c)
        var dot = 0.0; var j = 0
        while (j < cv.length) { dot += cv(j).toDouble * qv(j); j += 1 }
        (if (l2) adj(c) - dot else -dot * adj(c), c)
      }.sorted.take(nProbe).foreach { case (_, c) =>
        bucketQs(c) = if (bucketQs(c) == null) Array(qi) else bucketQs(c) :+ qi
      }
    }
    bucketQs
  }

  private def check(cents: Array[Array[Float]], qvecs: Array[Array[Float]],
      nProbe: Int, metric: String): Unit = {
    val adj = Ivf.bucketAdj(cents, metric)
    val l2 = metric == "l2"
    val got = Ivf.probeAssignments(cents, adj, l2, qvecs, nProbe)
    val want = reference(cents, adj, l2, qvecs, nProbe)
    assert(got.length === want.length)
    got.indices.foreach { b =>
      assert(Option(got(b)).map(_.toSeq) === Option(want(b)).map(_.toSeq),
        s"bucket $b metric=$metric nProbe=$nProbe")
    }
  }

  test("random geometry, both metrics, several probe depths") {
    val rnd = new Random(42)
    def vec(dim: Int): Array[Float] =
      Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
    for (trial <- 1 to 5) {
      val dim = 4 + trial
      val cents = Array.fill(37)(vec(dim))
      val qs = Array.fill(23)(vec(dim))
      for (np <- Seq(1, 3, 37, 100); m <- Seq("cosine", "l2"))
        check(cents, qs, np, m)
    }
  }

  test("exact score ties resolve by centroid id, duplicated centroids") {
    // Duplicate centroids produce EXACTLY equal scores — the tie-break on
    // centroid id must match the tuple sort.
    val c = Array(1f, 0f)
    val cents = Array(c, c.clone(), Array(0f, 1f), c.clone(), Array(0.5f, 0.5f))
    val qs = Array(Array(1f, 0f), Array(0f, 1f), Array(0.7f, 0.7f))
    for (np <- 1 to 5; m <- Seq("cosine", "l2")) check(cents, qs, np, m)
  }

  test("NaN query vector returns (not throws) and matches the tuple sort") {
    // A NaN query makes EVERY centroid score NaN. The old `.sorted.take`
    // total-ordered NaN last with id tie-breaks and still selected them;
    // the fast path must do the same — not leak Int.MaxValue sentinels
    // into assembly (the pre-r14 AIOOBE).
    val cents = Array(Array(1f, 0f), Array(0f, 1f), Array(0.5f, 0.5f),
      Array(-1f, 0f))
    val qs = Array(Array(Float.NaN, 0f), Array(1f, 0f), Array(Float.NaN, Float.NaN))
    for (np <- 1 to 4; m <- Seq("cosine", "l2")) check(cents, qs, np, m)
  }

  test("NaN centroid mixes NaN and real scores; reals win, NaN ranks by id") {
    val cents = Array(Array(1f, 0f), Array(Float.NaN, 1f), Array(0f, 1f),
      Array(Float.NaN, 0f))
    val qs = Array(Array(1f, 1f), Array(0f, -1f))
    for (np <- 1 to 4; m <- Seq("cosine", "l2")) check(cents, qs, np, m)
  }

  test("zero-norm centroids (adj = 0 for cosine -> score -0.0 vs 0.0)") {
    // A zero centroid gives inv-norm 0; -dot * 0 is -0.0 or 0.0 depending
    // on dot's sign — the total order distinguishes them, and the fast
    // path must too.
    val cents = Array(Array(0f, 0f), Array(1f, 0f), Array(0f, 0f), Array(-1f, 0f))
    val qs = Array(Array(1f, 1f), Array(-1f, 1f))
    for (np <- 1 to 4; m <- Seq("cosine", "l2")) check(cents, qs, np, m)
  }
}
