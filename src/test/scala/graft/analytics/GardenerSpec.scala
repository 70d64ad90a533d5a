package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit pins for the deterministic Gardener seams that carry reference
  * semantics too fine-grained for the sf-corpus oracles — here the C8
  * contradiction candidate generator (`detectContradictions`,
  * gardener.go:1310-1371): top-k neighborhood, similarity band, meta-node
  * scan skip (but NOT neighbor skip — the reference only type-filters the
  * scanned side), directed analyzed_against dedup.
  */
class GardenerSpec extends SparkSpec {

  /** Unit vectors at an angle: cosine similarity = cos(Δθ), analytic. */
  private def v(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  private def mem() = {
    import spark.implicits._
    Seq(
      (1L, v(0), "memory", "a"),
      (2L, v(30), "memory", "b"),       // sim to 1 = cos30 ≈ 0.866 (in band)
      (3L, v(5), "memory", "c"),        // sim to 1 ≈ 0.996 (> hi: too similar)
      (4L, v(60), "memory", "d"),       // sim to 1 = 0.5 (< lo: unrelated)
      (5L, v(28), "reflection", "e"),   // meta: never scanned, CAN be a neighbor
      (6L, v(32), "memory", ""))        // empty: never scanned, CAN be a neighbor
      .toDF("mem_id", "embedding", "typ", "content")
  }

  private def pairs(page: Seq[Long], analyzed: Seq[(Long, Long)]) = {
    import spark.implicits._
    Gardener.contradictionCandidates(
        mem(), page.toDF("mem_id"), analyzed.toDF("src", "dst"))
      .orderBy("src_mem", "dst_mem").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
  }

  test("contradiction candidates: band, scan skips, neighbor-side skips") {
    // Scanning node 1: top-5 by distance = {self, 3, 5, 2, 6} (4 ranks 6th,
    // dropped by the k cap before the band is even consulted — the
    // reference band-filters the TOP-5, not the corpus). Self skipped,
    // 3 over-band, 5 is a meta-type NEIGHBOR (skipped post-ranking — it
    // still consumed a top-5 slot), 6 has EMPTY-but-present content
    // (fatal only on the scanned side, gardener.go:1372-1375) → kept.
    val got = pairs(page = Seq(1L), analyzed = Nil)
    assert(got.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L), (1L, 6L)))
    val bySim = got.map(p => (p._2, p._3)).toMap
    assert(math.abs(bySim(2L) - math.cos(math.toRadians(30))) < 1e-5)
    assert(math.abs(bySim(6L) - math.cos(math.toRadians(32))) < 1e-5)
    assert(got.forall(p => p._3 >= 0.70 && p._3 <= 0.95))
  }

  test("contradiction candidates: analyzed_against excludes the DIRECTED pair only") {
    assert(pairs(Seq(1L), Seq((1L, 2L))).map(p => (p._1, p._2)).toSeq ===
      Seq((1L, 6L)))
    // Reverse-direction edge does not suppress (VGetLinks(node.ID) checks
    // outgoing links of the scanned node only).
    assert(pairs(Seq(1L), Seq((2L, 1L))).map(p => (p._1, p._2)).toSeq ===
      Seq((1L, 2L), (1L, 6L)))
  }

  test("contradiction candidates: meta-type and empty-content nodes are never scanned") {
    assert(pairs(Seq(5L), Nil).isEmpty)   // reflection
    assert(pairs(Seq(6L), Nil).isEmpty)   // empty content
  }
}
