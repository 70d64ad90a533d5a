package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** v25 MMR re-ranking: the greedy diversity trade-off on a hand-built
  * geometry where MMR's order provably diverges from pure relevance.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  /** Write a tiny embeddings table and return its directory. */
  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("mmrspec").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("exact duplicate is deferred below a slightly-less-relevant diverse item") {
    // Geometry (query = v0 = e_x):
    //   v1 = (.98, .199, 0)  rel .98
    //   v2 = v1 exactly      rel .98, sim(v2, v1) = 1
    //   v3 = (.975, 0, .222) rel ~.975, sim(v3, v1) ~ .9555
    //   v4 = e_y             filler
    // Relevance order after v0: v1, v2, v3. MMR at λ=0.7:
    //   rank 3 scores: v2 = .7(.98) − .3(1.0) = .386
    //                  v3 = .7(.975) − .3(.975) = .390  → v3 wins
    // so MMR = [v0, v1, v3, v2, v4] — the duplicate drops a rank.
    val v1 = Seq(0.98f, 0.199f, 0f)
    val dir = embDir(Seq(
      (0L, Seq(1f, 0f, 0f), 0),
      (1L, v1, 0),
      (2L, v1, 0),
      (3L, Seq(0.975f, 0f, 0.222f), 0),
      (4L, Seq(0f, 1f, 0f), 0)))
    val out = graft.SparkEntry.queries("v25_mmr_rerank")(spark, dir)
      .filter(col("qid") === 0).orderBy(col("rank")).collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 1L, 3L, 2L, 4L))
    // rank 1 is the query itself at score λ·1.0.
    assert(math.abs(out(0).getDouble(3) - 0.7) < 1e-9)
    // scores are non-increasing is NOT an MMR invariant, but within-rank
    // determinism is: re-running yields the identical selection.
    val again = graft.SparkEntry.queries("v25_mmr_rerank")(spark, dir)
      .filter(col("qid") === 0).orderBy(col("rank")).collect()
    assert(again.map(_.getLong(2)).toSeq === out.map(_.getLong(2)).toSeq)
  }

  test("corpus-sized pool is rejected, page-sized pool at the cap is not") {
    // A pool over MaxPoolPerQuery would make the pair self-join silently
    // quadratic — the contract guard must throw before any O(N²) work.
    val vecs = (0L until 8L).map(i => (i, Seq(i.toFloat, 1f))).toDF("id", "embedding")
    val big = (0L until (Mmr.MaxPoolPerQuery + 1L))
      .map(i => (0L, i % 8, 1.0 - i * 1e-6)).toDF("qid", "id", "rel")
    val e = intercept[IllegalArgumentException] {
      Mmr.select(big, vecs, 3, lit(0.7), lit(0.3))
    }
    assert(e.getMessage.contains("MaxPoolPerQuery"))
    // At-the-boundary pool passes (8 ids is plenty to select k=2 from).
    val ok = (0L until 8L).map(i => (0L, i, 1.0 - i * 0.01)).toDF("qid", "id", "rel")
    assert(Mmr.select(ok, vecs, 2, lit(0.7), lit(0.3)).count() === 2L)
  }

  test("selections are distinct per query and k-bounded on real data") {
    val out = graft.SparkEntry.queries("v25_mmr_rerank")(spark, sf())
    val g = out.groupBy(col("qid"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("nd"),
        max(col("rank")).as("mx"))
      .collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(r.getLong(1) === 5L)
      assert(r.getLong(2) === 5L)
      assert(r.getLong(3) === 5L)
    }
  }
}
