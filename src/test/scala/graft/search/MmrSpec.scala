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
