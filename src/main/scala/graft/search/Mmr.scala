package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Maximal marginal relevance (Carbonell & Goldstein 1998) as a
  * declarative plan — the greedy diversity re-rank shared by the exact
  * (v25) and IVF-served (v26) retrieval paths.
  *
  * Scale shape: the candidate pool is nq×N rows (N ≤ a few dozen by
  * contract — MMR re-ranks a retrieved page, never a corpus), so the
  * pair-similarity self-join and the k unrolled greedy rounds all key on
  * qid and partition by query batch; the corpus is never touched after
  * the pool is built. Determinism: ties break by id, the λ-blend is two
  * IEEE ops on inputs both engines compute identically (wide cosine ≡
  * `list_cosine_similarity`), and rel must be derived the same way on
  * both sides (e.g. `1.0 − distance`).
  */
object Mmr {

  /** Per-query candidate-pool ceiling. The pair-similarity self-join
    * below is O(N²) ROWS PER QUERY — sound only because the pool is a
    * retrieved page (a few dozen), never a corpus. The guard turns a
    * silently quadratic misuse (piping an unranked corpus in as `cand`)
    * into an immediate error, the same explicit-regime-boundary
    * discipline as [[graft.graph.GraphOps.InlineFrontierLimit]]. 1024
    * keeps the worst pair matrix ≈ 1M rows per query — still re-rank
    * territory — while rejecting anything corpus-shaped.
    */
  val MaxPoolPerQuery = 1024

  /** Greedy-select `k` of each query's candidates.
    *
    * @param cand (qid, id, rel) — the relevance-ranked pool.
    * @param vecs (id, embedding) — vectors for every candidate id.
    * @param lam  λ and (1−λ) as PARSED literals (never compute 1.0 − λ
    *             in Scala: the result can be one ulp off the SQL text's
    *             parsed constant).
    * @return (qid, rank, id, score) — rank is 1-based selection order;
    *         a query with fewer than k candidates yields fewer rows.
    */
  def select(cand: DataFrame, vecs: DataFrame, k: Int,
      lam: Column, oneMinusLam: Column): DataFrame = {
    // The greedy rounds below reference the pool and the accumulated
    // selection MANY times (anti-join + sim join + union per round);
    // without materialization Catalyst re-evaluates the candidate
    // retrieval — a corpus scan — once per reference (measured 7.7 s vs
    // 1 s for the whole v25 query). localCheckpoint pins the nq×N pool
    // (driver-batch-bounded by contract) exactly like Rag.expandGraphBfs
    // pins its frontier.
    val candC = cand.localCheckpoint(true)
    // Contract check over the pinned pool (pool-sized job, not a corpus
    // scan): every query's pool must fit the re-rank regime.
    val over = candC.groupBy(col("qid"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > MaxPoolPerQuery)
      .limit(1).collect()
    require(over.isEmpty,
      s"MMR pool for qid=${over.headOption.map(_.get(0)).orNull} has " +
        s"${over.headOption.map(_.getLong(1)).getOrElse(0L)} candidates " +
        s"(> MaxPoolPerQuery=$MaxPoolPerQuery) — MMR re-ranks a " +
        "retrieved page, never a corpus; truncate the pool upstream")
    val candV = candC.join(vecs, Seq("id")).localCheckpoint(true)
    val sims = candV.as("a").join(candV.as("b"),
        col("a.qid") === col("b.qid") && col("a.id") =!= col("b.id"))
      .select(col("a.qid").as("qid"), col("a.id").as("id"),
        col("b.id").as("sid"),
        VectorFunctions.cosineSimilarityWide(
          col("a.embedding"), col("b.embedding")).as("sim"))
      .localCheckpoint(true)
    // argmax (score DESC, id ASC) per query through the bounded TopK
    // aggregate (d = −score sorts descending, ties by id).
    def pick(scored: DataFrame): DataFrame = scored
      .groupBy(col("qid"))
      .agg(graft.functions.TopK.topK(
        col("id").cast("long"), -col("score"), 1).as("_tk"))
      .select(col("qid"), explode(col("_tk")).as("_e"))
      .select(col("qid"), col("_e.id").as("id"),
        (-col("_e.distance")).as("score"))
    // The selection state (one row per query per round, ids + scores only)
    // lives on the DRIVER between rounds (r19): a per-round eager
    // checkpoint of the growing `selected` union cost one materialization
    // job per round plus re-shuffled anti-joins, and v25/v26 ran 53-57
    // driver-latency-bound jobs for a 4-query batch. The pool contract
    // already bounds this state (per-query pools are argmax-reduced to ONE
    // row per round; the batch is driver-bounded like every serving
    // batch), so each round is now one collect of the per-query argmax,
    // and the anti-join/sim joins probe a BROADCAST local relation — no
    // shuffle, no checkpoint, no lineage growth. Scores are unchanged:
    // the distributed aggregations (pick, per-round max-sim) are the same
    // expressions over the same checkpointed pool.
    val spark = candC.sparkSession
    val qidField = candC.schema("qid")
    val selSchema = org.apache.spark.sql.types.StructType(Seq(
      qidField.copy(name = "qid"),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    def collectRound(df: DataFrame): Array[org.apache.spark.sql.Row] =
      df.select(col("qid"), col("id"), col("score")).collect()
    def localDF(rows: Seq[org.apache.spark.sql.Row]): DataFrame =
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), selSchema)
    val rounds = scala.collection.mutable.ArrayBuffer(
      collectRound(pick(candC.withColumn("score", lam * col("rel")))))
    for (j <- 2 to k) {
      val prev = broadcast(localDF(rounds.flatten.toSeq))
      val ms = candC
        .join(prev.select(col("qid"), col("id")), Seq("qid", "id"), "left_anti")
        .join(sims, Seq("qid", "id"))
        .join(prev.select(col("qid"), col("id").as("sid")), Seq("qid", "sid"))
        .groupBy(col("qid"), col("id"))
        .agg(first(col("rel")).as("rel"), max(col("sim")).as("ms"))
      rounds += collectRound(pick(ms.withColumn("score",
        lam * col("rel") - oneMinusLam * col("ms"))))
    }
    val out = rounds.zipWithIndex.flatMap { case (rows, i) =>
      rows.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2),
        i + 1L))
    }
    spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(out.toSeq: _*)),
        selSchema.add("rank", org.apache.spark.sql.types.LongType,
          nullable = false))
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** The greedy chain of [[select]] as plain driver math over ONE query's
    * pool — the serving twin ([[ServingFusion.mmrTopKCombined]] feeds it
    * per query after a one-job pool retrieval). Term-for-term the plan's
    * arithmetic: round 1 argmax of `λ·rel`, later rounds
    * `λ·rel − (1−λ)·max-sim-to-selected`, ties by id ascending, sims =
    * wide cosine `dot/(√‖a‖²·√‖b‖²)` with double-accumulated dots in
    * index order — so scores are bit-identical to [[select]]'s on the
    * same pool. O(k·N²) time, N ≤ [[MaxPoolPerQuery]] (enforced).
    *
    * @param rel  relevance per candidate (e.g. `1 − distance`).
    * @return (rank, id, score) in selection order, ≤ k rows.
    */
  def selectLocal(
      ids: Array[Long],
      rel: Array[Double],
      vecs: Array[Array[Float]],
      k: Int,
      lam: Double,
      oneMinusLam: Double): Array[(Long, Long, Double)] = {
    val n = ids.length
    require(n <= MaxPoolPerQuery,
      s"MMR pool has $n candidates (> MaxPoolPerQuery=$MaxPoolPerQuery)")
    if (n == 0) return Array.empty
    def dotW(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { s += a(j).toDouble * b(j).toDouble; j += 1 }
      s
    }
    val norm = vecs.map(v => math.sqrt(dotW(v, v)))
    // sims evaluate lazily against each new selection: only selected
    // columns are ever read, so the N² matrix never materializes for
    // k ≪ N.
    val isSel = new Array[Boolean](n)
    val maxSim = new Array[Double](n)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var r = 0
    while (r < math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!isSel(i)) {
          val score =
            if (r == 0) lam * rel(i)
            else lam * rel(i) - oneMinusLam * maxSim(i)
          if (score > bestScore ||
            (score == bestScore && (best < 0 || ids(i) < ids(best)))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      // Out-of-contract pools can leave every remaining score NaN (a
      // zero-norm vector makes its cosine 0/0 = NaN, which poisons every
      // survivor's maxSim from round 2 on); NaN comparisons are all
      // false, so `best` never moves off −1. Degrade to the selections
      // made so far — the DataFrame twin (Mmr.select) degrades without
      // crashing on the same input (ADVICE r15).
      if (best < 0) return out.toArray
      isSel(best) = true
      out += ((r + 1L, ids(best), bestScore))
      // Fold the new selection into every survivor's max-sim — the same
      // max(sim) the plan's per-round aggregate takes.
      i = 0
      while (i < n) {
        if (!isSel(i)) {
          val s = dotW(vecs(i), vecs(best)) / (norm(i) * norm(best))
          if (r == 0 || s > maxSim(i)) maxSim(i) = s
        }
        i += 1
      }
      r += 1
    }
    out.toArray
  }
}
