package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.FusionQueries
import graft.text.{Analyzer, Bm25}

/** The ONE-JOB combined serving path ([[ServingFusion.fusedTopKCombined]])
  * pinned against the two-leg pipeline it collapses: same probe selection,
  * same scalar kernels, same blend code — results must be BIT-identical to
  * [[ServingFusion.fusedTopK]] fed by [[Ivf.searchBatchedFast]] over the
  * same corpus/centroids/nProbe. Plus the latency claim itself: one call
  * submits exactly ONE Spark job.
  */
class CombinedServingSpec extends SparkSpec {
  import spark.implicits._

  private val Corpus = Seq(
    (0L, "spark shuffle join plan spark"),
    (1L, "join order and broadcast join"),
    (2L, "window agg stream state"),
    (3L, "vector scan filter scan scan"),
    (4L, "hash join probe build side"),
    (5L, "plan codegen stage whole"),
    (6L, "stream window watermark late"),
    (7L, "filter pushdown scan parquet"),
    (8L, "broadcast plan shuffle exchange"),
    (9L, "zebra quokka lemur"),
    (10L, ""))

  /** Corpus with decay metadata; doc 10 has NO vector (text-only doc) —
    * it must still text-serve through the combined shard.
    */
  private def table: DataFrame = {
    val base = FusionQueries.Now.toDouble - 86400.0
    Corpus.toDF("doc_id", "text")
      .withColumn("embedding",
        when(col("doc_id") === 10, lit(null).cast("array<float>"))
          .otherwise(array((0 until 4).map(j =>
            (sin(col("doc_id") * (j + 1)) + lit(1.5)).cast("float")): _*)))
      .withColumn("_created_at", lit(base) - col("doc_id") * 3600.0)
      .withColumn("_last_accessed", lit(base) - col("doc_id") * 1800.0)
      .withColumn("_pinned", col("doc_id") % 5 === 0)
      .withColumn("memory_layer",
        element_at(array(lit("episodic"), lit("semantic"), lit("procedural")),
          (col("doc_id") % 3 + 1).cast("int")))
      .withColumn("_decay_model",
        element_at(array(lit("exponential"), lit("linear"), lit("step"),
          lit("ebbinghaus")), (col("doc_id") % 4 + 1).cast("int")))
      .withColumn("_access_count", (col("doc_id") % 4).cast("double"))
  }

  private def queries: DataFrame = Seq(
    (0L, "spark join plan"),
    (1L, "scan filter"),
    (2L, "broadcast join join"),
    (3L, "the and of"), // all stopwords -> vector-only query
    (4L, "window stream state watermark"))
    .toDF("qid", "qtext")

  private def qTokens(qs: DataFrame): DataFrame =
    Analyzer.tokensDF(qs.select(col("qid"), col("qtext")), "qtext", "english")
      .groupBy(col("qid"), col("token")).agg(count(lit(1)).as("qn"))

  private val params = Fusion.FusionParams(alpha = 0.6, k = 4,
    metric = "cosine", memory = FusionQueries.memCfg, now = FusionQueries.Now)

  /** Both paths' shared fixtures, built once per test body. */
  private def fixtures() = {
    import graft.functions.VectorFunctions
    val t = table
    val post = Bm25.postings(t, "doc_id", "text")
    val dec = Fusion.decayFrame(t, "doc_id", params)
    assert(dec.nonEmpty)
    val tableN = t.filter(col("embedding").isNotNull)
      .select(col("doc_id").cast("long").as("id"),
        VectorFunctions.normalize(col("embedding")).as("vector"))
    val cents = Ivf.trainKMeansArrays(tableN, 3, iters = 2)
    val assigned = Ivf.assignFast(tableN, cents)
    val qsN = queries.select(col("qid"),
      VectorFunctions.normalize(array((0 until 4).map(j =>
        (cos(col("qid") * (j + 2)) + lit(1.2)).cast("float")): _*)).as("qvec"))
      .cache()
    qsN.count()
    val qt = qTokens(queries).cache()
    qt.count()
    (t, post, dec, cents, assigned, qsN, qt)
  }

  private def servedQueries(qsN: DataFrame, qt: DataFrame) =
    ServingFusion.collectServedQueries(qsN, qt)

  test("combined one-job serving is bit-identical to the two-leg path") {
    val (t, post, dec, cents, assigned, qsN, qt) = fixtures()
    val shards = ServingFusion.buildShards(
      t.select(col("doc_id")), post, "doc_id", dec, numShards = 3).cache()
    val serving = Ivf.servingIndex(assigned).cache()
    serving.count()
    val vecTop = Ivf.searchBatchedFast(serving, cents, qsN, k = 3, nProbe = 2)
      .select(col("qid"), col("id").as("doc_id"), col("distance"))
      .localCheckpoint(true)
    val twoLeg = ServingFusion.fusedTopK(shards, qt, vecTop,
        params.alpha, params.k, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(r => (r._1, -r._3, r._2))

    val combined = ServingFusion.buildCombined(
      t.select(col("doc_id")), post, "doc_id",
      assigned.select(col("id").as("doc_id"), col("vector"), col("bucket")),
      dec, numShards = 3).cache()
    combined.count()
    val served = ServingFusion.fusedTopKCombined(combined, cents,
        servedQueries(qsN, qt), params.alpha, params.k, nProbe = 2, kVec = 3)
      .sortBy(r => (r._1, -r._3, r._2))

    assert(served.length === twoLeg.length)
    served.zip(twoLeg).foreach { case (s, p) =>
      assert(s._1 === p._1, s"qid order: $s vs $p")
      assert(s._2 === p._2, s"id at qid=${s._1}: $s vs $p")
      assert(s._3 === p._3, s"score at qid=${s._1} id=${s._2}: ${s._3} vs ${p._3}")
    }
    // The vector-only query (all stopwords) and the vector-less doc 10
    // both flowed through: qid 3 returns its ANN candidates.
    assert(served.count(_._1 == 3L) === 3)
    shards.unpersist(); serving.unpersist(); combined.unpersist()
    qsN.unpersist(); qt.unpersist()
  }

  test("combined serving under l2 is bit-identical to searchBatchedFast's leg") {
    val t = table
    val post = Bm25.postings(t, "doc_id", "text")
    val dec = Fusion.decayFrame(t, "doc_id", params)
    // Unnormalized vectors — the L2 metric's natural input.
    val tableL2 = t.filter(col("embedding").isNotNull)
      .select(col("doc_id").cast("long").as("id"),
        col("embedding").cast("array<float>").as("vector"))
    val cents = Ivf.trainKMeansArrays(tableL2, 3, iters = 2)
    val assigned = Ivf.assignFast(tableL2, cents, metric = "l2")
    val qsRaw = queries.select(col("qid"),
      array((0 until 4).map(j =>
        (cos(col("qid") * (j + 2)) + lit(1.2)).cast("float")): _*).as("qvec"))
      .cache()
    qsRaw.count()
    val qt = qTokens(queries).cache(); qt.count()
    val serving = Ivf.servingIndex(assigned).cache()
    serving.count()
    val vecTop = Ivf.searchBatchedFast(serving, cents, qsRaw, k = 3,
        nProbe = 2, metric = "l2")
      .select(col("qid"), col("id").as("doc_id"), col("distance"))
      .localCheckpoint(true)
    val shards = ServingFusion.buildShards(
      t.select(col("doc_id")), post, "doc_id", dec, numShards = 3).cache()
    val twoLeg = ServingFusion.fusedTopK(shards, qt, vecTop,
        params.alpha, params.k, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(r => (r._1, -r._3, r._2))
    val combined = ServingFusion.buildCombined(
      t.select(col("doc_id")), post, "doc_id",
      assigned.select(col("id").as("doc_id"), col("vector"), col("bucket")),
      dec, numShards = 3).cache()
    combined.count()
    val served = ServingFusion.fusedTopKCombined(combined, cents,
        servedQueries(qsRaw, qt), params.alpha, params.k, nProbe = 2,
        kVec = 3, metric = "l2")
      .sortBy(r => (r._1, -r._3, r._2))
    assert(served.length === twoLeg.length)
    served.zip(twoLeg).foreach { case (s, p) =>
      assert(s._1 === p._1 && s._2 === p._2 && s._3 === p._3,
        s"l2 parity: $s vs $p")
    }
    shards.unpersist(); serving.unpersist(); combined.unpersist()
    qsRaw.unpersist(); qt.unpersist()
  }

  test("one fusedTopKCombined call submits exactly one Spark job") {
    val (t, post, dec, cents, assigned, qsN, qt) = fixtures()
    val combined = ServingFusion.buildCombined(
      t.select(col("doc_id")), post, "doc_id",
      assigned.select(col("id").as("doc_id"), col("vector"), col("bucket")),
      dec, numShards = 3).cache()
    combined.count() // materialize outside the pinned window
    val sqs = servedQueries(qsN, qt)
    val sc = spark.sparkContext
    val group = s"combined-one-job-${System.nanoTime}"
    sc.setJobGroup(group, "latency pin", interruptOnCancel = false)
    val out = try ServingFusion.fusedTopKCombined(
      combined, cents, sqs, params.alpha, params.k, nProbe = 2, kVec = 3)
    finally sc.clearJobGroup()
    assert(out.nonEmpty)
    // The status store is listener-fed (async): poll until the job lands,
    // then assert the count stopped at one.
    val deadline = System.nanoTime + 10_000_000_000L
    def n(): Int = sc.statusTracker.getJobIdsForGroup(group).length
    while (System.nanoTime < deadline && n() < 1) Thread.sleep(50)
    Thread.sleep(200)
    assert(n() === 1, "the combined serving call must be ONE Spark job")
    combined.unpersist(); qsN.unpersist(); qt.unpersist()
  }

  test("int8 combined serving is bit-identical to the two-leg int8 path") {
    val (t, post, dec, cents, assigned, qsN, qt) = fixtures()
    val absMax = 1.0 // normalized vectors: |x| <= 1
    val shards = ServingFusion.buildShards(
      t.select(col("doc_id")), post, "doc_id", dec, numShards = 3).cache()
    val serving8 = Ivf.servingIndexInt8(assigned, absMax).cache()
    serving8.count()
    val vecTop = Ivf.searchBatchedFastInt8(serving8, cents, qsN, k = 3,
        nProbe = 2, absMax = absMax)
      .select(col("qid"), col("id").as("doc_id"), col("distance"))
      .localCheckpoint(true)
    val twoLeg = ServingFusion.fusedTopK(shards, qt, vecTop,
        params.alpha, params.k, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(r => (r._1, -r._3, r._2))
    val combined8 = ServingFusion.buildCombinedInt8(
      t.select(col("doc_id")), post, "doc_id",
      assigned.select(col("id").as("doc_id"), col("vector"), col("bucket")),
      absMax, dec, numShards = 3).cache()
    combined8.count()
    val served = ServingFusion.fusedTopKCombinedInt8(combined8, cents,
        servedQueries(qsN, qt), absMax, params.alpha, params.k,
        nProbe = 2, kVec = 3)
      .sortBy(r => (r._1, -r._3, r._2))
    assert(served.length === twoLeg.length)
    served.zip(twoLeg).foreach { case (s, p) =>
      assert(s._1 === p._1 && s._2 === p._2 && s._3 === p._3,
        s"int8 parity: $s vs $p")
    }
    shards.unpersist(); serving8.unpersist(); combined8.unpersist()
    qsN.unpersist(); qt.unpersist()
  }

  test("served MMR equals the v26 plan chain on the same pool, in one job") {
    val (t, post, dec, cents, assigned, qsN, qt) = fixtures()
    val serving = Ivf.servingIndex(assigned).cache()
    serving.count()
    val pool = 6
    val mk = 3
    // Plan side: the same probed pool (rel = 1 − distance) through
    // Mmr.select over the same normalized vectors.
    val cand = Ivf.searchBatchedFast(serving, cents, qsN, k = pool, nProbe = 2)
      .select(col("qid"), col("id"), (lit(1.0) - col("distance")).as("rel"))
    val plan = Mmr.select(cand,
        assigned.select(col("id"), col("vector").as("embedding")),
        k = mk, lam = lit(0.7), oneMinusLam = lit(0.3))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))
    val combined = ServingFusion.buildCombined(
      t.select(col("doc_id")), post, "doc_id",
      assigned.select(col("id").as("doc_id"), col("vector"), col("bucket")),
      dec, numShards = 3).cache()
    combined.count()
    val mmrQs = servedQueries(qsN, qt).map(q => (q.qid, q.qvec))
    val sc = spark.sparkContext
    val group = s"mmr-one-job-${System.nanoTime}"
    sc.setJobGroup(group, "mmr latency pin", interruptOnCancel = false)
    val served = try ServingFusion.mmrTopKCombined(combined, cents, mmrQs,
      k = mk, pool = pool, nProbe = 2, lam = 0.7, oneMinusLam = 0.3)
    finally sc.clearJobGroup()
    val deadline = System.nanoTime + 10_000_000_000L
    def n(): Int = sc.statusTracker.getJobIdsForGroup(group).length
    while (System.nanoTime < deadline && n() < 1) Thread.sleep(50)
    Thread.sleep(200)
    assert(n() === 1, "served MMR must be ONE Spark job")
    val sSorted = served.sortBy(r => (r._1, r._2))
    assert(sSorted.length === plan.length)
    sSorted.zip(plan).foreach { case (s, p) =>
      assert(s._1 === p._1 && s._2 === p._2 && s._3 === p._3,
        s"mmr selection order: $s vs $p")
      assert(s._4 === p._4, s"mmr score at qid=${s._1} rank=${s._2}: ${s._4} vs ${p._4}")
    }
    serving.unpersist(); combined.unpersist(); qsN.unpersist(); qt.unpersist()
  }

  test("decay-disabled combined build defaults every factor to 1.0") {
    import graft.functions.VectorFunctions
    val t = table
    val post = Bm25.postings(t, "doc_id", "text")
    val p0 = params.copy(memory = params.memory.copy(enabled = false))
    val tableN = t.filter(col("embedding").isNotNull)
      .select(col("doc_id").cast("long").as("id"),
        VectorFunctions.normalize(col("embedding")).as("vector"))
    val cents = Ivf.trainKMeansArrays(tableN, 2, iters = 2)
    val assigned = Ivf.assignFast(tableN, cents)
    val combined = ServingFusion.buildCombined(
      t.select(col("doc_id")), post, "doc_id",
      assigned.select(col("id").as("doc_id"), col("vector"), col("bucket")),
      Fusion.decayFrame(t, "doc_id", p0), numShards = 2).cache()
    combined.count()
    // Text-less query vector aimed anywhere: every returned fused score
    // must be alpha/(1+d) exactly — dec fell back to 1.0 end to end.
    val raw = Array(1f, 0.5f, 0.25f, 0.125f)
    val nrm = math.sqrt(raw.map(x => x.toDouble * x).sum)
    val qv = raw.map(x => (x / nrm).toFloat)
    val served = ServingFusion.fusedTopKCombined(combined, cents,
      Seq(ServingFusion.ServedQuery(7L, qv, Array.empty)),
      p0.alpha, k = 4, nProbe = 2, kVec = 4)
    assert(served.nonEmpty)
    served.foreach { case (qid, _, score) =>
      assert(qid === 7L)
      assert(score <= 0.6 + 1e-12 && score > 0.0)
    }
    combined.unpersist()
  }
}
