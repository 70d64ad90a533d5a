package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Bm25

/** Low-latency serving twin of the hybrid-fusion TEXT leg — the postings
  * analogue of [[Ivf.servingIndex]], closing the gap the reference serves
  * from RAM (`searchWithFusion` `pkg/engine/ops.go:896` over in-memory
  * postings `pkg/core/core.go:1965`, ~1 ms fused): the ANN leg already
  * served in one tight mapPartitions pass, but the BM25 leg still ran a
  * multi-stage join/aggregate plan per batch, so a fused single query
  * paid ~1 s of fixed plan cost.
  *
  * Layout ([[buildShards]]): the corpus is repartitioned DOC-major —
  * every posting of a document lands in one shard — and each partition
  * becomes one [[Shard]]: a partition-local inverted index (token → CSR
  * block of (local doc, w)) over PRECOMPUTED per-(token, doc) BM25 term
  * weights `w = idf·tfPart` ([[Bm25.termWeight]] — the same expression
  * the batch plan evaluates, so per-term contributions are
  * bit-identical), plus the per-doc decay factor baked at build time
  * (same [[Fusion.decayFrame]] the fused plan joins). This is exactly a
  * search-engine shard: doc-major means a document's score finishes
  * WITHIN one partition — no cross-partition sum, so only k-bounded
  * partials ever leave the executors.
  *
  * Serving ([[fusedTopK]]): ONE job. Each partition scores its shard for
  * every query (accumulator array over local docs, epoch-reset, query
  * tokens processed in sorted order for deterministic summation), keeps
  * a bounded per-query top-k of text candidates ranked by decayed
  * contribution (the same exact-pruning argument as the fused plan: a
  * text-only row beaten by k text rows on `tscore·dec` can never reach
  * the final top-k), hydrates text scores + decay for the ANN leg's ids,
  * and tracks the per-query raw max for normalization. Partials merge
  * through [[Ivf.reducePartials]]; the α-blend, max-normalization and
  * final (score desc, id asc) top-k are driver math over ≤ 2k candidates
  * per query. Semantics mirror [[Fusion.searchWithFusionBatch]]
  * term-for-term; only floating-point SUMMATION ORDER differs (the plan
  * sums a doc's term scores in partition order, the shard in sorted
  * query-token order), so scores agree to ~1 ulp per term, not bit-for-
  * bit — `ServingFusionSpec` pins equality at 1e-9.
  *
  * Scale shape: shards are the postings, partitioned like any 100 TB
  * table; per-batch network is nq×k candidate partials (reduce below
  * [[Ivf.reducePartials]]'s threshold, treeReduce above); driver work is
  * O(nq·k). Query batches are driver-bounded by contract, like every
  * serving entry point.
  */
object ServingFusion {

  /** One partition's inverted index over precomputed term weights.
    * `offsets` is CSR over token slots: slot `s` owns entries
    * `[offsets(s), offsets(s+1))` of `docIx`/`w`. `dec` is the per-local-
    * doc decay factor (1.0 when decay is disabled).
    */
  final case class Shard(
      ids: Array[Long],
      dec: Array[Double],
      tokens: Array[String],
      offsets: Array[Int],
      docIx: Array[Int],
      w: Array[Double]) {

    @transient lazy val tokenSlot: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](tokens.length * 2)
      var i = 0
      while (i < tokens.length) { m.put(tokens(i), i); i += 1 }
      m
    }

    @transient lazy val idSlot: scala.collection.mutable.LongMap[Int] = {
      val m = scala.collection.mutable.LongMap.empty[Int]
      var i = 0
      while (i < ids.length) { m.update(ids(i), i); i += 1 }
      m
    }
  }

  /** Build the doc-major shard index — offline, one shuffle (the
    * repartition by doc id), cache the result like [[Ivf.servingIndex]].
    *
    * @param allIds one-`idCol`-column frame of EVERY doc (docs without
    *   postings still carry a decay factor the fused plan would apply to
    *   their vector-leg score).
    * @param dec    [[Fusion.decayFrame]] output; None = decay disabled.
    */
  def buildShards(
      allIds: DataFrame,
      post: DataFrame,
      idCol: String,
      dec: Option[DataFrame] = None,
      numShards: Int = 0,
      prebuiltDocLengths: Option[DataFrame] = None,
      prebuiltTokenDf: Option[DataFrame] = None): org.apache.spark.rdd.RDD[Shard] = {
    val dls = prebuiltDocLengths.getOrElse(
      Bm25.docLengthsFromPostings(allIds, post, idCol))
    val tdf = prebuiltTokenDf.getOrElse(Bm25.tokenDf(post))
    val wp = Bm25.weightedPostings(post, dls, tdf, idCol)
    val decDf = dec.getOrElse(allIds.select(col(idCol), lit(1.0).as("_dec")))
    val joined = decDf
      .select(col(idCol).cast("long").as("_id"),
        coalesce(col("_dec").cast("double"), lit(1.0)).as("_dec"))
      .join(wp.select(col(idCol).cast("long").as("_id"), col("token"),
        col("w").cast("double").as("w")), Seq("_id"), "left")
    val parts =
      if (numShards > 0) joined.repartition(numShards, col("_id"))
      else joined.repartition(col("_id"))
    parts.rdd.mapPartitions { it =>
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      val decB = scala.collection.mutable.ArrayBuffer.empty[Double]
      val idIdx = scala.collection.mutable.LongMap.empty[Int]
      val byTok = new java.util.HashMap[String,
        (scala.collection.mutable.ArrayBuilder.ofInt,
         scala.collection.mutable.ArrayBuilder.ofDouble)]()
      it.foreach { r =>
        val id = r.getLong(0)
        val li = idIdx.getOrElseUpdate(id, {
          ids += id; decB += r.getDouble(1); ids.length - 1
        })
        if (!r.isNullAt(2)) {
          var e = byTok.get(r.getString(2))
          if (e == null) {
            e = (new scala.collection.mutable.ArrayBuilder.ofInt,
              new scala.collection.mutable.ArrayBuilder.ofDouble)
            byTok.put(r.getString(2), e)
          }
          e._1 += li
          e._2 += r.getDouble(3)
        }
      }
      if (ids.isEmpty) Iterator.empty
      else {
        val nTok = byTok.size
        val toks = new Array[String](nTok)
        val slotEntries = new Array[(Array[Int], Array[Double])](nTok)
        val eIt = byTok.entrySet().iterator()
        var s = 0
        while (eIt.hasNext) {
          val e = eIt.next()
          toks(s) = e.getKey
          slotEntries(s) = (e.getValue._1.result(), e.getValue._2.result())
          s += 1
        }
        val offsets = new Array[Int](nTok + 1)
        var total = 0
        s = 0
        while (s < nTok) {
          offsets(s) = total; total += slotEntries(s)._1.length; s += 1
        }
        offsets(nTok) = total
        val docIx = new Array[Int](total)
        val w = new Array[Double](total)
        s = 0
        while (s < nTok) {
          System.arraycopy(slotEntries(s)._1, 0, docIx, offsets(s),
            slotEntries(s)._1.length)
          System.arraycopy(slotEntries(s)._2, 0, w, offsets(s),
            slotEntries(s)._2.length)
          s += 1
        }
        Iterator.single(Shard(ids.toArray, decB.toArray, toks, offsets,
          docIx, w))
      }
    }
  }

  /** Per-partition fused-serving partial: per query, the raw-score max,
    * a k-bounded text-candidate list ranked by `-(raw·dec)` with
    * (key asc, id asc) ties — the same total order as the fused plan's
    * pruning TopK (normalization divides by a positive per-query max, so
    * ranking on raw·dec ≡ ranking on tscore·dec) — and the (raw, dec)
    * hydration for the vector leg's ids owned by this partition. Doc-
    * major sharding makes merges disjoint per doc, so `merge` is a plain
    * bounded union like [[Ivf.TopK.merge]].
    */
  private final class FusedPartial(nq: Int, k: Int) extends Serializable {
    val maxRaw: Array[Double] = Array.fill(nq)(0.0)
    val key: Array[Array[Double]] = Array.fill(nq)(Array.fill(k)(Double.MaxValue))
    val pid: Array[Array[Long]] = Array.fill(nq)(Array.fill(k)(Long.MaxValue))
    val praw: Array[Array[Double]] = Array.fill(nq)(Array.fill(k)(0.0))
    val pdec: Array[Array[Double]] = Array.fill(nq)(Array.fill(k)(1.0))
    // id -> (raw text score or 0, dec, hasTextHit) for vector-leg ids.
    val hyd: Array[scala.collection.mutable.LongMap[(Double, Double, Boolean)]] =
      Array.fill(nq)(scala.collection.mutable.LongMap.empty)

    def insert(qi: Int, sortKey: Double, id: Long, raw: Double, dec: Double): Unit = {
      val kd = key(qi); val ki = pid(qi); val kr = praw(qi); val kc = pdec(qi)
      val last = kd.length - 1
      if (sortKey > kd(last) || (sortKey == kd(last) && id > ki(last))) return
      var j = last
      while (j > 0 && (kd(j - 1) > sortKey ||
        (kd(j - 1) == sortKey && ki(j - 1) > id))) {
        kd(j) = kd(j - 1); ki(j) = ki(j - 1); kr(j) = kr(j - 1); kc(j) = kc(j - 1)
        j -= 1
      }
      kd(j) = sortKey; ki(j) = id; kr(j) = raw; kc(j) = dec
    }

    def merge(o: FusedPartial): FusedPartial = {
      var qi = 0
      while (qi < maxRaw.length) {
        if (o.maxRaw(qi) > maxRaw(qi)) maxRaw(qi) = o.maxRaw(qi)
        val okd = o.key(qi)
        var j = 0
        while (j < okd.length && okd(j) < Double.MaxValue) {
          insert(qi, okd(j), o.pid(qi)(j), o.praw(qi)(j), o.pdec(qi)(j))
          j += 1
        }
        o.hyd(qi).foreach { case (id, v) => hyd(qi).update(id, v) }
        qi += 1
      }
      this
    }
  }

  /** Serve a fused hybrid batch: [[Fusion.searchWithFusionBatch]]
    * semantics (vector `1/(1+d)` ⨝ per-query max-normalized BM25,
    * α-blend, decay multiplier, per-query top-k by (score desc, id asc))
    * in ONE executor pass over the shards plus driver math.
    *
    * @param qTokens analyzed query tokens `(qid, token, qn)` — a
    *   driver-bounded batch.
    * @param vecTop  the ANN serving leg's `(qid, id, distance)` rows
    *   (e.g. [[Ivf.searchBatchedFast]] output) — per qid a top-k with
    *   distinct ids, per the fused plan's contract.
    * @return (qid, idCol, score) — per-qid top-k.
    */
  def fusedTopK(
      shards: org.apache.spark.rdd.RDD[Shard],
      qTokens: DataFrame,
      vecTop: DataFrame,
      alpha0: Double,
      k: Int,
      idCol: String = "id"): DataFrame = {
    val spark = qTokens.sparkSession
    import spark.implicits._
    val alpha = if (alpha0 < 0 || alpha0 > 1) 0.5 else alpha0

    // The two input legs are independent jobs — the ANN leg (vecTop is
    // usually an un-materialized probe-pruned scan) runs CONCURRENTLY
    // with the query-token collect instead of after it, shaving one
    // serial job round-trip off every call (most visible at batch size
    // 1, where job latency is the whole cost).
    // `blocking` marks the collect for ForkJoinPool's managed-blocking
    // compensation: N concurrent fusedTopK callers must not pin all of
    // global's workers and serialize each other's ANN legs — the exact
    // load this overlap exists for.
    val vFut = scala.concurrent.Future(scala.concurrent.blocking(vecTop
      .select(col("qid").cast("long"), col(idCol).cast("long"),
        col("distance").cast("double"))
      .collect()))(scala.concurrent.ExecutionContext.global)
    val qrows =
      try qTokens
        .select(col("qid").cast("long"), col("token"), col("qn").cast("int"))
        .collect()
      catch { case e: Throwable =>
        // Don't orphan the in-flight ANN job if the token leg fails.
        scala.concurrent.Await.ready(vFut,
          scala.concurrent.duration.Duration.Inf)
        throw e
      }
    val vrows = scala.concurrent.Await.result(vFut,
      scala.concurrent.duration.Duration.Inf)
    val qids = (qrows.map(_.getLong(0)) ++ vrows.map(_.getLong(0)))
      .distinct.sorted
    val qIndex = qids.zipWithIndex.toMap
    val nq = qids.length
    if (nq == 0) return Seq.empty[(Long, Long, Double)].toDF("qid", idCol, "score")

    // Sorted-token order fixes each doc's term-summation order.
    val qToks: Array[Array[(String, Int)]] = {
      val b = Array.fill(nq)(scala.collection.mutable.ArrayBuffer.empty[(String, Int)])
      qrows.foreach(r => b(qIndex(r.getLong(0))) += ((r.getString(1), r.getInt(2))))
      b.map(_.sortBy(_._1).toArray)
    }
    val vecIds: Array[Array[Long]] = {
      val b = Array.fill(nq)(scala.collection.mutable.ArrayBuffer.empty[Long])
      vrows.foreach(r => b(qIndex(r.getLong(0))) += r.getLong(1))
      b.map(_.toArray)
    }
    val vecDist: Array[Array[Double]] = {
      val b = Array.fill(nq)(scala.collection.mutable.ArrayBuffer.empty[Double])
      vrows.foreach(r => b(qIndex(r.getLong(0))) += r.getDouble(2))
      b.map(_.toArray)
    }

    val bc = shards.sparkContext.broadcast((qToks, vecIds))
    val partials = shards.mapPartitions { it =>
      val (toksByQ, vidsByQ) = bc.value
      val p = new FusedPartial(toksByQ.length, k)
      it.foreach { sh =>
        val n = sh.ids.length
        val acc = new Array[Double](n)
        val seen = new Array[Int](n)
        val touched = new Array[Int](n)
        var epoch = 0
        var qi = 0
        while (qi < toksByQ.length) {
          epoch += 1
          var tn = 0
          val toks = toksByQ(qi)
          var t = 0
          while (t < toks.length) {
            val slot = sh.tokenSlot.get(toks(t)._1)
            if (slot != null) {
              val s = slot.intValue
              val qn = toks(t)._2.toDouble
              var e = sh.offsets(s)
              val end = sh.offsets(s + 1)
              while (e < end) {
                val d = sh.docIx(e)
                if (seen(d) != epoch) {
                  seen(d) = epoch; acc(d) = 0.0; touched(tn) = d; tn += 1
                }
                acc(d) += qn * sh.w(e)
                e += 1
              }
            }
            t += 1
          }
          var i = 0
          while (i < tn) {
            val d = touched(i)
            val raw = acc(d)
            if (raw > p.maxRaw(qi)) p.maxRaw(qi) = raw
            p.insert(qi, -(raw * sh.dec(d)), sh.ids(d), raw, sh.dec(d))
            i += 1
          }
          val vi = vidsByQ(qi)
          var j = 0
          while (j < vi.length) {
            val d = sh.idSlot.getOrElse(vi(j), -1)
            if (d >= 0) {
              val hasText = seen(d) == epoch
              p.hyd(qi).update(vi(j),
                (if (hasText) acc(d) else 0.0, sh.dec(d), hasText))
            }
            j += 1
          }
          qi += 1
        }
      }
      Iterator.single(p)
    }
    val merged = Ivf.reducePartials(partials, new FusedPartial(nq, k),
      (a: FusedPartial, b: FusedPartial) => a.merge(b))

    // Driver fusion over ≤ 2k candidates per query — the plan's
    // full-outer join + α-blend + decay + rank, in plain math.
    final case class Cand(var tRaw: Double, var hasT: Boolean,
      var vdist: Double, var hasV: Boolean, var dec: Double)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var qi = 0
    while (qi < nq) {
      val mx = merged.maxRaw(qi)
      val cand = scala.collection.mutable.LongMap.empty[Cand]
      val kd = merged.key(qi)
      var j = 0
      while (j < kd.length && kd(j) < Double.MaxValue) {
        cand.update(merged.pid(qi)(j),
          Cand(merged.praw(qi)(j), hasT = true, 0.0, hasV = false,
            merged.pdec(qi)(j)))
        j += 1
      }
      val vi = vecIds(qi)
      j = 0
      while (j < vi.length) {
        val c = cand.getOrElseUpdate(vi(j),
          Cand(0.0, hasT = false, 0.0, hasV = false, 1.0))
        c.vdist = vecDist(qi)(j); c.hasV = true
        merged.hyd(qi).get(vi(j)).foreach { case (raw, dec, hasText) =>
          c.dec = dec
          if (hasText && !c.hasT) { c.tRaw = raw; c.hasT = true }
        }
        j += 1
      }
      val scored = cand.iterator.map { case (id, c) =>
        val tscore =
          if (!c.hasT) 0.0
          else if (mx > 0) c.tRaw / mx
          else c.tRaw
        val vscore = if (c.hasV) 1.0 / (1.0 + c.vdist) else 0.0
        val fused = alpha * vscore + (1.0 - alpha) * tscore
        (id, fused * c.dec)
      }.toArray
      java.util.Arrays.sort(scored, new java.util.Comparator[(Long, Double)] {
        def compare(a: (Long, Double), b: (Long, Double)): Int = {
          val c = java.lang.Double.compare(b._2, a._2)
          if (c != 0) c else java.lang.Long.compare(a._1, b._1)
        }
      })
      val qid = qids(qi)
      var r = 0
      while (r < scored.length && r < k) {
        out += ((qid, scored(r)._1, scored(r)._2))
        r += 1
      }
      qi += 1
    }
    bc.destroy()
    out.toSeq.toDF("qid", idCol, "score")
  }

  /** ALL raw BM25 hits `(qid, idCol, score)` from the shards — the
    * parity/test surface pinning served scores against
    * [[Bm25.searchPostingsBatch]] (the t6_bm25_stored plan). Unbounded
    * output (every hit row), so this is for corpora the caller knows are
    * small; serving uses [[fusedTopK]].
    */
  def textScores(
      shards: org.apache.spark.rdd.RDD[Shard],
      qTokens: DataFrame,
      idCol: String = "id"): DataFrame = {
    val spark = qTokens.sparkSession
    import spark.implicits._
    val qrows = qTokens
      .select(col("qid").cast("long"), col("token"), col("qn").cast("int"))
      .collect()
    val qids = qrows.map(_.getLong(0)).distinct.sorted
    val qIndex = qids.zipWithIndex.toMap
    val qToks: Array[Array[(String, Int)]] = {
      val b = Array.fill(qids.length)(
        scala.collection.mutable.ArrayBuffer.empty[(String, Int)])
      qrows.foreach(r => b(qIndex(r.getLong(0))) += ((r.getString(1), r.getInt(2))))
      b.map(_.sortBy(_._1).toArray)
    }
    val bc = shards.sparkContext.broadcast((qids, qToks))
    shards.flatMap { sh =>
      val (qs, toksByQ) = bc.value
      val n = sh.ids.length
      val acc = new Array[Double](n)
      val seen = new Array[Int](n)
      val touched = new Array[Int](n)
      var epoch = 0
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var qi = 0
      while (qi < toksByQ.length) {
        epoch += 1
        var tn = 0
        val toks = toksByQ(qi)
        var t = 0
        while (t < toks.length) {
          val slot = sh.tokenSlot.get(toks(t)._1)
          if (slot != null) {
            val s = slot.intValue
            val qn = toks(t)._2.toDouble
            var e = sh.offsets(s)
            val end = sh.offsets(s + 1)
            while (e < end) {
              val d = sh.docIx(e)
              if (seen(d) != epoch) {
                seen(d) = epoch; acc(d) = 0.0; touched(tn) = d; tn += 1
              }
              acc(d) += qn * sh.w(e)
              e += 1
            }
          }
          t += 1
        }
        var i = 0
        while (i < tn) {
          rows += ((qs(qi), sh.ids(touched(i)), acc(touched(i))))
          i += 1
        }
        qi += 1
      }
      rows
    }.toDF("qid", idCol, "score")
  }
}
