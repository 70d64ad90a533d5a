package graft.text

import graft.SparkSpec

/** Differential test: DataFrame BM25 vs an independent in-memory
  * reimplementation of the reference formula (`core.go:1958-2071`).
  */
class Bm25Spec extends SparkSpec {

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a quick brown dog runs fast"),
    (3L, "lazy cats sleep all day and all night"),
    (4L, "the dog and the fox are friends"),
    (5L, "running quickly makes dogs tired"))

  private def expectedScores(query: String): Map[Long, Double] = {
    val analyzed = corpus.map { case (id, t) => id -> Analyzer.analyze(t) }
    val qTokens = Analyzer.analyze(query)
    val n = analyzed.size
    val dl = analyzed.map { case (id, ts) => id -> ts.size }.toMap
    val avgdl = dl.values.sum.toDouble / n
    val postings: Map[String, Map[Long, Int]] = analyzed
      .flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.groupBy(_._2).map { case (id, ys) => id -> ys.size }
      }
    val candidates = qTokens.flatMap(t => postings.getOrElse(t, Map.empty).keys).toSet
    candidates.map { id =>
      val score = qTokens.map { t =>
        postings.get(t) match {
          case None => 0.0
          case Some(pl) =>
            val tf = pl.getOrElse(id, 0)
            if (tf == 0) 0.0
            else {
              val df = pl.size
              val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
              idf * (tf * (Bm25.k1 + 1)) /
                (tf + Bm25.k1 * (1 - Bm25.b + Bm25.b * dl(id) / avgdl))
            }
        }
      }.sum
      id -> score
    }.toMap
  }

  private lazy val docs = {
    import spark.implicits._
    corpus.toDF("id", "text")
  }

  test("BM25 scores match reference formula (incl. repeated query token)") {
    for (query <- Seq("quick dog", "lazy fox", "dog dog quick", "cats running")) {
      val got = Bm25.search(docs, "id", "text", query)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = expectedScores(query)
      assert(got.keySet == want.keySet, s"query '$query' candidates")
      for ((id, s) <- want)
        assert(math.abs(got(id) - s) < 1e-12, s"query '$query' doc $id")
    }
  }

  test("posting build: tf counts and doc lengths including stopword removal") {
    val post = Bm25.postings(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc 3: "lazy cats sleep all day and all night" → and removed, all kept ×2
    assert(post((3L, "all")) == 2L)
    assert(post((1L, "quick")) == 1L)
    val dls = Bm25.docLengths(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dls(1L) == Analyzer.analyze(corpus.head._2).size)
  }

  test("empty query returns empty result") {
    assert(Bm25.search(docs, "id", "text", "the of and").isEmpty)
  }
}
