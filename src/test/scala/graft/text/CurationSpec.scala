package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.CurationQueries

/** Behavioral checks for the x16-x18 curation queries (the oracle gate
  * checks engine equivalence; these pin the SEMANTICS — the injected
  * footer is detected, rarity separates planted-rare docs, shards are
  * deterministic and roughly balanced).
  */
class CurationSpec extends SparkSpec {

  private def run(name: String) =
    CurationQueries.queries(name)(spark, sf())

  test("x16: footer docs carry boilerplate; non-footer docs carry ~none") {
    val rows = run("x16_boilerplate")
      .select("doc_id", "n_boiler", "boiler_ppm").collect()
    assert(rows.nonEmpty)
    val (footer, plain) = rows.partition(_.getLong(0) % 3 == 0)
    // Every injected doc contains the 4 footer-internal shingles (plus
    // 4 text-to-footer bridge shingles that are doc-specific).
    assert(footer.forall(_.getLong(1) >= 4),
      s"footer doc missing boilerplate: ${footer.filter(_.getLong(1) < 4).mkString(",")}")
    // Plain docs may still hit naturally-frequent shingles, but the
    // median plain doc should sit well below the median footer doc.
    def medianPpm(rs: Array[org.apache.spark.sql.Row]) = {
      val s = rs.map(_.getLong(2)).sorted; s(s.length / 2)
    }
    assert(medianPpm(footer) > medianPpm(plain))
  }

  test("x17: rarity scores are complete and OOV-bounded") {
    val rows = run("x17_rarity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nToks, nOov, oovPpm, mdf) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nOov <= nToks)
      assert(oovPpm == math.floor(1000000.0 * nOov / nToks).toLong)
      assert(mdf >= 1000, s"mean df below the df=1 floor: $r")
    }
  }

  test("x19: dataset card accounts for every doc; quality bounded; dup math exact") {
    val rows = run("x19_dataset_card").collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_.getLong(1)).sum
    assert(totalDocs ==
      spark.read.parquet(s"${sf()}/documents.parquet").count())
    rows.foreach { r =>
      val (n, dup, dupPpm, qMilli, hiQ) =
        (r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(dup <= n && hiQ <= n)
      assert(dupPpm == math.floor(1000000.0 * dup / n).toLong)
      assert(qMilli >= 0 && qMilli <= 1000) // quality in [0, 1]
    }
  }

  test("x20: top bigrams are distinct, capped at 50, count-descending") {
    val rows = run("x20_top_bigrams").collect()
    assert(rows.length == 50)
    assert(rows.map(_.getString(0)).distinct.length == 50)
    val ns = rows.map(_.getLong(1))
    // The query's own order is (n desc, bigram) — counts never increase.
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(ns.forall(_ >= 1))
  }

  test("x21: corpus diff statuses partition both snapshots; planted ids respected") {
    val m = run("x21_corpus_diff").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val nDocs = spark.read.parquet(s"${sf()}/documents.parquet").count()
    assert(m.keySet == Set("added", "removed", "modified", "unchanged"))
    // v1 = removed + modified + unchanged; every added id is in the
    // planted +900000 range; every removed id is a %13 multiple.
    assert(m("removed")._1 + m("modified")._1 + m("unchanged")._1 == nDocs)
    assert(m("added")._2 >= 900000)
    assert(m("removed")._2 % 13 == 0 && m("removed")._3 % 13 == 0)
    assert(m("modified")._2 % 11 == 0 && m("modified")._3 % 11 == 0)
  }

  test("d10: dup matrix pairs reconcile with d2's pair count; sources sorted") {
    val d2n = graft.queries.DedupQueries.queries("d2_minhash_lsh")(
      spark, sf()).count()
    val mat = graft.queries.DedupQueries.queries("d10_dup_matrix")(
      spark, sf()).collect()
    assert(mat.map(_.getLong(2)).sum == d2n)
    mat.foreach(r => assert(r.getString(0) <= r.getString(1)))
  }

  test("x22: domain audit covers all docs; blocked domains keep zero tokens") {
    val rows = run("x22_domains").collect()
    assert(rows.length == 6)
    val total = rows.map(_.getLong(1)).sum
    assert(total == spark.read.parquet(s"${sf()}/documents.parquet").count())
    rows.foreach { r =>
      val (domain, blocked, wsKept) =
        (r.getString(0), r.getLong(2), r.getLong(3))
      if (blocked == 1) assert(wsKept == 0, s"blocked $domain kept tokens")
      else assert(wsKept > 0, s"unblocked $domain kept nothing")
    }
    assert(rows.count(_.getLong(2) == 1) == 2)
  }

  test("x18: shard assignment is deterministic, complete, and balanced") {
    val a = run("x18_shard").collect()
    val b = run("x18_shard").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.getLong(0)).toSet == (0L until 16L).toSet)
    val total = a.map(_.getLong(1)).sum
    assert(total == spark.read.parquet(s"${sf()}/documents.parquet").count())
    // Multiplicative hashing over a dense id range: no shard should hold
    // more than 4x the ideal share even on the 500-doc fixture.
    assert(a.map(_.getLong(1)).max <= 4 * (total / 16 + 1))
    // share_ppm sums to ~1e6 (floor rounding loses < 16 ppm).
    val ppm = a.map(_.getLong(3)).sum
    assert(ppm > 999984 && ppm <= 1000000, s"share_ppm sum $ppm")
  }

  test("x31: every planted half-doc is flagged against its bench source") {
    val rows = graft.queries.TextPipelineQueries
      .queries("x31_contamination_frac")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    val planted = rows.filter(_.getLong(0) >= 600000)
    // every bench doc's planted half-copy is caught, attributed to ITS
    // bench source, with the fraction the prefix construction predicts
    // ((h-4)/(n-4) for an (n+1)/2-word prefix → well above the 25% cut)
    // n >= 11 is where the half-prefix clears the 25% cut for every n:
    // shared = (n+1)/2 - 4 vs n_bench = n - 4 gives 4*shared >= n_bench
    // iff n >= 10 (odd) / n >= 12 (even); n in {9, 10} shingles but
    // falls below the cut.
    val benchIds = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") % 97 === 0)
      .filter(size(split(col("text"), " ")) >= 11)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(benchIds.subsetOf(planted.map(_.getLong(1)).toSet),
      s"missing planted leaks: ${benchIds -- planted.map(_.getLong(1)).toSet}")
    planted.foreach { r =>
      assert(r.getLong(0) === r.getLong(1) + 600000, r.toString)
      assert(r.getLong(4) >= 250000 && r.getLong(4) < 600000, r.toString)
    }
    // integer cut: nothing below 25% survives in ANY row
    rows.foreach(r => assert(4 * r.getLong(2) >= r.getLong(3), r.toString))
  }

  test("langBest equals langScores' rank-1 row, ties to the smaller lang") {
    import spark.implicits._
    // Engineered cases: clear winners per language, an exact de/en tie
    // (both score 1 → 'de', alphabetically first), and an all-zero doc
    // (every profile ties at 0 → 'de').
    val docs = Seq(
      (0L, "the of and is a plain sentence"),
      (1L, "el los de y una frase"),
      (2L, "the der"),
      (3L, "xyzzy nothing matches here"),
      (4L, "le la les et une phrase"),
      (5L, "de0 shi4 le0 zai4 he2")).toDF("doc_id", "content")
    val slow = TextPipeline.langScores(docs, "doc_id", "content")
      .filter(col("rn") === 1)
      .select(col("id"), col("lang"), col("score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val fast = TextPipeline.langBest(docs, "doc_id", "content")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(fast.toSeq === slow.toSeq)
    assert(fast.find(_._1 == 2L).get._2 === "de") // tie case
    assert(fast.find(_._1 == 3L).get._2 === "de") // all-zero case
  }
}
