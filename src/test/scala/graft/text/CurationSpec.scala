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
}
