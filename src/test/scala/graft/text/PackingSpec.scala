package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  private def pack(rows: Seq[(Long, String, Long)], budget: Long,
      shards: Int = 1): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("doc_id", "source", "ntok")
    Packing.packNextFit(df, "doc_id", "source", "ntok", budget, shards)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5)))
      .toMap
  }

  test("next-fit closes a bin exactly when the next doc would overflow") {
    // budget 10: [4,5] fill bin0 to 9; 2 overflows -> bin1 (fill 2);
    // 8 fits bin1 exactly (2+8=10).
    val out = pack(Seq((0L, "a", 4L), (1L, "a", 5L), (2L, "a", 2L),
      (3L, "a", 8L)), budget = 10L)
    assert(out(0L) == (0L, 4L))
    assert(out(1L) == (0L, 9L))
    assert(out(2L) == (1L, 2L))
    assert(out(3L) == (1L, 10L))
  }

  test("a doc exactly filling the bin stays; the next one opens a new bin") {
    val out = pack(Seq((0L, "a", 10L), (1L, "a", 1L)), budget = 10L)
    assert(out(0L) == (0L, 10L))
    assert(out(1L) == (1L, 1L))
  }

  test("an oversized doc occupies a bin alone, even as the stream head") {
    val out = pack(Seq((0L, "a", 25L), (1L, "a", 3L), (2L, "a", 30L),
      (3L, "a", 4L)), budget = 10L)
    assert(out(0L) == (0L, 25L)) // head placed despite ntok > budget
    assert(out(1L) == (1L, 3L))
    assert(out(2L) == (2L, 30L))
    assert(out(3L) == (3L, 4L))
  }

  test("streams are independent: bins restart per (source, shard)") {
    val rows = Seq((0L, "a", 9L), (2L, "a", 9L), (4L, "a", 9L),
      (1L, "b", 9L), (3L, "b", 9L))
    val out = pack(rows, budget = 10L)
    // Each source packs alone: every 9-token doc opens its own bin.
    assert(out(0L)._1 == 0L && out(2L)._1 == 1L && out(4L)._1 == 2L)
    assert(out(1L)._1 == 0L && out(3L)._1 == 1L)
  }

  test("sharding splits one source into doc_id%shards streams") {
    // shards=2: even ids -> shard 0, odd -> shard 1; both pack from bin 0.
    val rows = (0L until 6L).map(i => (i, "a", 9L))
    val out = pack(rows, budget = 10L, shards = 2)
    assert(out(0L)._1 == 0L && out(2L)._1 == 1L && out(4L)._1 == 2L)
    assert(out(1L)._1 == 0L && out(3L)._1 == 1L && out(5L)._1 == 2L)
  }

  test("result is deterministic under input partitioning/order") {
    val rows = (0L until 200L).map(i => (i, s"src${i % 3}", 1L + i % 17))
    val s = spark
    import s.implicits._
    val base = rows.toDF("doc_id", "source", "ntok")
    val shuffled = base.repartition(7, col("ntok")) // unrelated partitioning
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packNextFit(df, "doc_id", "source", "ntok", 32L, 4)
        .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
        .sortBy(_._1).toSeq
    assert(run(base) == run(shuffled))
  }
}
