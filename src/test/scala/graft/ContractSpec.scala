package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.filter.FilterDsl
import graft.oplog.Oplog

/** API-contract regressions mirrored from the reference's cross-client
  * corpus (`testdata/api_contracts.json`): duplicate-add conflict,
  * self-link rejection, duplicate index create, array-tag filter equality,
  * evolve-preserves-metadata. The replay fold stays total (recovery must
  * accept whatever is in the log); `Oplog.violations` is the API-boundary
  * validation the reference's engine applies before journaling.
  */
class ContractSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("seq", LongType), StructField("ts", LongType),
    StructField("op", StringType), StructField("index_name", StringType),
    StructField("id", StringType),
    StructField("vector", ArrayType(FloatType)),
    StructField("meta", MapType(StringType, StringType)),
    StructField("src", StringType), StructField("dst", StringType),
    StructField("rel", StringType), StructField("weight", DoubleType)))

  private def log(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  private def vadd(seq: Long, id: String, meta: Map[String, String]): Row =
    Row(seq, seq, "VADD", "i", id, Seq(1f), meta, null, null, null, null, null)
  private def vmeta(seq: Long, id: String, meta: Map[String, String]): Row =
    Row(seq, seq, "VMETA", "i", id, null, meta, null, null, null, null, null)
  private def vdel(seq: Long, id: String): Row =
    Row(seq, seq, "VDEL", "i", id, null, null, null, null, null, null, null)
  private def glink(seq: Long, s: String, d: String, rel: String): Row =
    Row(seq, seq, "GLINK", "i", null, null, null, s, d, rel, 1.0, null)
  private def vcreate(seq: Long, idx: String): Row =
    Row(seq, seq, "VCREATE", idx, null, null, null, null, null, null, null, null)

  test("vadd_duplicate_returns_409: duplicate add on a live id is flagged") {
    val v = Oplog.violations(log(Seq(
      vadd(1, "a", Map()), vadd(2, "a", Map()),     // conflict
      vadd(3, "b", Map()), vdel(4, "b"), vadd(5, "b", Map())))) // legal re-add
      .collect()
    assert(v.map(r => (r.getLong(0), r.getString(3))).toSet === Set((2L, "duplicate_add")))
  }

  test("vlink_self_link_rejected") {
    val v = Oplog.violations(log(Seq(
      glink(1, "a", "a", "r"), glink(2, "a", "b", "r")))).collect()
    assert(v.map(_.getString(3)).toSeq === Seq("self_link"))
  }

  test("create_duplicate_index_returns_409; recreate after drop is legal") {
    val rows = Seq(vcreate(1, "x"), vcreate(2, "x"),
      vcreate(3, "y"),
      Row(4L, 4L, "VDROP", "y", null, null, null, null, null, null, null),
      vcreate(5, "y"))
    val v = Oplog.violations(log(rows)).collect()
    assert(v.map(r => (r.getLong(0), r.getString(3))).toSet ===
      Set((2L, "duplicate_create")))
  }

  test("vfilter_array_tag_matches_equality: = on array fields is contains") {
    val df = Seq(
      (1L, Seq("red", "hot")), (2L, Seq("blue")), (3L, Seq.empty[String]))
      .toDF("id", "tags")
    val pred = FilterDsl.compile("tags = 'red'", df.schema)
    assert(df.filter(pred).select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("evolve_preserves_metadata: merge old meta, override new, mark historical") {
    // VEvolve = copy-in edges + superseded_by link + VADD(new, merged meta)
    // + VMETA(old, _is_historical) — ops.go:842-895 as oplog commands.
    val rows = Seq(
      vadd(1, "old", Map("tags" -> "t1", "source" -> "s", "v" -> "1")),
      glink(2, "fan", "old", "mentions"),
      glink(3, "old", "new1", "superseded_by"),
      glink(4, "fan", "new1", "mentions"),        // copied incoming edge
      vadd(5, "new1", Map("tags" -> "t1", "source" -> "s", "v" -> "2")),
      vmeta(6, "old", Map("_is_historical" -> "true")))
    val state = Oplog.foldVectors(log(rows)).collect()
      .map(r => r.getString(1) -> r).toMap
    val newMeta = state("new1").getMap[String, String](
      state("new1").fieldIndex("meta")).toMap
    assert(newMeta === Map("tags" -> "t1", "source" -> "s", "v" -> "2"))
    val oldMeta = state("old").getMap[String, String](
      state("old").fieldIndex("meta")).toMap
    assert(oldMeta("_is_historical") === "true")
    assert(oldMeta("v") === "1") // old record untouched apart from the flag
    val edges = Oplog.foldEdges(log(rows))
      .filter(col("dst") === "new1" && col("deleted_at").isNull)
      .select("src", "rel").as[(String, String)].collect().toSet
    assert(edges === Set(("old", "superseded_by"), ("fan", "mentions")))
  }

  test("search_filter_only returns hydrated metadata (F6 + F7)") {
    val docs = graft.core.Tables.documents(spark, sf())
    val pred = FilterDsl.compile("lang = 'en'", docs.schema)
    val out = docs.filter(pred).select("doc_id", "lang", "source")
      .orderBy("doc_id").limit(5).collect()
    assert(out.nonEmpty && out.forall(_.getAs[String]("lang") == "en"))
  }
}
