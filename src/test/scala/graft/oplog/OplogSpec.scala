package graft.oplog

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Oplog fold semantics mirroring the reference's engine tests
  * (`pkg/engine/engine_test.go` crash-survival per op,
  * `pkg/core/core_test.go:349` stale-metadata overwrite,
  * `recovery_cascade_test.go` delete cascade).
  */
class OplogSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("seq", LongType), StructField("ts", LongType),
    StructField("op", StringType), StructField("index_name", StringType),
    StructField("id", StringType),
    StructField("vector", ArrayType(FloatType)),
    StructField("meta", MapType(StringType, StringType)),
    StructField("src", StringType), StructField("dst", StringType),
    StructField("rel", StringType), StructField("weight", DoubleType),
    StructField("payload", StringType)))

  private def log(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)

  private def vadd(seq: Long, id: String, meta: Map[String, String],
      idx: String = "i"): Row =
    Row(seq, seq, "VADD", idx, id, Seq(1f), meta, null, null, null, null, null)
  private def vmeta(seq: Long, id: String, meta: Map[String, String]): Row =
    Row(seq, seq, "VMETA", "i", id, null, meta, null, null, null, null, null)
  private def vdel(seq: Long, id: String): Row =
    Row(seq, seq, "VDEL", "i", id, null, null, null, null, null, null, null)
  private def glink(seq: Long, s: String, d: String, w: Double): Row =
    Row(seq, seq, "GLINK", "i", null, null, null, s, d, "r", w, null)
  private def gunlink(seq: Long, s: String, d: String): Row =
    Row(seq, seq, "GUNLINK", "i", null, null, null, s, d, "r", null, null)
  private def vcreate(seq: Long, idx: String): Row =
    Row(seq, seq, "VCREATE", idx, null, null, null, null, null, null, null, null)
  private def vdrop(seq: Long, idx: String): Row =
    Row(seq, seq, "VDROP", idx, null, null, null, null, null, null, null, null)
  private def vconfig(seq: Long, idx: String, op: String, p: String): Row =
    Row(seq, seq, op, idx, null, null, null, null, null, null, null, p)

  test("VADD upsert wholly replaces metadata; VMETA merges keys") {
    val st = Oplog.foldVectors(log(Seq(
        vadd(1, "a", Map("k1" -> "v1", "k2" -> "v2")),
        vmeta(2, "a", Map("k3" -> "v3", "k1" -> "v1b")),
        vadd(3, "a", Map("k4" -> "v4")),        // reset: k1..k3 gone
        vmeta(4, "a", Map("k5" -> "v5")))))
      .collect().head
    val meta = st.getMap[String, String](st.fieldIndex("meta")).toMap
    assert(meta === Map("k4" -> "v4", "k5" -> "v5"))
  }

  test("VDEL tombstones; later VADD revives as a fresh record") {
    val df = Oplog.foldVectors(log(Seq(
      vadd(1, "a", Map("x" -> "1")), vdel(2, "a"),
      vadd(1, "b", Map("x" -> "1")), vdel(2, "b"), vadd(3, "b", Map("y" -> "2")))))
    val byId = df.collect().map(r => r.getString(1) -> r).toMap
    assert(!byId("a").getBoolean(2))
    assert(byId("b").getBoolean(2))
    val meta = byId("b").getMap[String, String](byId("b").fieldIndex("meta")).toMap
    assert(meta === Map("y" -> "2"))
  }

  test("VDROP erases index history; other indexes untouched") {
    val rows = Seq(
      vadd(1, "a", Map("x" -> "1"), idx = "gone"),
      Row(2L, 2L, "VDROP", "gone", null, null, null, null, null, null, null, null),
      vadd(3, "keep", Map("x" -> "1")))
    val st = Oplog.foldVectors(log(rows)).collect()
    assert(st.map(_.getString(0)).toSeq === Seq("i"))
  }

  test("GLINK idempotence, reweight versioning, unlink, VDEL cascade") {
    val df = Oplog.foldEdges(log(Seq(
      glink(1, "a", "b", 1.0),
      glink(2, "a", "b", 1.0),        // identical: no-op
      glink(3, "a", "b", 2.0),        // reweight: closes v1, opens v2
      glink(10, "c", "d", 1.0),
      gunlink(11, "c", "d"),          // explicit unlink
      glink(20, "e", "f", 1.0),
      vdel(25, "f"))))                // cascade via dst
    val rows = df.collect().map(r =>
      (r.getString(1), r.getString(2), r.getDouble(4), r.getLong(5),
        Option(r.get(6)).map(_.asInstanceOf[Long])))
    // ab: v1 closed at 3, v2 open
    assert(rows.count(_._1 == "a") === 2)
    assert(rows.find(t => t._1 == "a" && t._3 == 1.0).get._5 === Some(3L))
    assert(rows.find(t => t._1 == "a" && t._3 == 2.0).get._5 === None)
    // cd: closed by unlink at 11
    assert(rows.find(_._1 == "c").get._5 === Some(11L))
    // ef: closed by cascade at 25
    assert(rows.find(_._1 == "e").get._5 === Some(25L))
  }

  test("cascade only applies to versions open at delete time") {
    val df = Oplog.foldEdges(log(Seq(
      glink(1, "a", "b", 1.0),
      gunlink(2, "a", "b"),
      vdel(5, "b"))))
    assert(df.collect().head.getLong(6) === 2L) // unlink wins, not the VDEL
  }

  test("replay fails loudly on an unknown op string") {
    val bogus = log(Seq(vadd(1, "a", Map()),
      Row(2L, 2L, "BOGUS", "i", null, null, null, null, null, null, null, null)))
    val e = intercept[Exception] { Oplog.foldVectors(bogus).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("unknown oplog op")), e.toString)
  }

  test("same-length in-session file swap re-validates (no stale memo verdict)") {
    // The validation memo is keyed on the analyzed plan; its VALUE is a
    // fresh-statted (path, length, mtime) fingerprint. Swapping a log
    // file's bytes IN PLACE at the same length must flip the fingerprint
    // (via mtime) and re-run validation — the pre-r14 path+size key
    // served the memoized verdict to the swapped content.
    val dir = java.nio.file.Files.createTempDirectory("oplogswap")
    val file = dir.resolve("log.json")
    def jline(op: String) =
      s"""{"seq":1,"ts":1,"op":"$op","index_name":"i","id":"a","vector":[1.0],"meta":{"x":"1"}}""" + "\n"
    java.nio.file.Files.write(file, jline("VADD").getBytes("UTF-8"))
    val df = spark.read.schema(schema).json(file.toString)
    // First fold validates and memoizes.
    assert(Oplog.foldVectors(df).collect().length === 1)
    // Swap: same path, SAME byte length ("BADD" vs "VADD"), bumped mtime.
    val swapped = jline("BADD").getBytes("UTF-8")
    assert(swapped.length === java.nio.file.Files.size(file).toInt)
    java.nio.file.Files.write(file, swapped)
    assert(file.toFile.setLastModified(System.currentTimeMillis() + 5000))
    val e = intercept[Exception] { Oplog.foldVectors(df).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("unknown oplog op")), e.toString)
  }

  test("resync quarantines damaged frames and replays the valid rest") {
    val raw = log(Seq(
      vadd(1, "a", Map("x" -> "1")),
      Row(2L, 2L, "BOGUS", "i", null, null, null, null, null, null, null, null),
      // torn VADD: would wipe a's meta if replayed
      Row(3L, 3L, "VADD", "i", "a", null, null, null, null, null, null, null),
      Row(4L, 4L, null, "i", null, null, null, null, null, null, null, null),
      // torn GLINK: rel lost mid-write
      Row(5L, 5L, "GLINK", "i", null, null, null, "a", "b", null, 1.0, null),
      glink(6, "a", "b", 2.0)))
    val (valid, quarantined) = Oplog.resync(raw)
    val reasons = quarantined.groupBy("_corrupt").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reasons === Map("unknown_op" -> 2L, "torn_payload" -> 2L))
    // valid side replays cleanly: a alive with its original meta, one edge
    val st = Oplog.foldVectors(valid).collect().head
    assert(st.getMap[String, String](st.fieldIndex("meta")).toMap ===
      Map("x" -> "1"))
    assert(Oplog.foldEdges(valid).count() === 1L)
  }

  test("resync on a clean log quarantines nothing") {
    val raw = log(Seq(vadd(1, "a", Map("x" -> "1")), glink(2, "a", "b", 1.0)))
    val (valid, quarantined) = Oplog.resync(raw)
    assert(quarantined.isEmpty)
    assert(valid.count() === 2L)
  }

  test("VCONFIG/VAUTOLINKS: latest-wins, need a live index, die with VDROP") {
    val st = Oplog.foldConfig(log(Seq(
        vcreate(1, "a"),
        vconfig(2, "a", "VCONFIG", """{"x":1}"""),      // overridden
        vconfig(3, "a", "VCONFIG", """{"x":2}"""),      // wins
        vconfig(4, "a", "VAUTOLINKS", """[{"metadata_field":"f","relation_type":"r"}]"""),
        vconfig(5, "ghost", "VCONFIG", """{}"""),       // no VCREATE: skipped
        vcreate(6, "b"), vconfig(7, "b", "VCONFIG", """{"y":1}"""),
        vdrop(8, "b"),                                  // wipes b's config
        vcreate(9, "c"), vdrop(10, "c"),
        vconfig(11, "c", "VCONFIG", """{"z":1}"""),     // dead window: skipped
        vcreate(12, "c"))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(st === Map(
      ("a", "VCONFIG") -> """{"x":2}""",
      ("a", "VAUTOLINKS") -> """[{"metadata_field":"f","relation_type":"r"}]"""))
  }

  test("snapshot + tail replay == full replay (live state)") {
    val oplog = Oplog.generate(spark, sf("sf0.001"))
    for (cut <- Seq(500L, 1021L, 5000L)) {
      val compact = Oplog.snapshot(oplog, cut)
        .unionByName(oplog.filter(col("seq") > cut))
      def live(o: DataFrame) = {
        val v = Oplog.foldVectors(o).filter(col("alive"))
          .select("index_name", "id")
        val e = Oplog.foldEdges(o).filter(col("deleted_at").isNull)
          .select("index_name", "src", "dst", "rel", "weight")
        (v, e)
      }
      val (fv, fe) = live(oplog)
      val (cv, ce) = live(compact)
      assert(fv.exceptAll(cv).isEmpty && cv.exceptAll(fv).isEmpty,
        s"vector state diverged at cut=$cut")
      assert(fe.exceptAll(ce).isEmpty && ce.exceptAll(fe).isEmpty,
        s"edge state diverged at cut=$cut")
      val fc = Oplog.foldConfig(oplog).select("index_name", "op", "payload")
      val cc = Oplog.foldConfig(compact).select("index_name", "op", "payload")
      assert(fc.exceptAll(cc).isEmpty && cc.exceptAll(fc).isEmpty,
        s"config state diverged at cut=$cut")
    }
  }
}
