package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.F16

/** Pins the binary16 implementation three ways:
  *   1. bit-level: every 16-bit pattern round-trips toFloat→toBits;
  *   2. rounding: toBits agrees with a brute-force nearest-f16 oracle
  *      (round-to-nearest-even on ties);
  *   3. oracle parity: the arithmetic ulp/round-half-even formulation the
  *      DuckDB oracle uses (`SourceQueries.f16Sql`) reproduces the
  *      bit-level round-trip exactly — mirrored here in double math.
  * Plus kernel semantics: pack/unpack round-trip through a DataFrame and
  * the f16 Euclidean kernel vs driver-side reference math.
  */
class F16Spec extends SparkSpec {

  test("every 16-bit pattern round-trips (exhaustive, NaNs excluded)") {
    var h = 0
    while (h < 0x10000) {
      val e = (h >>> 10) & 0x1f
      val m = h & 0x3ff
      if (!(e == 31 && m != 0)) { // skip NaN payloads (canonicalized)
        val f = F16.toFloat(h)
        assert(F16.toBits(f) == h, f"pattern 0x$h%04x -> $f -> 0x${F16.toBits(f)}%04x")
      }
      h += 1
    }
  }

  // All finite f16 values with their bit patterns, for the brute oracle.
  private lazy val finiteF16: Array[(Float, Int)] =
    (0 until 0x10000).filter(h => ((h >>> 10) & 0x1f) != 31)
      .map(h => (F16.toFloat(h), h)).toArray

  private def bruteNearest(x: Float): Int = {
    // Nearest finite f16 by absolute distance; exact ties -> even mantissa.
    // ±0 are the same VALUE — only the zero matching x's sign bit is a
    // candidate (IEEE rounding preserves the sign of zero results).
    val sgn = java.lang.Float.floatToIntBits(x) >>> 31
    var best = List.empty[Int]
    var bestD = Double.MaxValue
    finiteF16.foreach { case (v, h) =>
      if (!(v == 0f && (h >>> 15) != sgn)) {
        val d = math.abs(x.toDouble - v.toDouble)
        if (d < bestD) { bestD = d; best = List(h) }
        else if (d == bestD) best = h :: best
      }
    }
    best.find(h => (h & 1) == 0).getOrElse(best.head)
  }

  test("toBits is round-to-nearest-even (vs brute-force oracle)") {
    val rnd = new scala.util.Random(42)
    val samples =
      Seq.fill(400)((rnd.nextFloat() - 0.5f) * 4f) ++        // typical range
      Seq.fill(200)((rnd.nextFloat() - 0.5f) * 1e-4f) ++     // subnormal zone
      Seq.fill(100)((rnd.nextFloat() - 0.5f) * 100000f) ++   // near overflow
      // exact halfway points: v + 0.5 ulp for assorted f16 values
      Seq(1.0f + math.pow(2, -11).toFloat,                   // tie -> 1.0
        1.0f + 3 * math.pow(2, -11).toFloat,                 // tie -> 1+2^-9
        -(1.0f + math.pow(2, -11).toFloat),
        math.pow(2, -25).toFloat,                            // tie -> 0
        3 * math.pow(2, -25).toFloat)                        // tie -> 2^-23
    samples.foreach { x =>
      val got = F16.toBits(x)
      val want = bruteNearest(x)
      // overflow rounds to inf, which the finite-only oracle can't produce
      if (math.abs(x) <= 65504f)
        assert(got == want,
          f"x=$x got=0x$got%04x (${F16.toFloat(got)}) want=0x$want%04x (${F16.toFloat(want)})")
      else assert((got & 0x7fff) == 0x7c00, f"x=$x should overflow to inf")
    }
  }

  // Double-math mirror of SourceQueries.f16Sql (DuckDB arithmetic):
  // round-half-away with exact tie detection rerouted to the even neighbor.
  private def roundHalfAway(y: Double): Double =
    if (y >= 0) { val f = math.floor(y); if (y - f >= 0.5) f + 1 else f }
    else { val c = math.ceil(y); if (c - y >= 0.5) c - 1 else c }
  private def f16SqlMirror(x: Double): Double = {
    if (x == 0) return 0.0
    val ulp =
      if (math.abs(x) < math.pow(2, -14)) math.pow(2, -24)
      else math.pow(2, math.floor(math.log(math.abs(x)) / math.log(2)) - 10)
    val y = x / ulp
    val r =
      if (y - math.floor(y) == 0.5) 2.0 * roundHalfAway(y / 2.0)
      else roundHalfAway(y)
    r * ulp
  }

  test("the oracle's arithmetic formulation == bit-level round-trip") {
    val rnd = new scala.util.Random(7)
    val samples =
      Seq.fill(2000)((rnd.nextFloat() - 0.5f) * 4f) ++
      Seq.fill(500)((rnd.nextFloat() - 0.5f) * 2e-4f) ++
      Seq(0f, 1f, -1f, 2047.5f, 65504f,
        math.pow(2, -14).toFloat, math.nextDown(math.pow(2, -14).toFloat),
        1.0f + math.pow(2, -11).toFloat, 3 * math.pow(2, -25).toFloat)
    samples.foreach { x =>
      val bitLevel = F16.roundTrip(x).toDouble
      val sqlLevel = f16SqlMirror(x.toDouble)
      assert(bitLevel == sqlLevel, s"x=$x bit=$bitLevel sql=$sqlLevel")
    }
  }

  test("pack/unpack round-trip through a DataFrame; kernel == driver math") {
    import spark.implicits._
    val va = Array(0.1f, -0.25f, 1.5f, 1e-5f, 0f, -3.75f)
    val vb = Array(0.09f, 0.25f, -1.5f, 2e-5f, 1f, -3.5f)
    val df = Seq((1L, va, vb)).toDF("id", "a", "b")
      .select(col("id"), F16.pack(col("a")).as("pa"), F16.pack(col("b")).as("pb"))
    val up = df.select(F16.unpack(col("pa"))).head().getSeq[Float](0)
    assert(up == va.map(F16.roundTrip).toSeq)
    val wide = df.select(F16.euclideanSqWide(col("pa"), col("pb"))).head().getDouble(0)
    val expected = va.zip(vb).map { case (x, y) =>
      val d = F16.roundTrip(x).toDouble - F16.roundTrip(y).toDouble
      d * d
    }.sum
    assert(wide == expected, s"$wide vs $expected")
    // narrow (float accumulation, the reference's formula) stays close
    val narrow = df.select(F16.euclideanSq(col("pa"), col("pb"))).head().getDouble(0)
    assert(math.abs(narrow - expected) < 1e-5)
  }

  test("f16 kernel stays inside whole-stage codegen") {
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // LocalRelation projection at plan time and hide the codegen star.
    val df = spark.range(100)
      .select(col("id"),
        F16.pack(transform(sequence(lit(0), lit(31)),
          j => ((col("id") + j).cast("float") / 100f).cast("float"))).as("p"))
      .withColumn("d", F16.euclideanSq(col("p"),
        F16.pack(lit(Array.fill(32)(0.5f)).cast("array<float>"))))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("f16_euclidean_sq"))
    assert("""\*\(\d+\) Project \[.*f16_euclidean_sq""".r.findFirstIn(p).isDefined, p)
  }
}
