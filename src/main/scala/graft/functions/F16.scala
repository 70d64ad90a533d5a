package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graft.TypedInputs
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** float16 precision path — the third leg of the reference's precision
  * matrix (`pkg/core/distance/distance_go.go:43-47,92-104,139-141`):
  * vectors stored as IEEE 754 half-precision bit patterns (`[]uint16`
  * there; packed little-endian in a `BinaryType` column here — half the
  * bytes of `array<float>` through every scan), with the f16 kernel
  * decoding to float32 per element and supporting EUCLIDEAN only, exactly
  * the reference's `float16Funcs` table.
  *
  * Conversions are bit-exact IEEE 754 binary16 with round-to-nearest-even,
  * implemented from the public format spec (no Java 20 `float16ToFloat`
  * dependency). The DuckDB oracle replicates the rounding arithmetically
  * (ulp from `floor(log2|x|)`, tie-to-even) — see `SourceQueries.f16Sql`;
  * `F16Spec` pins the two formulations against each other and round-trips
  * every 16-bit pattern.
  */
object F16 {

  /** Branch-free decode path: all 65536 patterns precomputed at class load
    * (256 KB, per JVM). The scan kernel's inner loop then costs one array
    * load per element instead of the exponent-case branches — the standard
    * table-driven half→float decode.
    */
  private val decodeLut: Array[Float] = {
    val t = new Array[Float](0x10000)
    var h = 0
    while (h < 0x10000) { t(h) = toFloatCompute(h); h += 1 }
    t
  }

  /** Decode one half-precision bit pattern (low 16 bits used) to float. */
  def toFloat(h: Int): Float = decodeLut(h & 0xffff)

  /** Bit-level decode (LUT source of truth; kept for documentation). */
  private def toFloatCompute(h: Int): Float = {
    val s = (h & 0x8000) << 16
    val e = (h >>> 10) & 0x1f
    val m = h & 0x3ff
    if (e == 0) {
      if (m == 0) java.lang.Float.intBitsToFloat(s) // ±0
      else {
        val mag = m / 16777216.0f // m × 2⁻²⁴, exact
        if (s != 0) -mag else mag
      }
    } else if (e == 31) {
      if (m == 0) java.lang.Float.intBitsToFloat(s | 0x7f800000)
      else Float.NaN
    } else {
      java.lang.Float.intBitsToFloat(s | ((e + 112) << 23) | (m << 13))
    }
  }

  /** Encode a float to the nearest half-precision bit pattern,
    * round-to-nearest-even; overflow → ±Inf, f32 subnormals → ±0.
    */
  def toBits(f: Float): Int = {
    val fbits = java.lang.Float.floatToIntBits(f)
    val sign = (fbits >>> 16) & 0x8000
    val exp32 = (fbits >>> 23) & 0xff
    val man32 = fbits & 0x7fffff
    if (exp32 == 0xff)                     // Inf / NaN (canonical quiet NaN)
      return sign | 0x7c00 | (if (man32 != 0) 0x200 else 0)
    if (exp32 == 0) return sign            // f32 subnormal < 2⁻¹²⁶ → ±0
    val e = exp32 - 127
    if (e > 15) return sign | 0x7c00       // ≥ 2¹⁶ → Inf
    var shift = 13
    var he = e + 15
    if (e < -14) { shift = 13 + (-14 - e); he = 0 } // f16 subnormal range
    if (shift >= 25) return sign           // < 2⁻²⁵ → ±0
    val sig = 0x800000 | man32             // 24-bit significand incl hidden
    val roundBit = 1 << (shift - 1)
    val stickyMask = roundBit - 1
    var m = sig >>> shift
    if ((sig & roundBit) != 0 && ((sig & stickyMask) != 0 || (m & 1) == 1))
      m += 1
    if (he == 0) {
      if (m >= 0x400) { he = 1; m -= 0x400 } // rounded up into normal range
    } else {
      if (m >= 0x800) { m >>>= 1; he += 1 }  // significand carry
      m -= 0x400                             // drop hidden bit
    }
    if (he >= 31) return sign | 0x7c00       // rounding overflow → Inf
    sign | (he << 10) | m
  }

  /** Round-trip through f16: the value the stored half-float represents. */
  def roundTrip(f: Float): Float = toFloat(toBits(f))

  /** Pack a float array into little-endian half-float bytes. */
  def packArray(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val b = toBits(a.getFloat(i))
      out(2 * i) = (b & 0xff).toByte
      out(2 * i + 1) = ((b >>> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Unpack little-endian half-float bytes to the float values they hold. */
  def unpackArray(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length / 2
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = toFloat(((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff))
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- Column API ----
  private def ex(c: Column): Expression = shims.expression(c)
  private def co(e: Expression): Column = shims.column(e)

  /** `array<float>` → packed-f16 `binary` (the storage migration). */
  def pack(v: Column): Column = co(F16PackExpr(ex(v)))

  /** Packed-f16 `binary` → `array<float>` (decode for interop/debug). */
  def unpack(v: Column): Column = co(F16UnpackExpr(ex(v)))

  /** Squared L2 over two packed-f16 vectors, float accumulation like the
    * reference (`squaredEuclideanGoFloat16`, `distance_go.go:92-104`).
    */
  def euclideanSq(a: Column, b: Column): Column =
    co(F16EuclideanSqDistance(ex(a), ex(b)))

  /** Double-accumulated variant for oracle-parity math. */
  def euclideanSqWide(a: Column, b: Column): Column =
    co(F16EuclideanSqDistance(ex(a), ex(b), wide = true))
}

/** `array<float>` → packed little-endian f16 `binary`. */
case class F16PackExpr(child: Expression) extends UnaryExpression
    with TypedInputs {
  override def expectedInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    F16.packArray(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.F16.packArray($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "f16_pack"
}

/** Packed f16 `binary` → `array<float>`. */
case class F16UnpackExpr(child: Expression) extends UnaryExpression
    with TypedInputs {
  override def expectedInputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    F16.unpackArray(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.F16.unpackArray($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "f16_unpack"
}

/** Squared Euclidean distance over packed-f16 vectors — the f16 analogue of
  * [[EuclideanSqDistance]] (`distance_go.go:92-104`: decode each element to
  * float32, diff², accumulate in float32; `wide` widens the accumulator for
  * oracle parity). A codegen tight loop over the raw byte arrays: the scan
  * streams HALF the bytes of the float32 kernel — the memory-bandwidth win
  * that motivates f16 storage at 100 TB.
  */
case class F16EuclideanSqDistance(left: Expression, right: Expression,
    wide: Boolean = false) extends BinaryExpression with TypedInputs {
  override def expectedInputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"f16 vectors must have the same length: ${a.length} vs ${b.length}")
    val n = a.length / 2
    if (wide) {
      var sum = 0d; var i = 0
      while (i < n) {
        val x = F16.toFloat(((a(2 * i + 1) & 0xff) << 8) | (a(2 * i) & 0xff))
        val y = F16.toFloat(((b(2 * i + 1) & 0xff) << 8) | (b(2 * i) & 0xff))
        val d = x.toDouble - y.toDouble
        sum += d * d; i += 1
      }
      sum
    } else {
      var sum = 0f; var i = 0
      while (i < n) {
        val x = F16.toFloat(((a(2 * i + 1) & 0xff) << 8) | (a(2 * i) & 0xff))
        val y = F16.toFloat(((b(2 * i + 1) & 0xff) << 8) | (b(2 * i) & 0xff))
        val d = x - y
        sum += d * d; i += 1
      }
      sum.toDouble
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val accT = if (wide) "double" else "float"
      s"""
         |if ($a.length != $b.length) {
         |  throw new IllegalArgumentException("f16 vectors must have the same length");
         |}
         |final int $n = $a.length / 2;
         |$accT $sum = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $x = graft.functions.F16.toFloat((($a[2 * $i + 1] & 0xff) << 8) | ($a[2 * $i] & 0xff));
         |  float $y = graft.functions.F16.toFloat((($b[2 * $i + 1] & 0xff) << 8) | ($b[2 * $i] & 0xff));
         |  $accT $d = ($accT) $x - ($accT) $y;
         |  $sum += $d * $d;
         |}
         |${ev.value} = (double) $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "f16_euclidean_sq"
}
