package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Per-document n-gram repetition stats as ONE imperative pass per row —
  * the hot kernel behind [[Repetition.ngramRepetition]].
  *
  * Why an expression and not column math: the declarative forms both pay
  * a per-gram price that dwarfs the work — explode + groupBy shuffles ~9
  * gram rows per word, and an in-row `array_sort`+`aggregate` fold drops
  * out of codegen and rebuilds an interpreted struct per element. The
  * property is strictly per-document, so the right shape is a single
  * projection whose eval builds each doc's gram counts in a hash map:
  * zero exchanges, zero per-element Catalyst interpretation, state
  * bounded by one document. Fractions/thresholds stay in column math on
  * the returned integer stats so rounding parity is identical to every
  * other query.
  *
  * Output struct: tot (word chars, no spaces), then for n = 2..10 the
  * lexicographic-max (count, chars) of any n-gram and the summed
  * `count * chars` over n-grams occurring >= 2 times.
  */
object RepetitionKernel {
  val MinN = 2
  val MaxN = 10

  val schema: StructType = StructType(
    StructField("tot", LongType, nullable = false) +:
      (MinN to MaxN).flatMap(n => Seq(
        StructField(s"top${n}cnt", LongType, nullable = false),
        StructField(s"top${n}chars", LongType, nullable = false),
        StructField(s"dup$n", LongType, nullable = false))))

  def stats(arr: ArrayData): InternalRow = {
    val nWords = arr.numElements()
    val words = new Array[String](nWords)
    val prefix = new Array[Int](nWords + 1)
    var i = 0
    while (i < nWords) {
      val w = arr.getUTF8String(i)
      words(i) = w.toString
      prefix(i + 1) = prefix(i) + w.numChars()
      i += 1
    }
    val out = new Array[Any](1 + 3 * (MaxN - MinN + 1))
    out(0) = prefix(nWords).toLong
    var n = MinN
    var slot = 1
    while (n <= MaxN) {
      var topCnt = 0L
      var topChars = 0L
      var dup = 0L
      if (nWords >= n) {
        val m = nWords - n + 1
        // gram -> [count, word-chars]; equal grams have equal chars, so
        // chars is fixed at first sight from the length prefix sums.
        val counts = new java.util.HashMap[String, Array[Long]](m * 2)
        val sb = new java.lang.StringBuilder(64)
        var j = 0
        while (j < m) {
          sb.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(words(j + k))
            k += 1
          }
          val key = sb.toString
          val v = counts.get(key)
          if (v == null) counts.put(key, Array(1L, (prefix(j + n) - prefix(j)).toLong))
          else v(0) += 1L
          j += 1
        }
        val it = counts.values().iterator()
        while (it.hasNext) {
          val v = it.next()
          if (v(0) > topCnt || (v(0) == topCnt && v(1) > topChars)) {
            topCnt = v(0); topChars = v(1)
          }
          if (v(0) >= 2L) dup += v(0) * v(1)
        }
      }
      out(slot) = topCnt
      out(slot + 1) = topChars
      out(slot + 2) = dup
      slot += 3
      n += 1
    }
    new GenericInternalRow(out)
  }
}

/** `repetition_stats(words)` — see [[RepetitionKernel]]. Codegen emits a
  * single static call so the projection stays inside whole-stage codegen.
  */
case class RepetitionStatsExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionKernel.schema
  override def nullSafeEval(v: Any): Any =
    RepetitionKernel.stats(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.text.RepetitionKernel.stats($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStatsExpression {
  def statsCol(words: Column): Column =
    shims.column(RepetitionStatsExpression(shims.expression(words)))
}
