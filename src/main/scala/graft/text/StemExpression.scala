package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static stem entry points — codegen emits one call per token instead of a
  * ScalaUDF's converter round-trip (the stemmer runs on every analyzed
  * token of the corpus, so this sits inside the BM25/postings hot loop).
  */
object StemKernel {
  def english(s: UTF8String): UTF8String =
    UTF8String.fromString(EnglishStemmer.stem(s.toString))
  def italian(s: UTF8String): UTF8String =
    UTF8String.fromString(ItalianStemmer.stem(s.toString))
}

/** Snowball stem as a native expression: keeps the token pipeline inside
  * whole-stage codegen (tokenize and stopword-filter already are).
  */
case class StemExpression(child: Expression, lang: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = lang match {
    case "italian" => StemKernel.italian(v.asInstanceOf[UTF8String])
    case _         => StemKernel.english(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (lang == "italian") "italian" else "english"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.text.StemKernel.$fn($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = s"stem_$lang"
}

object StemExpression {
  def stemCol(c: Column, lang: String): Column =
    shims.column(StemExpression(shims.expression(c), lang))
}
