package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-document repetition statistics — the word-n-gram half of the
  * Gopher repetition battery (Rae et al. 2021 §A1.1): a document is
  * low-quality when a single n-gram dominates it (top-n-gram character
  * fraction, n = 2..4) or when much of it is made of n-grams that occur
  * more than once (duplicated-n-gram character fraction, n = 5..10).
  * Complements [[graft.dedup.Dedup.repeatedSpans]] (cross-document spans)
  * with the within-document view every pretraining filter stack applies.
  *
  * Characters are counted on words only (no separating spaces), matching
  * the Gopher definition; the duplicated fraction counts every occurrence
  * of a duplicated gram and is capped at 1.0 (overlapping occurrences can
  * over-count characters — the standard streaming approximation; an exact
  * character-coverage union would need per-doc interval merging for no
  * extra filtering power).
  *
  * Scale shape: repetition is a PER-DOCUMENT property, so no shuffle is
  * ever needed — [[RepetitionStatsExpression]] computes all 9 gram sizes'
  * integer stats in one imperative pass per row, and only the fraction /
  * threshold arithmetic lives in column math. The whole operator is a
  * single codegen'd projection that fuses with the scan: embarrassingly
  * parallel, zero exchanges, state bounded by one document.
  */
object Repetition {

  private val TopN = Seq(2, 3, 4)
  private val DupN = Seq(5, 6, 7, 8, 9, 10)

  /** Gopher §A1.1 removal thresholds: top-n-gram char fraction and
    * duplicated-n-gram char fraction, keyed by n.
    */
  val Thresholds: Map[Int, Double] = Map(
    2 -> 0.20, 3 -> 0.18, 4 -> 0.16,
    5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** Per-document repetition profile over whitespace words.
    *
    * Output: (doc_id, top_2gram_frac, top_3gram_frac, top_4gram_frac,
    * dup_5gram_frac .. dup_10gram_frac, passes) — fractions rounded to 6
    * decimals, `passes` = every rounded fraction at or under its Gopher
    * threshold. Documents too short to have an n-gram score 0.0 for that
    * n (nothing repeats in them, so they pass that rule).
    */
  def ngramRepetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"),
      RepetitionStatsExpression.statsCol(split(col(textCol), " ")).as("st"))
    val tot = col("st").getField("tot").cast("double")
    // topcnt = 0 (no grams at this n) and tot = 0 (a document whose words
    // are all empty strings — consecutive-space text splits to empty
    // words, so grams exist but carry zero characters) both guard the
    // 0/0 -> NaN edge; the fraction is 0.0 by definition in either case.
    def topF(n: Int): Column = {
      val cnt = col("st").getField(s"top${n}cnt")
      when(cnt === 0 || tot === 0, lit(0.0))
        .otherwise(round((cnt * col("st").getField(s"top${n}chars")) / tot, 6))
        .as(s"top_${n}gram_frac")
    }
    def dupF(n: Int): Column = {
      val dup = col("st").getField(s"dup$n")
      when(dup === 0 || tot === 0, lit(0.0))
        .otherwise(round(least(lit(1.0), dup / tot), 6))
        .as(s"dup_${n}gram_frac")
    }
    val passes = (TopN.map(n => col(s"top_${n}gram_frac") <= Thresholds(n)) ++
      DupN.map(n => col(s"dup_${n}gram_frac") <= Thresholds(n))).reduce(_ && _)
    base
      .select(col("doc_id") +: (TopN.map(topF) ++ DupN.map(dupF)): _*)
      .withColumn("passes", passes)
  }
}
