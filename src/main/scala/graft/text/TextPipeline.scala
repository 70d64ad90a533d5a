package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Text analysis for large-scale training-data pipelines (builder brief):
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure column math / one grouped aggregation — linear scans that
  * partition trivially at 100 TB.
  */
object TextPipeline {

  /** T7 — text-field auto-detect (`detectTextFieldForIndex`,
    * `pkg/engine/ops.go:1662-1698`): first candidate present in the schema,
    * in the reference's priority order.
    */
  val TextFieldCandidates: Seq[String] =
    Seq("content", "text", "page_content", "body", "description")

  def detectTextField(schema: org.apache.spark.sql.types.StructType): Option[String] =
    TextFieldCandidates.find(schema.fieldNames.contains)

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "is", "a"),
    "es" -> Seq("el", "los", "de", "y", "una"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "une"),
    "zh" -> Seq("de0", "shi4", "le0", "zai4", "he2"))

  /** Tokens of `content` matching `profile` (tf-weighted hit count). */
  def profileScore(content: Column, profile: Seq[String]): Column =
    size(filter(split(content, " "), t => t.isin(profile: _*)))

  /** Language ID: per-language profile scores → argmax (ties alphabetical).
    * Returns (id, lang, score) rows ranked 1 per id — the caller keeps rn=1.
    */
  def langScores(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val scored = LangProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      df.select(col(idCol).as("id"), lit(lang).as("lang"),
        profileScore(col(contentCol), words).cast("long").as("score"))
    }.reduce(_ unionByName _)
    scored.withColumn("rn", row_number().over(
      Window.partitionBy("id").orderBy(col("score").desc, col("lang"))))
  }

  /** [[langScores]]' winner in ONE projection: every profile scores in the
    * same scan and `greatest` over `struct(score, −langIdx)` picks max
    * score with ties to the alphabetically-smallest language — the same
    * row `langScores(...).filter(rn === 1)` keeps, WITHOUT the 5× corpus
    * union or the per-id window shuffle (at 100 TB langid must be a
    * map-only column expression; r16, the x40 top-line). Returns
    * (id, lang, score).
    */
  def langBest(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val langs = LangProfiles.toSeq.sortBy(_._1)
    val best = greatest(langs.zipWithIndex.map { case ((_, words), i) =>
      struct(profileScore(col(contentCol), words).cast("long").as("score"),
        lit(-i).as("nidx"))
    }: _*)
    df.select(col(idCol).as("id"), best.as("_b"))
      .select(col("id"),
        element_at(array(langs.map(l => lit(l._1)): _*),
          -col("_b.nidx") + 1).as("lang"),
        col("_b.score").as("score"))
  }

  /** [[langBest]]'s winning LANGUAGE as one self-contained column
    * expression — no intermediate projection, so it drops into any frame
    * (including a STREAMING one: pure column math, no aggregation — the
    * property the per-language ingest gate needs). Same winner as
    * `langBest(...).select("lang")`: max profile score, ties to the
    * alphabetically-smallest language.
    */
  def langBestLang(contentCol: Column): Column = {
    val langs = LangProfiles.toSeq.sortBy(_._1)
    val best = greatest(langs.zipWithIndex.map { case ((_, words), i) =>
      struct(profileScore(contentCol, words).cast("long").as("score"),
        lit(-i).as("nidx"))
    }: _*)
    element_at(array(langs.map(l => lit(l._1)): _*),
      -best.getField("nidx") + 1)
  }

  /** Quality heuristics (Gopher-style rule set): word count bounds, mean
    * word length bounds, stopword ratio floor, unique-token ratio floor.
    * Each rule contributes 0.25; pass at ≥ 0.75.
    */
  def qualitySignals(content: Column, stopwords: Seq[String]): Seq[(String, Column)] = {
    val toks = split(content, " ")
    val nWords = size(toks)
    val meanLen = aggregate(transform(toks, t => length(t).cast("double")),
      lit(0.0), (a, x) => a + x) / nWords
    val stopRatio = size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / nWords
    val uniqRatio = size(array_distinct(toks)).cast("double") / nWords
    Seq(
      "n_words" -> nWords.cast("long"),
      "mean_word_len" -> meanLen,
      "stop_ratio" -> stopRatio,
      "uniq_ratio" -> uniqRatio,
      "quality" -> (
        when(nWords >= 40 && nWords <= 100000, 0.25).otherwise(0.0) +
          when(meanLen >= 3.0 && meanLen <= 10.0, 0.25).otherwise(0.0) +
          when(stopRatio >= 0.05, 0.25).otherwise(0.0) +
          when(uniqRatio >= 0.3, 0.25).otherwise(0.0)))
  }

  /** Token counting: whitespace tokens, GPT-style pre-tokenizer regex
    * matches, and a BPE-ish subword estimate (ceil(len/4) per word).
    */
  def tokenCounts(content: Column): Seq[(String, Column)] = {
    val toks = split(content, " ")
    Seq(
      "ws_tokens" -> size(toks).cast("long"),
      "re_tokens" -> size(regexp_extract_all(content,
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]+"), lit(0))).cast("long"),
      "est_bpe" -> aggregate(
        transform(toks, t => ceil(length(t) / lit(4.0)).cast("long")),
        lit(0L), (a, x) => a + x))
  }

  /** Rolling-hash fingerprint: min polynomial hash over word 4-gram
    * shingles (winnowing-lite) + shingle cardinality. Identical content →
    * identical fingerprint, independent of partitioning.
    */
  def fingerprint(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    Dedup.shingles(df.select(col(idCol), col(contentCol)), idCol, contentCol, n = 4)
      .withColumn("h", Dedup.polyHash(col("shingle")))
      .groupBy(col("id"))
      .agg(min(col("h")).as("fingerprint"),
        count(lit(1)).as("n_shingles"))
}
