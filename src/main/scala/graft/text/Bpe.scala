package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction — the tokenizer-TRAINING step of a
  * pre-training data pipeline (Sennrich et al. 2016's byte-pair encoding,
  * the construction behind GPT/Llama tokenizers), re-expressed in the only
  * shape that works at 100 TB:
  *
  *   1. ONE corpus scan folds the documents into a word-frequency table
  *      (explode + keyed count). The corpus is never touched again — after
  *      this point cost is bounded by the VOCABULARY, which saturates long
  *      before the corpus does (Heaps' law), so 10× the documents barely
  *      moves the iteration cost.
  *   2. Each merge round is one keyed aggregation over that table: count
  *      adjacent symbol pairs weighted by word frequency, take the most
  *      frequent pair (ties → lexicographically smallest, engine-neutral),
  *      rewrite every word's symbol string.
  *
  * Words are carried as marker strings `<c><h><a><t>`: symbols can never
  * contain `<`/`>` (the word filter admits `[a-z0-9]+` only), so a merge is
  * a plain substring replace of `<l><r>` with `<lr>` — and both the JVM and
  * DuckDB replace all occurrences LEFT-TO-RIGHT, NON-OVERLAPPING, which is
  * exactly BPE's merge convention (`aaa` + merge(a,a) → `(aa)(a)`). Pair
  * COUNTING is over all adjacent positions (overlapping), Sennrich's
  * counting convention. Everything is integer or ASCII-string math, so an
  * external SQL engine replays the whole training loop bit-for-bit.
  *
  * The driver holds one (pair, count) row per round — the same O(steps)
  * driver state any BPE trainer keeps; the vocabulary table itself never
  * leaves the executors.
  */
object Bpe {

  /** The word-frequency table with initial symbol decomposition:
    * (word, cnt, sym) where sym = `<c><h>...` one marker-wrapped symbol per
    * character. One corpus scan; vocabulary-bounded output. Words shorter
    * than 2 characters can never participate in a merge and are dropped;
    * the `[a-z0-9]+` filter keeps the marker alphabet disjoint from symbol
    * text.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$") && length(col("word")) >= 2)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("sym",
        concat(lit("<"),
          concat_ws("><", regexp_extract_all(col("word"), lit("[a-z0-9]"), lit(0))),
          lit(">")))

  /** Adjacent-pair frequencies over the current symbol table: one keyed
    * aggregation, (lhs, rhs) → Σ word-count over every adjacent position
    * (overlapping occurrences count, per Sennrich).
    */
  private def pairCounts(w: DataFrame): DataFrame =
    w.select(col("cnt"),
        regexp_extract_all(col("sym"), lit("[^<>]+"), lit(0)).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(col("cnt"), explode(zip_with(
        slice(col("ss"), lit(1), size(col("ss")) - 1),
        slice(col("ss"), lit(2), size(col("ss")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** Run `steps` merge rounds and return the learned merge table:
    * (step, lhs, rhs, merged, pair_count), step 1-based in learning order.
    * Deterministic: argmax by (count DESC, lhs ASC, rhs ASC). Each round is
    * one aggregation job over the cached word table plus an O(1) driver
    * decision — the corpus itself is read exactly once, inside
    * [[wordTable]].
    */
  def learnMerges(docs: DataFrame, textCol: String, steps: Int): DataFrame = {
    val spark = docs.sparkSession
    val w0 = wordTable(docs, textCol).cache()
    w0.count()
    var w = w0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= steps && !exhausted) {
      val top = pairCounts(w)
        .orderBy(desc("pair_count"), col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        val (l, rt, c) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += ((i, l, rt, l + rt, c))
        w = w.withColumn("sym",
          replace(col("sym"), lit(s"<$l><$rt>"), lit(s"<$l$rt>")))
        i += 1
      }
    }
    w0.unpersist()
    import spark.implicits._
    merges.toSeq.map { case (s, l, r, m, c) => (s.toLong, l, r, m, c) }
      .toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** ENCODE with a learned merge list: per-document BPE token accounting.
    * Applies the merges in training order to every `[a-z0-9]+` word (all
    * lengths — single-character words are single symbols that no merge can
    * touch) and returns (doc_id, n_words, n_chars, n_bpe_tokens) — the
    * real tokenizer-cost table the `est_bpe` heuristic (x3/x32)
    * approximates. The encode is pure column math: explode words, build
    * the marker string, fold the ≤steps literal replaces, count symbols,
    * one keyed agg per doc — scales like a scan, and the merge list rides
    * inside the plan (a tokenizer IS a broadcast-sized artifact).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .withColumn("sym",
        concat(lit("<"),
          concat_ws("><", regexp_extract_all(col("word"), lit("[a-z0-9]"), lit(0))),
          lit(">")))
    val encoded = merges.foldLeft(words) { case (df, (l, r)) =>
      df.withColumn("sym",
        replace(col("sym"), lit(s"<$l><$r>"), lit(s"<$l$r>")))
    }
    encoded
      .select(col(idCol), length(col("word")).cast("long").as("nch"),
        size(regexp_extract_all(col("sym"), lit("[^<>]+"), lit(0)))
          .cast("long").as("ntok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("nch")).as("n_chars"),
        sum(col("ntok")).as("n_bpe_tokens"))
  }
}
