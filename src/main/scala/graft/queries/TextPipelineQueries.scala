package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.Dedup
import graft.text.TextPipeline

/** X1-X4: training-data text pipeline queries over `documents`.
  *
  * For language ID, per-language stopwords are injected into the content
  * keyed off the table's `lang` column (the raw synthetic text is all
  * English vocabulary), so the detector has real multilingual signal and
  * `lang` becomes usable ground truth.
  */
object TextPipelineQueries {

  /** x36's per-document bigram-LM surprisal — (doc_id, n_bigrams,
    * surprisal_bits, mean_milli), all integers (floor-log2 bits of the
    * add-smoothed inverse probability, so no transcendental enters the
    * hash compare). Shared by x36 (corpus-mean keep cut) and x39 (CCNet
    * per-language perplexity buckets). LM slice = doc_id % 5 = 0. Shape
    * at 100 TB: corpus-scaling LM tables ride KEYED joins (never
    * broadcast); V is a broadcast 1-row aggregate.
    */
  private def perDocSurprisal(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    surprisalOf(
      docs.filter(col("doc_id") % 5 === 0).select(col("text")),
      docs.select(col("doc_id"), col("text")), "doc_id")

  /** Bigram-LM surprisal of `scored` docs against an LM trained on
    * `lmDocs` — the general two-corpus form of x36 (CCNet trains on the
    * target domain, scores the crawl; x36's self-scoring is the special
    * case lmDocs = the %5 slice of the scored corpus). Same integer
    * floor-log2 quantization, same add-smoothed (c1 + V)/(c12 + 1)
    * inverse probability, so results stay hash-exact against a SQL
    * replay. Scale shape unchanged: LM tables are KEYED joins (they grow
    * with the corpus), V rides a broadcast 1-row aggregate.
    *
    * @param lmDocs one `text` column, the LM training corpus.
    * @param scored `(idCol, text)` rows to score; docs with < 2 tokens
    *   produce no bigrams and drop out.
    */
  private[queries] def surprisalOf(
      lmDocs: org.apache.spark.sql.DataFrame,
      scored: org.apache.spark.sql.DataFrame,
      idCol: String): org.apache.spark.sql.DataFrame = {
    def bigrams(df: org.apache.spark.sql.DataFrame,
        id: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = df
      .select(id.as("_bid"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("_bid"), explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("_bid"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val lm = bigrams(lmDocs, lit(0L))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val uni = lm.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = lmDocs
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t")).as("nv"))
    val sc = bigrams(scored, col(idCol)).crossJoin(broadcast(v))
      .join(lm, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .withColumn("bits",
        (length(bin(expr("(coalesce(c1, 0) + nv) div (coalesce(c12, 0) + 1)"))) - 1)
          .cast("long"))
    sc.groupBy(col("_bid"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("surprisal_bits"))
      .withColumn("mean_milli", expr("(1000 * surprisal_bits) div n_bigrams"))
      .withColumnRenamed("_bid", idCol)
  }

  /** lang-keyed stopword injection, ×3 so the injected language outscores
    * the English base-vocabulary hits.
    */
  private def injected(lang: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val phrase = when(lang === "es", "el los de y una")
      .when(lang === "de", "der die das und ein")
      .when(lang === "fr", "le la les et une")
      .when(lang === "zh", "de0 shi4 le0 zai4 he2")
      .otherwise("the of and is a")
    concat(text, lit(" "), phrase, lit(" "), phrase, lit(" "), phrase)
  }

  private val injectedSql =
    """injected AS (
      |  SELECT doc_id, lang,
      |    text || ' ' || repeat(CASE lang
      |      WHEN 'es' THEN 'el los de y una'
      |      WHEN 'de' THEN 'der die das und ein'
      |      WHEN 'fr' THEN 'le la les et une'
      |      WHEN 'zh' THEN 'de0 shi4 le0 zai4 he2'
      |      ELSE 'the of and is a' END || ' ', 3) AS content
      |  FROM documents
      |)""".stripMargin

  private[queries] val stop25 = Seq("a", "an", "and", "are", "as", "at", "be", "by",
    "for", "from", "has", "he", "in", "is", "it", "its", "of", "on", "that",
    "the", "to", "was", "were", "will", "with")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X1: stopword-profile language ID, checked against the lang column.
    "x1_langid" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          injected(col("lang"), col("text")).as("content"))
      // One-scan argmax (TextPipeline.langBest, r16): same winner row as
      // langScores(...).filter(rn === 1), without the 5-way corpus union
      // or the per-id window shuffle — langid is map-only at 100 TB.
      TextPipeline.langBest(docs, "doc_id", "content")
        .join(docs.select(col("doc_id").as("id"), col("lang").as("truth")), Seq("id"))
        .select(col("id").cast("long").as("doc_id"),
          col("lang").as("predicted"), col("score"), col("truth"),
          (col("lang") === col("truth")).as("correct"))
        .orderBy(col("doc_id"))
    }),

    // X2: quality scoring — Gopher-style rule composite.
    "x2_quality" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val sig = TextPipeline.qualitySignals(col("text"), stop25).toMap
      docs.select(col("doc_id"),
          sig("n_words").as("n_words"),
          round(sig("mean_word_len"), 6).as("mean_word_len"),
          round(sig("stop_ratio"), 6).as("stop_ratio"),
          round(sig("uniq_ratio"), 6).as("uniq_ratio"),
          round(sig("quality"), 2).as("quality"),
          (sig("quality") >= 0.75).as("pass"))
        .orderBy(col("doc_id"))
    }),

    // X3: token counting — whitespace, pre-tokenizer regex, BPE estimate.
    "x3_token_counts" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val tc = TextPipeline.tokenCounts(col("text")).toMap
      docs.select(col("doc_id"), tc("ws_tokens").as("ws_tokens"),
          tc("re_tokens").as("re_tokens"), tc("est_bpe").as("est_bpe"))
        .orderBy(col("doc_id"))
    }),

    // X32: tokenizer fertility per (lang, source) — the multilingual
    // mixture-planning signal: how many (estimated BPE) tokens a corpus
    // slice costs per word and per character. Languages with high
    // fertility burn budget faster; mixture weights (x7/x26) that ignore
    // this over-train on cheap-token languages. One keyed agg over
    // per-row column math; ratios in integer ppm via integer div — no
    // float anywhere, so engine parity is exact.
    "x32_token_fertility" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tc = TextPipeline.tokenCounts(col("text")).toMap
      docs.select(col("lang"), col("source"),
          length(col("text")).cast("long").as("nch"),
          tc("ws_tokens").as("ws"), tc("re_tokens").as("re"),
          tc("est_bpe").as("bpe"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nch")).as("n_chars"),
          sum(col("ws")).as("ws_tokens"), sum(col("re")).as("re_tokens"),
          sum(col("bpe")).as("bpe_tokens"))
        .select(col("lang"), col("source"), col("n_docs"), col("n_chars"),
          col("ws_tokens"), col("re_tokens"), col("bpe_tokens"),
          expr("(1000000 * bpe_tokens) div ws_tokens").as("fertility_ppm"),
          expr("(1000000 * n_chars) div bpe_tokens").as("chars_per_tok_ppm"))
        .orderBy(col("lang"), col("source"))
    }),

    // X33: distilled quality-classifier INFERENCE at corpus scale — the
    // FineWeb-Edu pattern: a cheap linear model over hashed bag-of-words
    // scores every document, and a threshold keeps the high-quality
    // slice. The plumbing is the point (at deployment the weight table
    // comes from a trained classifier, broadcast or folded into the
    // expression): per-row column math only — tokenize, hash each token
    // with the engine-independent PolyHash kernel, look up a weight,
    // fold — ZERO shuffle, no UDF, scales like a scan. Stand-in weights
    // derive deterministically from the hash ((h % 1001) - 500) so the
    // oracle replays inference exactly; the mean is computed over a
    // +500-shifted numerator so Spark's truncating `div` and DuckDB's
    // flooring `//` agree (non-negative operands).
    "x33_quality_classifier" -> ((s, dir) => {
      val toks = org.apache.spark.sql.functions.split(col("text"), " ")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          aggregate(
            transform(toks, t => (Dedup.polyHash(t) % 1001L) - 500L),
            lit(0L), (acc, x) => acc + x).as("raw"))
        .select(col("doc_id"), col("n_tokens"),
          expr("(raw + 500 * n_tokens) div n_tokens").as("score_milli"))
        .withColumn("keep", col("score_milli") >= 510)
        .orderBy(col("doc_id"))
    }),

    // X34: DSIR data selection (Xie et al. 2023, arXiv:2302.03169) — the
    // published importance-resampling recipe for picking raw-pool docs
    // that look like a curated target: hashed-feature (unigram → 4096
    // buckets via the engine-independent PolyHash) distributions for the
    // TARGET slice (lang = 'en', the curated stand-in) and the RAW pool,
    // then per-doc importance = Σ over tokens of the target-vs-raw bucket
    // probability difference. Probabilities are integer ppm (exact in
    // both engines; the linearized difference replaces the paper's
    // log-ratio so the weight stays integer — same sign, same ordering on
    // the common case). Shape at 100 TB: both distribution tables are
    // ≤4096 rows (broadcast), the raw token stream takes ONE map-side
    // broadcast join, and the only shuffle is the per-doc keyed agg.
    "x34_dsir" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"))
      val tok = docs.select(col("doc_id"), col("lang"),
        explode(transform(split(col("text"), " "),
          t => Dedup.polyHash(t) % 4096L)).as("bucket"))
      val tgt = tok.filter(col("lang") === "en")
        .groupBy(col("bucket")).agg(count(lit(1)).as("tc"))
      val tt = tgt.agg(sum(col("tc")).as("ts"))
      val raw = tok.filter(col("lang") =!= "en")
        .groupBy(col("bucket")).agg(count(lit(1)).as("rc"))
      val rt = raw.agg(sum(col("rc")).as("rs"))
      val diff = raw.crossJoin(broadcast(tt)).crossJoin(broadcast(rt))
        .join(tgt, Seq("bucket"), "left")
        .select(col("bucket"),
          (coalesce(expr("(1000000 * tc) div ts"), lit(0L)) -
            expr("(1000000 * rc) div rs")).as("d"))
      tok.filter(col("lang") =!= "en")
        .join(broadcast(diff), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("d")).as("dsir_weight"))
        .withColumn("keep", col("dsir_weight") > 0)
        .orderBy(col("doc_id"))
    }),

    // X36: n-gram LM surprisal scoring — CCNet's actual mechanism (x17 is
    // the vocabulary-rarity analogue): train a bigram LM on a reference
    // slice (doc_id % 5 = 0), score every document by per-bigram
    // surprisal, keep the docs at-or-below the corpus-average surprisal
    // (CCNet keeps the low-perplexity slice; the corpus mean is the
    // deterministic, self-calibrating cut). Surprisal is quantized to
    // INTEGER floor-log2 bits — `length(bin(q)) - 1` is exact in both
    // engines — of the add-smoothed inverse probability
    // (c1 + V) / (c12 + 1), so no transcendental function ever enters the
    // hash compare. Shape at 100 TB: the LM tables scale with the corpus,
    // so they are KEYED joins (never broadcast) — one (w1,w2) hash join,
    // one w1 hash join (stopword-headed keys skew mildly; AQE's skew
    // split handles it), one per-doc agg; V and the corpus mean ride
    // broadcast 1-row aggregates.
    "x36_lm_surprisal" -> ((s, dir) => {
      val per = perDocSurprisal(Tables.documents(s, dir))
      val corp = per.agg(
        expr("(1000 * sum(surprisal_bits)) div sum(n_bigrams)").as("cm"))
      per.crossJoin(broadcast(corp))
        .select(col("doc_id"), col("n_bigrams"), col("surprisal_bits"),
          col("mean_milli"), (col("mean_milli") <= col("cm")).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // X39: CCNet's perplexity-bucket partitioning (arXiv:1911.00359 §3.2
    // — "head/middle/tail" per language), completing the CCNet trilogy
    // (paragraph dedup d13/s20, LM scoring x36, this bucketing): each
    // language's docs split at the terciles of their x36 surprisal
    // (mean_milli — integer, so both engines agree bit-for-bit), head =
    // lowest perplexity. Thresholds are EXACT k-th order statistics over
    // a deterministic ≤25k-smallest-doc_id sample per language (the
    // Quantizer.train precedent): the per-language sorted buffer is
    // bounded no matter the corpus, where a per-language ntile window
    // would sort every doc of one language in one task at 100 TB. Sample
    // selection itself is the bounded TopK aggregate (map-side partials).
    // Buckets then ride one broadcast join (n_languages rows).
    "x39_ccnet_ppl_buckets" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val per = perDocSurprisal(docs)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      val sampleIds = per
        .groupBy(col("lang"))
        .agg(graft.functions.TopK.topK(
          col("doc_id"), col("doc_id").cast("double"), 25000).as("_tk"))
        .select(col("lang"), explode(col("_tk")).as("_e"))
        .select(col("lang"), col("_e.id").as("doc_id"))
      val thr = per.join(sampleIds, Seq("doc_id", "lang"))
        .groupBy(col("lang"))
        .agg(sort_array(collect_list(col("mean_milli"))).as("ms"))
        .select(col("lang"),
          element_at(col("ms"),
            ceil(size(col("ms")) / 3.0).cast("int")).as("t1"),
          element_at(col("ms"),
            ceil(size(col("ms")) * 2 / 3.0).cast("int")).as("t2"))
      per.join(broadcast(thr), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("mean_milli"),
          when(col("mean_milli") <= col("t1"), "head")
            .when(col("mean_milli") <= col("t2"), "middle")
            .otherwise("tail").as("ppl_bucket"))
        .orderBy(col("doc_id"))
    }),

    // X40: CCNet's ACTUAL per-language shape (arXiv:1911.00359 §3.2,
    // VERDICT r15 next-round #4) — x39 buckets per language but scores
    // every doc against ONE shared LM; CCNet runs langid first and then
    // trains a SEPARATE LM per language (fastText → per-language
    // KenLM). Composition: x1's stopword-profile langid predicts each
    // doc's language; each predicted language trains its own bigram LM
    // on ITS %5 slice (lang is simply one more key on the lm/uni/vocab
    // tables — the joins stay keyed, never broadcast, except the
    // n_languages-row vocab and tercile tables); docs score against
    // their own language's LM and bucket head/middle/tail at their own
    // language's sampled terciles (x39's bounded order-statistics, keep
    // = not-tail). Integer math end to end, so the five-stage chain
    // (langid → slice → LM → surprisal → buckets) is hash-checked. A
    // predicted language with an empty %5 slice has no vocabulary row
    // and its docs drop (inner join) — deliberate and replayed by the
    // oracle: CCNet cannot score a language it has no LM for.
    "x40_ccnet_per_lang" -> ((s, dir) => {
      val raw = Tables.documents(s, dir)
      val docs = raw.select(col("doc_id"), col("lang"),
        injected(col("lang"), col("text")).as("content"))
      val pred = TextPipeline.langBest(docs, "doc_id", "content")
        .select(col("id").cast("long").as("doc_id"),
          col("lang").as("plang"))
      val d = raw.select(col("doc_id"), col("text")).join(pred, Seq("doc_id"))
      def bigrams(df: DataFrame): DataFrame = df
        .select(col("doc_id"), col("plang"), split(col("text"), " ").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("doc_id"), col("plang"), explode(zip_with(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .select(col("doc_id"), col("plang"),
          col("p.w1").as("w1"), col("p.w2").as("w2"))
      val lmSlice = d.filter(col("doc_id") % 5 === 0)
      val lm = bigrams(lmSlice)
        .groupBy(col("plang"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
      val uni = lm.groupBy(col("plang"), col("w1"))
        .agg(sum(col("c12")).as("c1"))
      val v = lmSlice
        .select(col("plang"), explode(split(col("text"), " ")).as("t"))
        .groupBy(col("plang")).agg(countDistinct(col("t")).as("nv"))
      val sc = bigrams(d)
        .join(broadcast(v), Seq("plang"))
        .join(lm, Seq("plang", "w1", "w2"), "left")
        .join(uni, Seq("plang", "w1"), "left")
        .withColumn("bits",
          (length(bin(expr(
            "(coalesce(c1, 0) + nv) div (coalesce(c12, 0) + 1)"))) - 1)
            .cast("long"))
      // Pinned: `per` feeds the sample, the tercile aggregate AND the
      // final projection — three references that would each re-evaluate
      // the langid scan + bigram explosions + LM joins (the s21/ADVICE
      // r15 re-evaluation hazard; r16 self-review).
      val per = sc.groupBy(col("doc_id"), col("plang"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("bits")).as("surprisal_bits"))
        .withColumn("mean_milli",
          expr("(1000 * surprisal_bits) div n_bigrams"))
        .localCheckpoint(true)
      val sampleIds = per
        .groupBy(col("plang"))
        .agg(graft.functions.TopK.topK(
          col("doc_id"), col("doc_id").cast("double"), 25000).as("_tk"))
        .select(col("plang"), explode(col("_tk")).as("_e"))
        .select(col("plang"), col("_e.id").as("doc_id"))
      val thr = per.join(sampleIds, Seq("doc_id", "plang"))
        .groupBy(col("plang"))
        .agg(sort_array(collect_list(col("mean_milli"))).as("ms"))
        .select(col("plang"),
          element_at(col("ms"),
            ceil(size(col("ms")) / 3.0).cast("int")).as("t1"),
          element_at(col("ms"),
            ceil(size(col("ms")) * 2 / 3.0).cast("int")).as("t2"))
      per.join(broadcast(thr), Seq("plang"))
        .select(col("doc_id"), col("plang").as("lang_pred"),
          col("n_bigrams"), col("surprisal_bits"), col("mean_milli"),
          when(col("mean_milli") <= col("t1"), "head")
            .when(col("mean_milli") <= col("t2"), "middle")
            .otherwise("tail").as("ppl_bucket"),
          (col("mean_milli") <= col("t2")).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // X41: the per-language CCNet gate AS SERVED AT INGEST (VERDICT r16
    // #6) — the BATCH DEGRADE of Streams.surprisalGatePerLangStream, so
    // the oracle checks the exact code the stream runs: map-only langid
    // (TextPipeline.langBestLang — one column expression, no shuffle) →
    // per-language frozen-LM surprisal (keyed joins; plang is one more
    // join key) → per-language calibrated cut (that language's corpus
    // mean, x36's calibration run per language — a gate consumes cuts as
    // an offline artifact, so calibration here is the offline job the
    // artifacts come from). x40 is the tercile-bucketing sibling; this
    // is the keep/drop gate a streaming ingest actually applies.
    "x41_perlang_gate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          injected(col("lang"), col("text")).as("content"))
      val d = docs.withColumn("plang",
        TextPipeline.langBestLang(col("content")))
      def bigrams(df: DataFrame): DataFrame = df
        .select(col("doc_id"), col("plang"),
          split(col("content"), " ").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("doc_id"), col("plang"), explode(zip_with(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .select(col("doc_id"), col("plang"),
          col("p.w1").as("w1"), col("p.w2").as("w2"))
      // Offline training + calibration (pinned: the gate reconsumes lm/
      // uni/v, and cuts' own chain would otherwise re-run the langid scan
      // and bigram explosions — the s21/x40 re-evaluation hazard).
      val lmSlice = d.filter(col("doc_id") % 5 === 0)
      val lm = bigrams(lmSlice)
        .groupBy(col("plang"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
        .localCheckpoint(true)
      val uni = lm.groupBy(col("plang"), col("w1"))
        .agg(sum(col("c12")).as("c1"))
      val v = lmSlice
        .select(col("plang"), explode(split(col("content"), " ")).as("t"))
        .groupBy(col("plang")).agg(countDistinct(col("t")).as("nv"))
        .localCheckpoint(true)
      val cuts = bigrams(d)
        .join(broadcast(v), Seq("plang"))
        .join(lm, Seq("plang", "w1", "w2"), "left")
        .join(uni, Seq("plang", "w1"), "left")
        .withColumn("bits",
          (length(bin(expr(
            "(coalesce(c1, 0) + nv) div (coalesce(c12, 0) + 1)"))) - 1)
            .cast("long"))
        .groupBy(col("doc_id"), col("plang"))
        .agg(count(lit(1)).as("nb"), sum(col("bits")).as("sb"))
        .groupBy(col("plang"))
        .agg(expr("(1000 * sum(sb)) div sum(nb)").as("cut_milli"))
        .localCheckpoint(true)
      graft.streaming.Streams.surprisalGatePerLangStream(
          docs, "content", eventTimeCol = "_unused_on_batch",
          lm, uni, v, cuts)
        .orderBy(col("doc_id"))
    }),

    // X4: rolling-hash fingerprint over word 4-gram shingles.
    "x4_fingerprint" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      TextPipeline.fingerprint(docs, "doc_id", "text")
        .select(col("id").cast("long").as("doc_id"), col("fingerprint"),
          col("n_shingles"))
        .orderBy(col("doc_id"))
    }),

    // X5: the training-data funnel as ONE declarative plan — exact dedup
    // (min doc_id per content hash), quality gate (Gopher-style composite ≥
    // 0.5 and enough words to shingle), fingerprint near-dup (min doc_id
    // per rolling-hash fingerprint among survivors), then the per-language
    // kept-token budget. Every stage is a key-grouped aggregation or a
    // column expression — no windows, no all-pairs joins — so the funnel
    // partitions exactly like its parts do at 100 TB.
    "x5_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"))
      val sig = TextPipeline.qualitySignals(col("text"), stop25).toMap
      val tc = TextPipeline.tokenCounts(col("text")).toMap
      // Stage 1: exact-duplicate canonicalization (d1's shape).
      val canon = docs
        .groupBy(sha2(col("text"), 256).as("hsh"))
        .agg(min(col("doc_id")).as("keep_id"))
      val d1 = docs.withColumn("hsh", sha2(col("text"), 256))
        .join(canon, Seq("hsh"))
        .withColumn("exact_keep", col("doc_id") === col("keep_id"))
        .drop("hsh", "keep_id")
      // Stage 2: quality gate on the exact survivors (≥ 4 words so the
      // 4-gram fingerprint below is defined).
      val d2 = d1
        .withColumn("quality", sig("quality"))
        .withColumn("q_keep",
          col("exact_keep") && col("quality") >= 0.5 && sig("n_words") >= 4)
      // Stage 3: near-dup canonicalization by rolling-hash fingerprint
      // (x4's shape), among quality survivors only.
      val fp = TextPipeline.fingerprint(
          d2.filter(col("q_keep")).select(col("doc_id"), col("text")),
          "doc_id", "text")
        .select(col("id").as("doc_id"), col("fingerprint"))
      val canon2 = fp.groupBy(col("fingerprint"))
        .agg(min(col("doc_id")).as("fp_keep_id"))
      val d3 = d2
        .join(fp, Seq("doc_id"), "left")
        .join(canon2, Seq("fingerprint"), "left")
        .withColumn("final_keep",
          col("q_keep") && col("doc_id") === col("fp_keep_id"))
      // Stage 4: what survived, and how many tokens it buys, per language.
      d3
        .withColumn("ws", tc("ws_tokens"))
        .withColumn("bpe", tc("est_bpe"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_raw"),
          sum(when(col("exact_keep"), 1L).otherwise(0L)).as("n_exact"),
          sum(when(col("q_keep"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("final_keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("final_keep"), col("ws")).otherwise(0L)).as("ws_tokens_kept"),
          sum(when(col("final_keep"), col("bpe")).otherwise(0L)).as("bpe_kept"))
        .orderBy(col("lang"))
    }),

    // X6: benchmark decontamination — the standard pre-training step that
    // drops corpus documents overlapping an eval/benchmark set. The
    // benchmark side is SMALL by nature (eval suites are thousands of
    // rows, the corpus is billions), so its distinct 5-gram shingles
    // broadcast and the corpus side streams through one hash join — no
    // shuffle of corpus shingles, the only shape that works at 100 TB.
    // Planted contamination: every benchmark doc gets a truncated copy
    // (first 20 words) injected into the corpus at +500000, the realistic
    // partial-quote case exact dedup misses.
    "x6_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val planted = bench.select((col("doc_id") + 500000).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 20)).as("text"))
      val corpus = docs.filter(col("doc_id") % 97 =!= 0).unionByName(planted)
      val bsh = Dedup.shingles(bench, "doc_id", "text", n = 5)
        .select(col("shingle")).distinct()
      val csh = Dedup.shingles(corpus, "doc_id", "text", n = 5)
      csh.join(broadcast(bsh), Seq("shingle"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_overlap"))
        .select(col("id").as("doc_id"), col("n_overlap"))
        .orderBy(col("doc_id"))
    }),

    // X31: overlap-FRACTION decontamination — the published n-gram-
    // fraction rule (GPT-3 appendix C / PaLM's decontamination): a train
    // doc is contaminated w.r.t. an eval doc when a large fraction of the
    // eval doc's n-grams appear in it — per-PAIR attribution with a
    // threshold, where x6 only flags ≥1 shared shingle against the pooled
    // eval set. Eval suites are small by definition → both the per-bench
    // shingle sets and the per-bench sizes broadcast; the corpus shingle
    // stream takes ONE hash join and one keyed (corpus_doc, bench_doc)
    // count — fan-out is bounded by the bench shingle total, never
    // all-pairs. The cut and the reported fraction are pure integer math
    // (n_shared*4 >= n_bench; ppm via integer div) — no float anywhere.
    // Planted half-doc copies (the realistic partial-quote leak) are the
    // ground truth the threshold must catch.
    "x31_contamination_frac" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val w = org.apache.spark.sql.functions.split(col("text"), " ")
      val planted = bench.select((col("doc_id") + 600000).as("doc_id"),
        concat_ws(" ", slice(w, lit(1),
          ((size(w) + lit(1)) / lit(2)).cast("int"))).as("text"))
      val corpus = docs.filter(col("doc_id") % 97 =!= 0).unionByName(planted)
      val bsh = Dedup.shingles(bench, "doc_id", "text", n = 5)
        .select(col("id").as("bid"), col("shingle"))
      val bn = bsh.groupBy(col("bid")).agg(count(lit(1)).as("n_bench"))
      Dedup.shingles(corpus, "doc_id", "text", n = 5)
        .join(broadcast(bsh), Seq("shingle"))
        .groupBy(col("id"), col("bid"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(bn), Seq("bid"))
        .filter(col("n_shared") * 4 >= col("n_bench"))
        .select(col("id").as("doc_id"), col("bid").as("bench_id"),
          col("n_shared"), col("n_bench"),
          expr("(1000000 * n_shared) div n_bench").as("frac_ppm"))
        .orderBy(col("doc_id"), col("bench_id"))
    }),

    // X7: data-mixing weights + reproducible sampling — the step that
    // turns a multi-source corpus into a training mixture. Per-source
    // token masses get a square-root temperature weight (down-weights the
    // dominant source; sqrt is IEEE-exact in both engines, unlike pow),
    // expressed as parts-per-million of the largest source, and each doc's
    // keep/drop decision is a pure integer hash of its id against that
    // ppm — the same decision on any cluster, any partitioning, any rerun.
    // The whole-corpus max rides a broadcast 1-row agg join (never a
    // global window).
    "x7_source_mix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val tc = TextPipeline.tokenCounts(col("text")).toMap
      val withTok = docs.withColumn("ws", tc("ws_tokens"))
      val perSrc = withTok.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("ws_tokens"))
      val tmax = perSrc.agg(max(col("ws_tokens")).as("tmax"))
      val weighted = perSrc.crossJoin(broadcast(tmax))
        .withColumn("mix_ppm",
          floor(lit(1000000.0) *
            sqrt(col("ws_tokens").cast("double") / col("tmax"))).cast("long"))
        .select(col("source"), col("n_docs"), col("ws_tokens"), col("mix_ppm"))
      val sampled = withTok
        .join(broadcast(weighted.select(col("source"), col("mix_ppm"))),
          Seq("source"))
        .filter((col("doc_id") * 2654435761L) % 1000000L < col("mix_ppm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("ws")).as("ws_sampled"))
      weighted.join(sampled, Seq("source"), "left")
        .na.fill(0L, Seq("n_sampled", "ws_sampled"))
        .orderBy(col("source"))
    }),

    // X8: intra-document repetition — the Gopher-style quality signals a
    // near-dup pass does not see (a document can be unique corpus-wide and
    // still be 90% self-repetition). Duplicate word-3-gram fraction +
    // top-word concentration, both per-doc keyed aggregations (no windows,
    // no joins — partitions like a plain scan at 100 TB). Unlike x4/d2 the
    // 3-grams here are NOT deduped first: repetition is exactly what
    // dedup'd shingles erase.
    "x8_repetition" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val words = split(col("text"), " ")
      val withW = docs.withColumn("nw", size(words)).filter(col("nw") >= 3)
      val grams = withW.select(col("doc_id"), col("nw"),
        explode(transform(sequence(lit(1), col("nw") - 2),
          i => concat_ws(" ", slice(words, i, lit(3))))).as("g"))
      val gstats = grams.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          count_distinct(col("g")).as("n_distinct"))
      val wstats = withW.select(col("doc_id"), col("nw"),
          explode(words).as("w"))
        .groupBy(col("doc_id"), col("nw"), col("w"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_c"), first(col("nw")).as("n_words"))
      gstats.join(wstats, Seq("doc_id"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          round((col("n_grams") - col("n_distinct")) /
            col("n_grams").cast("double"), 6).as("dup_gram_frac"),
          col("n_words"), col("top_c"),
          round(col("top_c") / col("n_words").cast("double"), 6)
            .as("top_word_frac"))
        .orderBy(col("doc_id"))
    }),

    // X9: PII scrub. The corpus is synthetic word salad with no real PII,
    // so deterministic PII is injected keyed off doc_id (same move as x1's
    // language injection) — email+phone+IP on every doc, SSN-shaped on
    // doc_id%3=0, card-shaped on doc_id%4=0 — then counted and redacted.
    // Everything is codegen'd regexp column math; the oracle injects the
    // identical strings and runs the identical RE2-subset patterns.
    "x9_pii" -> ((s, dir) => {
      val d = col("doc_id")
      val withPii = Tables.documents(s, dir)
        .select(d, piiInjected(d, col("text")).as("content"))
      val cnts = graft.text.Pii.counts(col("content"))
        .map { case (n, c) => c.as(s"n_$n") }
      withPii.select(
          Seq(d, graft.text.Pii.redact(col("content")).as("redacted")) ++
            cnts: _*)
        .orderBy(d)
    }),

    // X10: greedy next-fit sequence packing into 256-token bins, streamed
    // per (source, doc_id%4 shard) — the LLM pre-training packing pass.
    // The per-stream forward pass is the sequential core (mapPartitions);
    // the oracle replays it as a recursive CTE.
    "x10_packing" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
      graft.text.Packing.packNextFit(docs, "doc_id", "source", "ntok",
          budget = 256L, shards = 4)
        .orderBy(col("source"), col("shard"), col("doc_id"))
    }),

    // X11: the scrub-and-pack tail of the training-data funnel as one
    // composition — exact dedup (membership changes the packing streams),
    // PII injection + redaction, token count of the SCRUBBED text, then
    // next-fit packing. Everything except the per-stream forward pass is
    // keyed aggregations / linear column math; n_pii and the redacted
    // length make the scrub stage observable in the output.
    "x11_funnel_pack" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val canon = docs.groupBy(sha2(col("text"), 256).as("hsh"))
        .agg(min(col("doc_id")).as("keep_id"))
      val kept = docs.withColumn("hsh", sha2(col("text"), 256))
        .join(canon, Seq("hsh"))
        .filter(col("doc_id") === col("keep_id"))
        .select(col("doc_id"), col("source"),
          piiInjected(col("doc_id"), col("text")).as("content"))
      val nPii = graft.text.Pii.counts(col("content"))
        .map(_._2).reduce(_ + _).as("n_pii")
      val red = kept.select(col("doc_id"), col("source"),
        graft.text.Pii.redact(col("content")).as("rtext"), nPii)
      val toks = red.select(col("doc_id"), col("source"),
        size(split(col("rtext"), " ")).cast("long").as("ntok"),
        length(col("rtext")).cast("long").as("rlen"), col("n_pii"))
      graft.text.Packing.packNextFit(toks, "doc_id", "source", "ntok",
          budget = 256L, shards = 4)
        .join(toks.select(col("doc_id"), col("rlen"), col("n_pii")),
          Seq("doc_id"))
        .orderBy(col("source"), col("shard"), col("doc_id"))
    }),

    // X12: cluster-balance report — the topic-histogram a pre-training mix
    // needs over an embedded corpus: assign every doc's embedding to
    // sampled centroids (v1's deterministic protocol — swap in trained
    // KMeans at deployment), then per-cluster doc counts, token mass,
    // token share, and majority-label purity (the embeddings table carries
    // a ground-truth label). Corpus-total token mass via a broadcast
    // 1-row agg join (x7's idiom — never a global window); ppm shares in
    // integer math so the compare is float-free.
    "x12_cluster_balance" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").cast("long").as("id"), col("embedding"),
          col("label"))
      val cents = emb.filter(col("id") % 100 === 0)
        .select(col("id").as("cid"), col("embedding").as("cvec"))
      val assigned = graft.search.Ivf.assign(
        emb.select(col("id"), col("embedding").as("vector")),
        cents, "id", "vector")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id").as("id"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
      val joined = assigned.select(col("id"), col("bucket"))
        .join(emb.select(col("id"), col("label")), Seq("id"))
        .join(docs, Seq("id"))
      val per = joined.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("ws_tokens"))
      val tot = per.agg(sum(col("ws_tokens")).as("ttotal"))
      // Majority label per cluster: max count, ties -> lower label.
      val lab = joined.groupBy(col("bucket"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("bucket"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"),
          sum(col("c")).as("n"))
        .select(col("bucket"), (-col("m.nl")).cast("long").as("major_label"),
          col("m.c").as("mc"), col("n"))
      per.crossJoin(broadcast(tot)).join(lab, Seq("bucket"))
        .select(col("bucket").cast("long").as("bucket"), col("n_docs"),
          col("ws_tokens"),
          floor(lit(1000000.0) * col("ws_tokens") / col("ttotal"))
            .cast("long").as("share_ppm"),
          col("major_label"),
          floor(lit(1000000.0) * col("mc") / col("n"))
            .cast("long").as("purity_ppm"))
        .orderBy(col("bucket"))
    }),

    // X13: packing-efficiency report over x10's bins — bins per source,
    // mean fill in ppm of budget, and the oversized-singleton count. The
    // oracle recomputes the bins independently, so a fill > budget on a
    // multi-doc bin (a broken packer) would hash-mismatch here.
    "x13_pack_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
      val packed = graft.text.Packing.packNextFit(docs, "doc_id", "source",
        "ntok", budget = 256L, shards = 4)
      val bins = packed.groupBy(col("source"), col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("fill"))
      bins.groupBy(col("source"))
        .agg(count(lit(1)).as("n_bins"),
          sum(col("n_docs")).as("n_docs"),
          sum(col("fill")).as("tokens"),
          max(col("fill")).as("max_fill"),
          sum(when(col("fill") > 256L, 1L).otherwise(0L)).as("n_oversized"))
        .select(col("source"), col("n_bins"), col("n_docs"), col("tokens"),
          floor(lit(1000000.0) * col("tokens") / (col("n_bins") * 256L))
            .cast("long").as("mean_fill_ppm"),
          col("max_fill"), col("n_oversized"))
        .orderBy(col("source"))
    }),

    // X14: deterministic train/val/test split — the same multiplicative-
    // hash ppm gate as x7's sampler (90/5/5), so membership is a pure
    // function of doc_id: stable across partitioning, cluster size, and
    // reruns, and disjoint by construction.
    "x14_split" -> ((s, dir) => {
      val h = (col("doc_id") * 2654435761L) % 1000000L
      val split = when(h < 900000L, "train")
        .when(h < 950000L, "val").otherwise("test")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), split.as("split"),
          size(org.apache.spark.sql.functions.split(col("text"), " "))
            .cast("long").as("ntok"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("ws_tokens"))
        .orderBy(col("source"), col("split"))
    }),

    // X15: per-source vocabulary statistics — token occurrences, exact
    // distinct vocabulary, and the type/token ratio (vocabulary richness,
    // a standard corpus-quality signal). count_distinct shuffles keyed by
    // (source, token) — partitions like any grouped aggregation. The HLL
    // sketch variant (approx_count_distinct, the 100 TB default where the
    // exact count's shuffle is unaffordable) is pinned within 5% of exact
    // in TextPipelineSpec — engine-specific sketch state has no DuckDB
    // twin, so the oracle checks the exact path.
    "x15_vocab" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("source"),
          explode(org.apache.spark.sql.functions.split(col("text"), " "))
            .as("tok"))
      toks.groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          count_distinct(col("tok")).as("n_vocab"))
        .select(col("source"), col("n_tokens"), col("n_vocab"),
          floor(lit(1000000.0) * col("n_vocab") / col("n_tokens"))
            .cast("long").as("ttr_ppm"))
        .orderBy(col("source"))
    }),

    // X30: cross-split contamination audit — after x14's deterministic
    // split, does any document fingerprint (x4's min-shingle-hash, which
    // collapses exact AND near duplicates) appear in more than one split?
    // That's test-set leakage: an eval doc whose twin sits in train. One
    // keyed agg per fingerprint, then a handful-of-rows rollup keyed by
    // the sorted split-set — both shuffles are on high-cardinality keys;
    // nothing is all-pairs, nothing collects. Rows with n_splits >= 2 are
    // the leaks; the single-split rows make the audit a full accounting
    // (every fingerprinted doc lands in exactly one output bucket).
    "x30_split_leakage" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val fp = TextPipeline.fingerprint(docs, "doc_id", "text")
      val h = (col("id") * 2654435761L) % 1000000L
      val split = when(h < 900000L, "train")
        .when(h < 950000L, "val").otherwise("test")
      fp.select(col("id"), col("fingerprint"), split.as("split"))
        .groupBy(col("fingerprint"))
        .agg(array_join(array_sort(collect_set(col("split"))), ",")
            .as("split_set"),
          count_distinct(col("split")).as("n_splits"),
          count(lit(1)).as("nd"))
        .groupBy(col("split_set"))
        .agg(max(col("n_splits")).as("n_splits"),
          count(lit(1)).as("n_fingerprints"),
          sum(col("nd")).as("n_docs"))
        .orderBy(col("split_set"))
    })
  )

  /** SQL twin of [[piiInjected]] — expects `doc_id`, `text` in scope.
    * SINGLE line: these fragments interpolate into templates that call
    * `.stripMargin` AFTER interpolation, which would eat the first `|`
    * of any `||` that starts a line.
    */
  private val piiInjectedSql: String = Seq(
    "text || ' contact user' || CAST(doc_id AS VARCHAR)",
    "|| '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.com'",
    "|| ' call 555-201-'",
    "|| lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')",
    "|| ' from 10.' || CAST(doc_id % 256 AS VARCHAR)",
    "|| '.' || CAST((doc_id * 3) % 256 AS VARCHAR)",
    "|| '.' || CAST((doc_id * 7) % 256 AS VARCHAR)",
    "|| CASE WHEN doc_id % 3 = 0 THEN ' ssn '",
    "|| CAST(doc_id % 900 + 100 AS VARCHAR) || '-'",
    "|| CAST(doc_id % 90 + 10 AS VARCHAR) || '-'",
    "|| lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')",
    "ELSE '' END",
    "|| CASE WHEN doc_id % 4 = 0 THEN ' card '",
    "|| lpad(CAST(doc_id * 99991 + 123456789 AS VARCHAR), 16, '0')",
    "ELSE '' END").mkString(" ")

  /** Oracle fragments generated FROM [[graft.text.Pii.Patterns]] — the
    * engine's pattern strings and replacement order are the single source
    * of truth, so the SQL can't drift from the Spark plan. (The patterns
    * are the RE2-compatible subset and contain no single quotes.)
    */
  private def piiPatternSql(name: String): String =
    graft.text.Pii.Patterns.find(_._1 == name).get._2

  /** Redaction chain over a `content` column, in `Patterns` order. */
  private val piiRedactSql: String =
    graft.text.Pii.Patterns.foldLeft("content") {
      case (acc, (_, pat, tok)) => s"regexp_replace($acc, '$pat', '$tok', 'g')"
    }

  private def piiCountSql(name: String): String =
    s"CAST(len(regexp_extract_all(content, '${piiPatternSql(name)}')) AS BIGINT)"

  /** Deterministic PII injection keyed off doc_id (shared by x9/x11): the
    * corpus is synthetic word salad with no real PII, so email+phone+IP go
    * on every doc, SSN-shaped on doc_id%3=0, card-shaped on doc_id%4=0.
    * [[piiInjectedSql]] is the byte-identical oracle expression.
    */
  private def piiInjected(d: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def str(c: org.apache.spark.sql.Column) = c.cast("string")
    val email = concat(lit("user"), str(d), lit("@mail"),
      str(pmod(d, lit(5L))), lit(".com"))
    val phone = concat(lit("555-201-"),
      lpad(str(pmod(d * 7, lit(10000L))), 4, "0"))
    val ip = concat(lit("10."), str(pmod(d, lit(256L))), lit("."),
      str(pmod(d * 3, lit(256L))), lit("."), str(pmod(d * 7, lit(256L))))
    val ssn = when(pmod(d, lit(3L)) === 0, concat(lit(" ssn "),
        str(pmod(d, lit(900L)) + 100), lit("-"),
        str(pmod(d, lit(90L)) + 10), lit("-"),
        lpad(str(pmod(d * 13, lit(10000L))), 4, "0")))
      .otherwise(lit(""))
    val cc = when(pmod(d, lit(4L)) === 0, concat(lit(" card "),
        lpad(str(d * 99991 + 123456789L), 16, "0")))
      .otherwise(lit(""))
    concat(text, lit(" contact "), email, lit(" call "), phone,
      lit(" from "), ip, ssn, cc)
  }

  private def scoreSql(words: Seq[String]): String =
    s"len(list_filter(str_split(content, ' '), t -> list_contains(" +
      words.map(w => s"'$w'").mkString("[", ",", "]") + ", t)))"

  val oracleSql: Map[String, String] = Map(
    "x1_langid" ->
      s"""WITH $injectedSql,
         |scores AS (
         |  SELECT doc_id, injected.lang AS truth, l.lang, CAST(
         |    CASE l.lang
         |      WHEN 'en' THEN ${scoreSql(Seq("the", "of", "and", "is", "a"))}
         |      WHEN 'es' THEN ${scoreSql(Seq("el", "los", "de", "y", "una"))}
         |      WHEN 'de' THEN ${scoreSql(Seq("der", "die", "das", "und", "ein"))}
         |      WHEN 'fr' THEN ${scoreSql(Seq("le", "la", "les", "et", "une"))}
         |      ELSE ${scoreSql(Seq("de0", "shi4", "le0", "zai4", "he2"))}
         |    END AS BIGINT) AS score
         |  FROM injected CROSS JOIN (
         |    SELECT unnest(['en','es','de','fr','zh']) AS lang) l),
         |best AS (
         |  SELECT * FROM (SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, lang) AS rn FROM scores)
         |  WHERE rn = 1)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS predicted, score,
         |  truth, lang = truth AS correct
         |FROM best ORDER BY doc_id""".stripMargin,

    "x2_quality" ->
      s"""WITH sig AS (
         |  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
         |  WHERE doc_id < 300),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE))) / len(toks) AS mean_word_len,
         |    len(list_filter(toks, t -> list_contains(
         |      ${stop25.map(w => s"'$w'").mkString("[", ",", "]")}, t))) * 1.0 / len(toks) AS stop_ratio,
         |    len(list_distinct(toks)) * 1.0 / len(toks) AS uniq_ratio
         |  FROM sig),
         |q AS (
         |  SELECT *,
         |    (CASE WHEN n_words BETWEEN 40 AND 100000 THEN 0.25 ELSE 0.0 END
         |     + CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 0.25 ELSE 0.0 END
         |     + CASE WHEN stop_ratio >= 0.05 THEN 0.25 ELSE 0.0 END
         |     + CASE WHEN uniq_ratio >= 0.3 THEN 0.25 ELSE 0.0 END) AS quality
         |  FROM m)
         |SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
         |  round(stop_ratio, 6) AS stop_ratio, round(uniq_ratio, 6) AS uniq_ratio,
         |  round(quality, 2) AS quality, quality >= 0.75 AS pass
         |FROM q ORDER BY doc_id""".stripMargin,

    "x3_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(str_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS BIGINT) AS re_tokens,
        |  CAST(list_sum(list_transform(str_split(text, ' '),
        |       t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS est_bpe
        |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin,

    // The empty-token CASE matches PolyHash('') = 0: DuckDB's
    // str_split('', '') is [''] with ord('') = -1, which would skew the
    // hash by one for every empty token a doubled/leading/trailing space
    // produces (latent on the space-normalized fixtures, wrong on real
    // corpora).
    "x33_quality_classifier" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(list_sum(list_transform(str_split(text, ' '),
        |      t -> (CASE WHEN t = '' THEN 0 ELSE list_reduce([CAST(0 AS BIGINT)] ||
        |              list_transform(str_split(t, ''), c -> CAST(ord(c) AS BIGINT)),
        |              (acc, x) -> (acc * 31 + x) % 2147483647) END % 1001) - 500))
        |      AS BIGINT) AS raw
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST((raw + 500 * n_tokens) // n_tokens AS BIGINT) AS score_milli,
        |  (raw + 500 * n_tokens) // n_tokens >= 510 AS keep
        |FROM d ORDER BY doc_id""".stripMargin,

    // Same PolyHash replication as x33 (the empty-token CASE matches
    // PolyHash('') = 0); ppm division is non-negative on both sides so
    // `//` and `div` agree.
    "x34_dsir" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    (CASE WHEN t = '' THEN 0 ELSE list_reduce([CAST(0 AS BIGINT)] ||
        |       list_transform(str_split(t, ''), c -> CAST(ord(c) AS BIGINT)),
        |       (acc, x) -> (acc * 31 + x) % 2147483647) END) % 4096 AS bucket
        |  FROM (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS t
        |        FROM documents)),
        |tgt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS tc FROM tok
        |        WHERE lang = 'en' GROUP BY 1),
        |tt AS (SELECT CAST(sum(tc) AS BIGINT) AS ts FROM tgt),
        |raw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rc FROM tok
        |        WHERE lang <> 'en' GROUP BY 1),
        |rt AS (SELECT CAST(sum(rc) AS BIGINT) AS rs FROM raw),
        |diff AS (
        |  SELECT raw.bucket,
        |    COALESCE((1000000 * tgt.tc) // tt.ts, 0) -
        |      (1000000 * raw.rc) // rt.rs AS d
        |  FROM raw CROSS JOIN tt CROSS JOIN rt
        |  LEFT JOIN tgt ON raw.bucket = tgt.bucket)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(d) AS BIGINT) AS dsir_weight, sum(d) > 0 AS keep
        |FROM tok JOIN diff USING (bucket) WHERE lang <> 'en'
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // floor-log2 via length(bin(q)) - 1 — exact integers in both engines;
    // the LM/backoff divisions are non-negative so `//` and `div` agree.
    "x36_lm_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id, str_split(text, ' ') AS ts FROM documents),
        |bg AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM tok, unnest(range(1, len(ts))) t(i)),
        |lm AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |       FROM bg WHERE doc_id % 5 = 0 GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lm GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS nv
        |      FROM (SELECT unnest(ts) AS t FROM tok WHERE doc_id % 5 = 0)),
        |sc AS (
        |  SELECT bg.doc_id,
        |    CAST(length(bin((COALESCE(uni.c1, 0) + v.nv) //
        |      (COALESCE(lm.c12, 0) + 1))) - 1 AS BIGINT) AS bits
        |  FROM bg CROSS JOIN v
        |  LEFT JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
        |  LEFT JOIN uni ON bg.w1 = uni.w1),
        |per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(bits) AS BIGINT) AS surprisal_bits,
        |    CAST((1000 * sum(bits)) // count(*) AS BIGINT) AS mean_milli
        |  FROM sc GROUP BY doc_id),
        |corp AS (SELECT CAST((1000 * sum(surprisal_bits)) // sum(n_bigrams)
        |                AS BIGINT) AS cm FROM per)
        |SELECT doc_id, n_bigrams, surprisal_bits, mean_milli,
        |  mean_milli <= cm AS keep
        |FROM per CROSS JOIN corp ORDER BY doc_id""".stripMargin,

    // Same surprisal chain as x36, then CCNet's per-language tercile
    // buckets: thresholds = exact k-th order statistics over the
    // ≤25k-smallest-doc_id sample per language (the cap replicated via a
    // row_number window — the oracle does not need to scale), bucket by
    // integer mean_milli against the integer thresholds.
    "x39_ccnet_ppl_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, str_split(text, ' ') AS ts FROM documents),
        |bg AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM tok, unnest(range(1, len(ts))) t(i)),
        |lm AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |       FROM bg WHERE doc_id % 5 = 0 GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lm GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS nv
        |      FROM (SELECT unnest(ts) AS t FROM tok WHERE doc_id % 5 = 0)),
        |sc AS (
        |  SELECT bg.doc_id,
        |    CAST(length(bin((COALESCE(uni.c1, 0) + v.nv) //
        |      (COALESCE(lm.c12, 0) + 1))) - 1 AS BIGINT) AS bits
        |  FROM bg CROSS JOIN v
        |  LEFT JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
        |  LEFT JOIN uni ON bg.w1 = uni.w1),
        |per AS (
        |  SELECT doc_id,
        |    CAST((1000 * sum(bits)) // count(*) AS BIGINT) AS mean_milli
        |  FROM sc GROUP BY doc_id),
        |pl AS (
        |  SELECT per.doc_id, d.lang, per.mean_milli
        |  FROM per JOIN documents d ON per.doc_id = d.doc_id),
        |samp AS (
        |  SELECT * FROM (
        |    SELECT pl.*, row_number() OVER (
        |      PARTITION BY lang ORDER BY doc_id) AS rn FROM pl)
        |  WHERE rn <= 25000),
        |thr AS (
        |  SELECT lang,
        |    ms[CAST(ceil(len(ms) / 3.0) AS BIGINT)] AS t1,
        |    ms[CAST(ceil(len(ms) * 2 / 3.0) AS BIGINT)] AS t2
        |  FROM (SELECT lang, list_sort(list(mean_milli)) AS ms
        |        FROM samp GROUP BY lang))
        |SELECT pl.doc_id, pl.lang, pl.mean_milli,
        |  CASE WHEN pl.mean_milli <= thr.t1 THEN 'head'
        |       WHEN pl.mean_milli <= thr.t2 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM pl JOIN thr ON pl.lang = thr.lang
        |ORDER BY pl.doc_id""".stripMargin,

    // x1's langid CTE feeding a PER-LANGUAGE x36 chain: lang is one more
    // key on the lm/uni/vocab tables, terciles per language over the
    // capped sample. Integer floor-log2 bits, integer thresholds.
    "x40_ccnet_per_lang" ->
      s"""WITH $injectedSql,
         |scores AS (
         |  SELECT doc_id, l.lang, CAST(
         |    CASE l.lang
         |      WHEN 'en' THEN ${scoreSql(Seq("the", "of", "and", "is", "a"))}
         |      WHEN 'es' THEN ${scoreSql(Seq("el", "los", "de", "y", "una"))}
         |      WHEN 'de' THEN ${scoreSql(Seq("der", "die", "das", "und", "ein"))}
         |      WHEN 'fr' THEN ${scoreSql(Seq("le", "la", "les", "et", "une"))}
         |      ELSE ${scoreSql(Seq("de0", "shi4", "le0", "zai4", "he2"))}
         |    END AS BIGINT) AS score
         |  FROM injected CROSS JOIN (
         |    SELECT unnest(['en','es','de','fr','zh']) AS lang) l),
         |best AS (
         |  SELECT doc_id, lang AS plang FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
         |    FROM scores)
         |  WHERE rn = 1),
         |d AS (
         |  SELECT doc.doc_id, best.plang, doc.text
         |  FROM documents doc JOIN best ON doc.doc_id = best.doc_id),
         |tok AS (SELECT doc_id, plang, str_split(text, ' ') AS ts FROM d),
         |bg AS (
         |  SELECT doc_id, plang, ts[i] AS w1, ts[i + 1] AS w2
         |  FROM tok, unnest(range(1, len(ts))) t(i)),
         |lm AS (SELECT plang, w1, w2, CAST(count(*) AS BIGINT) AS c12
         |       FROM bg WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
         |uni AS (SELECT plang, w1, CAST(sum(c12) AS BIGINT) AS c1
         |        FROM lm GROUP BY 1, 2),
         |v AS (SELECT plang, CAST(count(DISTINCT t) AS BIGINT) AS nv
         |      FROM (SELECT plang, unnest(ts) AS t FROM tok
         |            WHERE doc_id % 5 = 0) GROUP BY plang),
         |sc AS (
         |  SELECT bg.doc_id, bg.plang,
         |    CAST(length(bin((COALESCE(uni.c1, 0) + v.nv) //
         |      (COALESCE(lm.c12, 0) + 1))) - 1 AS BIGINT) AS bits
         |  FROM bg JOIN v ON bg.plang = v.plang
         |  LEFT JOIN lm ON bg.plang = lm.plang AND bg.w1 = lm.w1
         |    AND bg.w2 = lm.w2
         |  LEFT JOIN uni ON bg.plang = uni.plang AND bg.w1 = uni.w1),
         |per AS (
         |  SELECT doc_id, plang, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(bits) AS BIGINT) AS surprisal_bits,
         |    CAST((1000 * sum(bits)) // count(*) AS BIGINT) AS mean_milli
         |  FROM sc GROUP BY 1, 2),
         |samp AS (
         |  SELECT * FROM (
         |    SELECT per.*, row_number() OVER (
         |      PARTITION BY plang ORDER BY doc_id) AS rn FROM per)
         |  WHERE rn <= 25000),
         |thr AS (
         |  SELECT plang,
         |    ms[CAST(ceil(len(ms) / 3.0) AS BIGINT)] AS t1,
         |    ms[CAST(ceil(len(ms) * 2 / 3.0) AS BIGINT)] AS t2
         |  FROM (SELECT plang, list_sort(list(mean_milli)) AS ms
         |        FROM samp GROUP BY plang))
         |SELECT per.doc_id, per.plang AS lang_pred, per.n_bigrams,
         |  per.surprisal_bits, per.mean_milli,
         |  CASE WHEN per.mean_milli <= thr.t1 THEN 'head'
         |       WHEN per.mean_milli <= thr.t2 THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket,
         |  per.mean_milli <= thr.t2 AS keep
         |FROM per JOIN thr ON per.plang = thr.plang
         |ORDER BY per.doc_id""".stripMargin,

    "x41_perlang_gate" ->
      s"""WITH $injectedSql,
         |scores AS (
         |  SELECT doc_id, l.lang, CAST(
         |    CASE l.lang
         |      WHEN 'en' THEN ${scoreSql(Seq("the", "of", "and", "is", "a"))}
         |      WHEN 'es' THEN ${scoreSql(Seq("el", "los", "de", "y", "una"))}
         |      WHEN 'de' THEN ${scoreSql(Seq("der", "die", "das", "und", "ein"))}
         |      WHEN 'fr' THEN ${scoreSql(Seq("le", "la", "les", "et", "une"))}
         |      ELSE ${scoreSql(Seq("de0", "shi4", "le0", "zai4", "he2"))}
         |    END AS BIGINT) AS score
         |  FROM injected CROSS JOIN (
         |    SELECT unnest(['en','es','de','fr','zh']) AS lang) l),
         |best AS (
         |  SELECT doc_id, lang AS plang FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
         |    FROM scores)
         |  WHERE rn = 1),
         |tok AS (
         |  -- rtrim: injectedSql's repeat() leaves a trailing space, which
         |  -- str_split would turn into a phantom empty token (the Spark
         |  -- side's concat-built content has no trailing separator).
         |  SELECT i.doc_id, best.plang, str_split(rtrim(i.content), ' ') AS ts
         |  FROM injected i JOIN best ON i.doc_id = best.doc_id),
         |bg AS (
         |  SELECT doc_id, plang, ts[i] AS w1, ts[i + 1] AS w2
         |  FROM tok, unnest(range(1, len(ts))) t(i)),
         |lm AS (SELECT plang, w1, w2, CAST(count(*) AS BIGINT) AS c12
         |       FROM bg WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
         |uni AS (SELECT plang, w1, CAST(sum(c12) AS BIGINT) AS c1
         |        FROM lm GROUP BY 1, 2),
         |v AS (SELECT plang, CAST(count(DISTINCT t) AS BIGINT) AS nv
         |      FROM (SELECT plang, unnest(ts) AS t FROM tok
         |            WHERE doc_id % 5 = 0) GROUP BY plang),
         |sc AS (
         |  SELECT bg.doc_id, bg.plang,
         |    CAST(length(bin((COALESCE(uni.c1, 0) + v.nv) //
         |      (COALESCE(lm.c12, 0) + 1))) - 1 AS BIGINT) AS bits
         |  FROM bg JOIN v ON bg.plang = v.plang
         |  LEFT JOIN lm ON bg.plang = lm.plang AND bg.w1 = lm.w1
         |    AND bg.w2 = lm.w2
         |  LEFT JOIN uni ON bg.plang = uni.plang AND bg.w1 = uni.w1),
         |per AS (
         |  SELECT doc_id, plang, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(bits) AS BIGINT) AS surprisal_bits,
         |    CAST((1000 * sum(bits)) // count(*) AS BIGINT) AS mean_milli
         |  FROM sc GROUP BY 1, 2),
         |cuts AS (
         |  SELECT plang, CAST((1000 * sum(surprisal_bits)) //
         |    sum(n_bigrams) AS BIGINT) AS cut_milli
         |  FROM per GROUP BY plang)
         |SELECT per.doc_id, per.plang, per.n_bigrams, per.surprisal_bits,
         |  per.mean_milli, per.mean_milli <= cuts.cut_milli AS keep
         |FROM per JOIN cuts ON per.plang = cuts.plang
         |ORDER BY per.doc_id""".stripMargin,

    "x32_token_fertility" ->
      """WITH d AS (
        |  SELECT lang, source,
        |    CAST(length(text) AS BIGINT) AS nch,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS ws,
        |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS BIGINT) AS re,
        |    CAST(list_sum(list_transform(str_split(text, ' '),
        |         t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe
        |  FROM documents)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nch) AS BIGINT) AS n_chars,
        |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
        |  CAST(sum(re) AS BIGINT) AS re_tokens,
        |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        |  CAST((1000000 * sum(bpe)) // sum(ws) AS BIGINT) AS fertility_ppm,
        |  CAST((1000000 * sum(nch)) // sum(bpe) AS BIGINT) AS chars_per_tok_ppm
        |FROM d GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // Same stage formulas as d1/x2/x4's oracles, composed into the funnel.
    "x5_pipeline" -> {
      val stopList = stop25.map(w => s"'$w'").mkString("[", ",", "]")
      s"""WITH m AS (
         |  SELECT sha256(text) AS hsh, min(doc_id) AS keep_id
         |  FROM documents GROUP BY 1),
         |d1 AS (
         |  SELECT d.doc_id, d.lang, d.text, d.doc_id = m.keep_id AS exact_keep
         |  FROM documents d JOIN m ON sha256(d.text) = m.hsh),
         |sigs AS (
         |  SELECT doc_id, lang, text, exact_keep, str_split(text, ' ') AS toks
         |  FROM d1),
         |q AS (
         |  SELECT doc_id, lang, text, exact_keep,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    (CASE WHEN len(toks) BETWEEN 40 AND 100000 THEN 0.25 ELSE 0.0 END
         |     + CASE WHEN list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE))) / len(toks)
         |         BETWEEN 3.0 AND 10.0 THEN 0.25 ELSE 0.0 END
         |     + CASE WHEN len(list_filter(toks, t -> list_contains($stopList, t))) * 1.0 / len(toks)
         |         >= 0.05 THEN 0.25 ELSE 0.0 END
         |     + CASE WHEN len(list_distinct(toks)) * 1.0 / len(toks) >= 0.3
         |         THEN 0.25 ELSE 0.0 END) AS quality,
         |    CAST(len(toks) AS BIGINT) AS ws,
         |    CAST(list_sum(list_transform(toks,
         |      t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe
         |  FROM sigs),
         |d2 AS (
         |  SELECT *, exact_keep AND quality >= 0.5 AND n_words >= 4 AS q_keep
         |  FROM q),
         |sh AS (
         |  SELECT DISTINCT doc_id AS id, shingle FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(1, len(str_split(text, ' ')) - 2),
         |        i -> array_to_string(list_slice(str_split(text, ' '), i, i + 3), ' '))) AS shingle
         |    FROM d2 WHERE q_keep)),
         |fp AS (
         |  SELECT id AS doc_id, min(list_reduce([CAST(0 AS BIGINT)] ||
         |    list_transform(str_split(shingle, ''), c -> CAST(ord(c) AS BIGINT)),
         |    (acc, x) -> (acc * 31 + x) % 2147483647)) AS fingerprint
         |  FROM sh GROUP BY id),
         |c2 AS (SELECT fingerprint, min(doc_id) AS fp_keep_id FROM fp GROUP BY 1),
         |d3 AS (
         |  SELECT d2.*,
         |    COALESCE(d2.q_keep AND d2.doc_id = c2.fp_keep_id, FALSE) AS final_keep
         |  FROM d2 LEFT JOIN fp USING (doc_id) LEFT JOIN c2 USING (fingerprint))
         |SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_raw,
         |  CAST(sum(CASE WHEN exact_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         |  CAST(sum(CASE WHEN q_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(sum(CASE WHEN final_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN final_keep THEN ws ELSE 0 END) AS BIGINT) AS ws_tokens_kept,
         |  CAST(sum(CASE WHEN final_keep THEN bpe ELSE 0 END) AS BIGINT) AS bpe_kept
         |FROM d3 GROUP BY lang ORDER BY lang""".stripMargin
    },

    "x4_fingerprint" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id AS id, shingle FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(1, len(str_split(text, ' ')) - 2),
         |        i -> array_to_string(list_slice(str_split(text, ' '), i, i + 3), ' '))) AS shingle
         |    FROM documents WHERE doc_id < 300)),
         |h AS (
         |  SELECT id, list_reduce([CAST(0 AS BIGINT)] ||
         |    list_transform(str_split(shingle, ''), c -> CAST(ord(c) AS BIGINT)),
         |    (acc, x) -> (acc * 31 + x) % 2147483647) AS h
         |  FROM sh)
         |SELECT CAST(id AS BIGINT) AS doc_id, min(h) AS fingerprint,
         |  CAST(count(*) AS BIGINT) AS n_shingles
         |FROM h GROUP BY id ORDER BY doc_id""".stripMargin,

    "x6_decontaminate" ->
      s"""WITH bench AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
         |planted AS (
         |  SELECT doc_id + 500000 AS doc_id,
         |    array_to_string(list_slice(str_split(text, ' '), 1, 20), ' ') AS text
         |  FROM bench),
         |corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
         |  UNION ALL SELECT doc_id, text FROM planted),
         |bsh AS (
         |  SELECT DISTINCT shingle FROM (
         |    SELECT unnest(list_transform(range(1, len(str_split(text, ' ')) - 3),
         |      i -> array_to_string(list_slice(str_split(text, ' '), i, i + 4), ' '))) AS shingle
         |    FROM bench)),
         |csh AS (
         |  SELECT DISTINCT doc_id AS id, shingle FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(1, len(str_split(text, ' ')) - 3),
         |        i -> array_to_string(list_slice(str_split(text, ' '), i, i + 4), ' '))) AS shingle
         |    FROM corpus))
         |SELECT CAST(id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_overlap
         |FROM csh JOIN bsh USING (shingle)
         |GROUP BY id ORDER BY doc_id""".stripMargin,

    "x31_contamination_frac" ->
      s"""WITH bench AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
         |planted AS (
         |  SELECT doc_id + 600000 AS doc_id,
         |    array_to_string(list_slice(str_split(text, ' '), 1,
         |      (len(str_split(text, ' ')) + 1) // 2), ' ') AS text
         |  FROM bench),
         |corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
         |  UNION ALL SELECT doc_id, text FROM planted),
         |bsh AS (
         |  SELECT DISTINCT doc_id AS bid, shingle FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(1, len(str_split(text, ' ')) - 3),
         |        i -> array_to_string(list_slice(str_split(text, ' '), i, i + 4), ' '))) AS shingle
         |    FROM bench)),
         |bn AS (SELECT bid, CAST(count(*) AS BIGINT) AS n_bench FROM bsh GROUP BY bid),
         |csh AS (
         |  SELECT DISTINCT doc_id AS id, shingle FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(1, len(str_split(text, ' ')) - 3),
         |        i -> array_to_string(list_slice(str_split(text, ' '), i, i + 4), ' '))) AS shingle
         |    FROM corpus)),
         |p AS (
         |  SELECT id, bid, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM csh JOIN bsh USING (shingle) GROUP BY id, bid)
         |SELECT CAST(id AS BIGINT) AS doc_id, CAST(bid AS BIGINT) AS bench_id,
         |  n_shared, n_bench,
         |  CAST((1000000 * n_shared) // n_bench AS BIGINT) AS frac_ppm
         |FROM p JOIN bn USING (bid)
         |WHERE n_shared * 4 >= n_bench
         |ORDER BY doc_id, bench_id""".stripMargin,

    "x7_source_mix" ->
      s"""WITH tok AS (
         |  SELECT doc_id, source,
         |    CAST(len(str_split(text, ' ')) AS BIGINT) AS ws
         |  FROM documents),
         |per_src AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(ws) AS BIGINT) AS ws_tokens
         |  FROM tok GROUP BY source),
         |tmax AS (SELECT max(ws_tokens) AS tmax FROM per_src),
         |weighted AS (
         |  SELECT source, n_docs, ws_tokens,
         |    CAST(floor(1000000.0 *
         |      sqrt(CAST(ws_tokens AS DOUBLE) / tmax)) AS BIGINT) AS mix_ppm
         |  FROM per_src CROSS JOIN tmax),
         |sampled AS (
         |  SELECT t.source, CAST(count(*) AS BIGINT) AS n_sampled,
         |    CAST(sum(t.ws) AS BIGINT) AS ws_sampled
         |  FROM tok t JOIN weighted w ON w.source = t.source
         |  WHERE (t.doc_id * 2654435761) % 1000000 < w.mix_ppm
         |  GROUP BY t.source)
         |SELECT w.source, w.n_docs, w.ws_tokens, w.mix_ppm,
         |  coalesce(s.n_sampled, 0) AS n_sampled,
         |  coalesce(s.ws_sampled, 0) AS ws_sampled
         |FROM weighted w LEFT JOIN sampled s ON s.source = w.source
         |ORDER BY w.source""".stripMargin,

    "x8_repetition" ->
      s"""WITH d2 AS (
         |  SELECT doc_id, str_split(text, ' ') AS w,
         |    len(str_split(text, ' ')) AS nw
         |  FROM documents WHERE doc_id < 300 AND len(str_split(text, ' ')) >= 3),
         |grams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, nw - 1),
         |    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS g
         |  FROM d2),
         |gs AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(count(DISTINCT g) AS BIGINT) AS n_distinct
         |  FROM grams GROUP BY doc_id),
         |wc AS (
         |  SELECT doc_id, tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest(w) AS tok FROM d2)
         |  GROUP BY doc_id, tok),
         |ws AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_c FROM wc GROUP BY doc_id)
         |SELECT CAST(d2.doc_id AS BIGINT) AS doc_id, n_grams, n_distinct,
         |  round((n_grams - n_distinct) * 1.0 / n_grams, 6) AS dup_gram_frac,
         |  CAST(d2.nw AS INT) AS n_words, top_c,
         |  round(top_c * 1.0 / d2.nw, 6) AS top_word_frac
         |FROM d2 JOIN gs ON gs.doc_id = d2.doc_id
         |JOIN ws ON ws.doc_id = d2.doc_id
         |ORDER BY d2.doc_id""".stripMargin,

    // Identical injected strings, identical RE2-subset patterns; DuckDB
    // needs the explicit 'g' flag (Spark's regexp_replace is global).
    "x9_pii" ->
      s"""WITH injected AS (
         |  SELECT doc_id, $piiInjectedSql AS content
         |  FROM documents
         |)
         |SELECT doc_id,
         |  $piiRedactSql AS redacted,
         |  ${piiCountSql("cc")} AS n_cc,
         |  ${piiCountSql("ssn")} AS n_ssn,
         |  ${piiCountSql("phone")} AS n_phone,
         |  ${piiCountSql("ip")} AS n_ip,
         |  ${piiCountSql("email")} AS n_email
         |FROM injected ORDER BY doc_id""".stripMargin,

    // The per-stream next-fit forward pass replayed as a recursive CTE:
    // rows are numbered within each (source, shard) stream and the
    // (bin, bin_fill) state is threaded rn -> rn+1 — the same recurrence
    // the mapPartitions pass runs.
    "x10_packing" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, source, doc_id % 4 AS shard,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS ntok,
        |    row_number() OVER (PARTITION BY source, doc_id % 4
        |                       ORDER BY doc_id) AS rn
        |  FROM documents
        |), pack AS (
        |  SELECT doc_id, source, shard, ntok, rn,
        |    CAST(0 AS BIGINT) AS bin, ntok AS bin_fill
        |  FROM toks WHERE rn = 1
        |  UNION ALL
        |  SELECT t.doc_id, t.source, t.shard, t.ntok, t.rn,
        |    CASE WHEN p.bin_fill + t.ntok > 256
        |         THEN p.bin + 1 ELSE p.bin END,
        |    CASE WHEN p.bin_fill + t.ntok > 256
        |         THEN t.ntok ELSE p.bin_fill + t.ntok END
        |  FROM toks t
        |  JOIN pack p ON t.source = p.source AND t.shard = p.shard
        |    AND t.rn = p.rn + 1
        |)
        |SELECT doc_id, source, shard, ntok, bin, bin_fill
        |FROM pack ORDER BY source, shard, doc_id""".stripMargin,

    // The composed funnel tail: exact dedup (min doc_id per identical
    // text) -> inject+redact -> token-count the scrubbed text -> replay
    // the next-fit recurrence over the SURVIVOR streams.
    "x11_funnel_pack" ->
      s"""WITH RECURSIVE canon AS (
         |  SELECT min(doc_id) AS keep_id FROM documents GROUP BY text
         |), kept AS (
         |  SELECT d.doc_id, d.source, $piiInjectedSql AS content
         |  FROM documents d JOIN canon c ON c.keep_id = d.doc_id
         |), red AS (
         |  SELECT doc_id, source, $piiRedactSql AS rtext,
         |    ${piiCountSql("cc")} + ${piiCountSql("ssn")}
         |      + ${piiCountSql("phone")} + ${piiCountSql("ip")}
         |      + ${piiCountSql("email")} AS n_pii
         |  FROM kept
         |), toks AS (
         |  SELECT doc_id, source, doc_id % 4 AS shard,
         |    CAST(len(str_split(rtext, ' ')) AS BIGINT) AS ntok,
         |    CAST(length(rtext) AS BIGINT) AS rlen, n_pii,
         |    row_number() OVER (PARTITION BY source, doc_id % 4
         |                       ORDER BY doc_id) AS rn
         |  FROM red
         |), pack AS (
         |  SELECT doc_id, source, shard, ntok, rn,
         |    CAST(0 AS BIGINT) AS bin, ntok AS bin_fill
         |  FROM toks WHERE rn = 1
         |  UNION ALL
         |  SELECT t.doc_id, t.source, t.shard, t.ntok, t.rn,
         |    CASE WHEN p.bin_fill + t.ntok > 256
         |         THEN p.bin + 1 ELSE p.bin END,
         |    CASE WHEN p.bin_fill + t.ntok > 256
         |         THEN t.ntok ELSE p.bin_fill + t.ntok END
         |  FROM toks t
         |  JOIN pack p ON t.source = p.source AND t.shard = p.shard
         |    AND t.rn = p.rn + 1
         |)
         |SELECT p.doc_id, p.source, p.shard, p.ntok, p.bin, p.bin_fill,
         |  t.rlen, t.n_pii
         |FROM pack p JOIN toks t ON t.doc_id = p.doc_id
         |ORDER BY p.source, p.shard, p.doc_id""".stripMargin,

    // v1's centroid/assignment protocol + per-cluster aggregations; the
    // cosine ordering matches Spark's Ivf.assign (ties -> lower cid).
    "x12_cluster_balance" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
        |  WHERE vec_id % 100 = 0),
        |assigned AS (
        |  SELECT vec_id AS id, cid AS bucket FROM (
        |    SELECT e.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY 1.0 - list_cosine_similarity(
        |          CAST(e.embedding AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])),
        |          c.cid) AS rn
        |    FROM embeddings e CROSS JOIN cents c)
        |  WHERE rn = 1),
        |j AS (
        |  SELECT a.id, a.bucket, e.label,
        |    CAST(len(str_split(d.text, ' ')) AS BIGINT) AS ntok
        |  FROM assigned a
        |  JOIN embeddings e ON e.vec_id = a.id
        |  JOIN documents d ON d.doc_id = a.id),
        |per AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(ntok) AS BIGINT) AS ws_tokens
        |  FROM j GROUP BY bucket),
        |tot AS (SELECT sum(ws_tokens) AS ttotal FROM per),
        |lc AS (SELECT bucket, label, CAST(count(*) AS BIGINT) AS c
        |       FROM j GROUP BY bucket, label),
        |lm AS (
        |  SELECT bucket, CAST(label AS BIGINT) AS major_label, c,
        |    row_number() OVER (PARTITION BY bucket
        |                       ORDER BY c DESC, label) AS rn,
        |    sum(c) OVER (PARTITION BY bucket) AS n
        |  FROM lc)
        |SELECT CAST(per.bucket AS BIGINT) AS bucket, per.n_docs,
        |  per.ws_tokens,
        |  CAST(floor(1000000.0 * per.ws_tokens / tot.ttotal) AS BIGINT)
        |    AS share_ppm,
        |  lm.major_label,
        |  CAST(floor(1000000.0 * lm.c / lm.n) AS BIGINT) AS purity_ppm
        |FROM per CROSS JOIN tot
        |JOIN lm ON lm.bucket = per.bucket AND lm.rn = 1
        |ORDER BY bucket""".stripMargin,

    // Independent bin recomputation (the x10 recursive CTE) + per-source
    // rollup: a packer that overfills a multi-doc bin cannot match this.
    "x13_pack_stats" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, source, doc_id % 4 AS shard,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS ntok,
        |    row_number() OVER (PARTITION BY source, doc_id % 4
        |                       ORDER BY doc_id) AS rn
        |  FROM documents
        |), pack AS (
        |  SELECT doc_id, source, shard, ntok, rn,
        |    CAST(0 AS BIGINT) AS bin, ntok AS bin_fill
        |  FROM toks WHERE rn = 1
        |  UNION ALL
        |  SELECT t.doc_id, t.source, t.shard, t.ntok, t.rn,
        |    CASE WHEN p.bin_fill + t.ntok > 256
        |         THEN p.bin + 1 ELSE p.bin END,
        |    CASE WHEN p.bin_fill + t.ntok > 256
        |         THEN t.ntok ELSE p.bin_fill + t.ntok END
        |  FROM toks t
        |  JOIN pack p ON t.source = p.source AND t.shard = p.shard
        |    AND t.rn = p.rn + 1
        |), bins AS (
        |  SELECT source, shard, bin, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(ntok) AS BIGINT) AS fill
        |  FROM pack GROUP BY source, shard, bin
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(fill) AS BIGINT) AS tokens,
        |  CAST(floor(1000000.0 * sum(fill) / (count(*) * 256)) AS BIGINT)
        |    AS mean_fill_ppm,
        |  max(fill) AS max_fill,
        |  CAST(sum(CASE WHEN fill > 256 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oversized
        |FROM bins GROUP BY source ORDER BY source""".stripMargin,

    "x14_split" ->
      """SELECT source,
        |  CASE WHEN (doc_id * 2654435761) % 1000000 < 900000 THEN 'train'
        |       WHEN (doc_id * 2654435761) % 1000000 < 950000 THEN 'val'
        |       ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS ws_tokens
        |FROM documents
        |GROUP BY source, split
        |ORDER BY source, split""".stripMargin,

    "x15_vocab" ->
      """WITH toks AS (
        |  SELECT source, unnest(str_split(text, ' ')) AS tok
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT tok) AS BIGINT) AS n_vocab,
        |  CAST(floor(1000000.0 * count(DISTINCT tok) / count(*)) AS BIGINT)
        |    AS ttr_ppm
        |FROM toks GROUP BY source ORDER BY source""".stripMargin,

    "x30_split_leakage" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id AS id, shingle FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(str_split(text, ' ')) - 2),
        |        i -> array_to_string(list_slice(str_split(text, ' '), i, i + 3), ' '))) AS shingle
        |    FROM documents)),
        |h AS (
        |  SELECT id, list_reduce([CAST(0 AS BIGINT)] ||
        |    list_transform(str_split(shingle, ''), c -> CAST(ord(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 2147483647) AS h
        |  FROM sh),
        |fp AS (SELECT id, min(h) AS fingerprint FROM h GROUP BY id),
        |sp AS (
        |  SELECT fingerprint,
        |    CASE WHEN (id * 2654435761) % 1000000 < 900000 THEN 'train'
        |         WHEN (id * 2654435761) % 1000000 < 950000 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM fp),
        |g AS (
        |  SELECT fingerprint,
        |    array_to_string(list_sort(list(DISTINCT split)), ',') AS split_set,
        |    count(DISTINCT split) AS n_splits, count(*) AS nd
        |  FROM sp GROUP BY fingerprint)
        |SELECT split_set, CAST(max(n_splits) AS BIGINT) AS n_splits,
        |  CAST(count(*) AS BIGINT) AS n_fingerprints,
        |  CAST(sum(nd) AS BIGINT) AS n_docs
        |FROM g GROUP BY split_set ORDER BY split_set""".stripMargin
  )
}
