package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.search.Quantizer

/** S6/S7/S9 + V9/V10 + C8 queries: bulk import with dimension validation,
  * export round-trip, document loaders, int8 quantization, precision
  * migration, and the contradiction detector's deterministic candidate
  * surface (the LLM judge is stubbed — graft.llm.StubLlm).
  */
object SourceQueries {

  private def cosSql(a: String, b: String): String =
    s"1.0 - list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  /** Collision-free fixture file for the WARC/WET entries: unique per
    * call (`createTempFile` — two suites materializing the same logical
    * fixture concurrently can never race on one path) and removed at JVM
    * exit. Replaces the shared `math.abs(dir.hashCode)`-keyed name
    * (ADVICE r14: abs(Int.MinValue) is still negative, distinct dirs can
    * hash-collide, and the files leaked).
    */
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()

  private def fixtureFile(prefix: String, suffix: String,
      bytes: Array[Byte]): String = {
    // One file per distinct content within this JVM: bench reps and
    // re-measures re-invoke the query lambdas, and an uncached
    // createTempFile would grow /tmp and the JDK's permanent
    // deleteOnExit set without bound on a long-lived driver.
    val key = (prefix, java.util.Arrays.hashCode(bytes).toLong << 32 | bytes.length)
    fixtureCache.computeIfAbsent(key, _ => {
      val p = java.nio.file.Files.createTempFile(prefix, suffix)
      java.nio.file.Files.write(p, bytes)
      p.toFile.deleteOnExit()
      p.toString
    })
  }

  // Mirrors Quantizer.train's deterministic ≤25k smallest-id sample; the
  // oracle may use a window rank — it does not need to scale.
  private[queries] val absMaxSql =
    """am AS (
      |  SELECT CAST(v AS DOUBLE) AS absmax FROM (
      |    SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS cnt
      |    FROM (SELECT abs(unnest(embedding)) AS v FROM
      |          (SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 25000)))
      |  WHERE rn = CAST(floor(cnt * 0.999) AS BIGINT) + 1
      |)""".stripMargin

  private[queries] val codeSql =
    "greatest(-127, least(127, CAST(round(CAST(e AS DOUBLE) / absmax * 127.0, 0) AS BIGINT)))"

  /** Round-half-even of `y` (a DOUBLE expression): DuckDB's round() is
    * half-away-from-zero, so exact .5 ties reroute through `2*round(y/2)`
    * (whose fraction is then .25/.75 — tie-free) to land on the even
    * neighbor, matching IEEE round-to-nearest-even.
    */
  private def rheSql(y: String): String =
    s"(CASE WHEN ($y) - floor($y) = 0.5 THEN 2.0 * round(($y) / 2.0, 0) " +
      s"ELSE round(($y), 0) END)"

  /** Arithmetic IEEE 754 binary16 rounding of a DOUBLE expression `x`
    * (mirrors `graft.functions.F16.roundTrip` bit-for-bit, pinned by
    * F16Spec): ulp = 2^(floor(log2|x|) − 10) for normals, 2⁻²⁴ in the
    * subnormal range, then round-half-even on the ulp grid. Inputs are f32
    * embedding values — finite and far from the f16 overflow bound.
    */
  private[queries] def f16Sql(x: String): String = {
    val ulp = s"(CASE WHEN abs($x) < power(2.0, -14) THEN power(2.0, -24) " +
      s"ELSE power(2.0, floor(log2(abs($x))) - 10) END)"
    s"(CASE WHEN ($x) = 0 THEN 0.0 ELSE ${rheSql(s"($x) / $ulp")} * $ulp END)"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S6: bulk import — direct table build (AOF bypass) with the VAdd
    // dimension validation (ops.go:338-348): rows whose vector dimension
    // differs from the index's are rejected.
    "s6_bulk_import" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val bad = emb.filter(col("vec_id") < 3).select(
        (col("vec_id") + 400000).as("vec_id"),
        slice(col("embedding"), lit(1), lit(32)).as("embedding"))
      val batch = emb.select(col("vec_id"), col("embedding")).unionByName(bad)
      val expected = emb.filter(col("vec_id") === 0)
        .select(size(col("embedding")).as("dim"))
      batch.crossJoin(broadcast(expected))
        .withColumn("ok", size(col("embedding")) === col("dim"))
        .agg(sum(when(col("ok"), 1L).otherwise(0L)).as("n_imported"),
          sum(when(!col("ok"), 1L).otherwise(0L)).as("n_rejected"))
    }),

    // S7: export round-trip — alive state written as JSON, read back.
    "s7_export" -> ((s, dir) => {
      val alive = Tables.embeddings(s, dir)
        .filter(col("vec_id") % 17 =!= 0)
        .select(col("vec_id").cast("long").as("id"),
          col("label").cast("long").as("label"))
      val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
        s"/graft_export_${math.abs(dir.hashCode)}"
      alive.write.mode("overwrite").json(path)
      s.read.json(path)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("label")).cast("long").as("label_sum"))
    }),

    // S9: document loaders — files on disk, binaryFile source, loader
    // dispatch by extension (`loader.go`): txt/md decode inline; REAL
    // binary .pdf/.docx fixtures (minimal writers, Flate-compressed PDF
    // content stream / OOXML zip) parse through the pure-JVM extractors
    // (`loader_pdf_advanced.go:36`, `loader_docx.go:19`); one deliberately
    // corrupt .pdf (plain text bytes) falls through the chain — the JVM
    // parser rejects it, pdftotext is absent, `cat` wins — exercising the
    // CLI pipe fallback (`loader_cli.go:43`) end-to-end.
    // S17: WARC ingestion — Common Crawl's container format, i.e. the
    // source format of a real 100 TB pre-training corpus. The fixture is
    // a genuine WARC/1.0 file (canonical writer, spec framing: version
    // line, CRLF headers, Content-Length octets) holding a warcinfo
    // record + one HTTP response per document, with ONE record's magic
    // deliberately flipped: the parser must quarantine that span and
    // resync at the next record boundary (Oplog.resync's contract, at
    // the file-format layer). Responses split the HTTP message and
    // reduce the HTML to text (script/style dropped, tags stripped,
    // entities decoded — the CC HTML→text step in miniature). Scale
    // shape: one task per WARC file, zero shuffle — crawl dumps
    // parallelize at file granularity.
    "s17_warc" -> ((s, dir) => {
      import graft.sources.Warc
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 12)
        .select(col("doc_id"), col("text")).collect().sortBy(_.getLong(0))
      val responses = docs.map { r =>
        val id = r.getLong(0)
        (s"https://example.com/doc/$id",
          s"<html><head><title>doc $id</title><style>p{color:red}</style>" +
            s"</head><body><p>${r.getString(1)}</p></body></html>")
      }.toSeq
      val bytes = Warc.corruptRecord(Warc.write(responses),
        "https://example.com/doc/7")
      val bins = s.read.format("binaryFile")
        .load(fixtureFile("graft_warc_", ".warc", bytes))
      import s.implicits._
      bins.select(col("content")).as[Array[Byte]]
        .flatMap(b => Warc.parse(b))
        .toDF()
        .select(col("warcType").as("warc_type"), col("targetUri").as("uri"),
          col("httpStatus").cast("long").as("http_status"), col("mime"),
          length(col("text")).cast("long").as("n_chars"),
          col("nPayloadBytes").as("n_payload"),
          coalesce(regexp_replace(col("corrupt"), "_at_[0-9]+$", ""),
            lit("-")).as("corrupt"))
        .orderBy(col("uri"), col("warc_type"))
    }),

    // S18: the crawl-to-corpus FUNNEL, hash-checked end-to-end (r12
    // stretch, natural once the r14 streaming WARC walk landed): a crawl
    // file holding one page per document plus a re-crawled mirror
    // duplicate and one record damaged in transit flows
    // WARC-parse → quarantine → HTML→text → EXACT DEDUP (min-uri
    // survivor) → token/stopword quality signals — the first mile of a
    // pre-training pipeline as ONE oracle-checked query. The oracle
    // replays the funnel analytically over `documents` (the writer's
    // HTML wrap round-trips the text exactly, the s17 precedent).
    // Scale shape: parse is per-file task-local (zero shuffle); the only
    // shuffles are dedup's text-keyed agg — the d1 shape.
    "s18_crawl_funnel" -> ((s, dir) => {
      import graft.sources.Warc
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 20)
        .select(col("doc_id"), col("text")).collect().sortBy(_.getLong(0))
      val mirror = docs.find(_.getLong(0) == 3L).map(r =>
        ("https://mirror/doc/3",
          s"<html><body><p>${r.getString(1)}</p></body></html>")).toSeq
      val responses = docs.map { r =>
        (s"https://crawl/doc/${r.getLong(0)}",
          s"<html><body><p>${r.getString(1)}</p></body></html>")
      }.toSeq ++ mirror
      val bytes = Warc.corruptRecord(Warc.write(responses),
        "https://crawl/doc/7")
      val bins = s.read.format("binaryFile")
        .load(fixtureFile("graft_warc_funnel_", ".warc", bytes))
      import s.implicits._
      val stop25 = Array("a", "an", "and", "are", "as", "at", "be", "by",
        "for", "from", "has", "he", "in", "is", "it", "its", "of", "on",
        "that", "the", "to", "was", "were", "will", "with")
      bins.select(col("content")).as[Array[Byte]]
        .flatMap(b => Warc.parse(b))
        .toDF()
        .filter(col("warcType") === "response")
        .groupBy(col("text"))
        .agg(min(col("targetUri")).as("uri"))
        .select(col("uri"), col("text"),
          length(col("text")).cast("long").as("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          size(filter(split(lower(col("text")), " "),
            t => array_contains(lit(stop25), t))).cast("long").as("_nstop"))
        .withColumn("stop_ppm", expr("(1000000 * _nstop) div n_tokens"))
        .filter(col("n_tokens") >= 5) // Gopher-style min-length gate
        .select(col("uri"), col("n_chars"), col("n_tokens"), col("stop_ppm"))
        .orderBy(col("uri"))
    }),

    // S19: WET ingestion — Common Crawl's extracted-text sidecar (the
    // same WARC container, `conversion` records with text/plain payloads;
    // the format most text pipelines actually consume, since the
    // HTML→text step already ran crawl-side). The full TEXT column is in
    // the result, so the oracle hash-checks the parser's payload decode
    // round-trip byte-for-byte, with doc 7 damaged in transit and
    // quarantined. Same task-local zero-shuffle scale shape as s17.
    "s19_wet_ingest" -> ((s, dir) => {
      import graft.sources.Warc
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 20)
        .select(col("doc_id"), col("text")).collect().sortBy(_.getLong(0))
      val pages = docs.map(r =>
        (s"https://wet/doc/${r.getLong(0)}", r.getString(1))).toSeq
      val bytes = Warc.corruptRecord(Warc.writeWet(pages), "https://wet/doc/7")
      val bins = s.read.format("binaryFile")
        .load(fixtureFile("graft_wet_", ".warc", bytes))
      import s.implicits._
      bins.select(col("content")).as[Array[Byte]]
        .flatMap(b => Warc.parse(b))
        .toDF()
        .filter(col("warcType") === "conversion")
        .select(col("targetUri").as("uri"), col("mime"), col("text"),
          length(col("text")).cast("long").as("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .orderBy(col("uri"))
    }),

    // S20: the CCNet first mile END TO END (VERDICT r14 stretch #6) —
    // s18's crawl fixture (one page per document, a re-crawled mirror of
    // doc 3, doc 7 damaged in transit) flowing
    //   WARC-parse → quarantine → HTML→text → PARAGRAPH DEDUP (d13's
    //   keep-first over 16-token chunks, corpus-wide) → quality gate,
    // one hash-checked query. The mirror page is an exact twin, so
    // paragraph dedup subsumes exact dedup (a full-dup page keeps zero
    // paragraphs and the ≥5-token gate removes its empty husk) — the
    // CCNet ordering (arXiv:1911.00359 §3.1: dedup before LM filtering).
    // Keep-first identity is the page URI (crawl < mirror
    // lexicographically), so the oracle replays the ordering verbatim.
    // Scale shape: parse is per-file task-local; then d13's
    // partial-aggregating groupBy(para) + join-back — no window, no
    // all-pairs, one keyed reassembly per page.
    "s20_ccnet_funnel" -> ((s, dir) =>
      ccnetDedupedPages(s, dir)
        .select(col("uri"), col("text_deduped"),
          col("n_kept"), col("n_dropped"), col("n_tokens"))
        .orderBy(col("uri"))),

    // S21: the CCNet pipeline COMPLETE — s20's funnel (WARC-parse →
    // quarantine → HTML→text → paragraph dedup → quality gate) composed
    // with the LM stage (arXiv:1911.00359 §3.2): every kept page is
    // scored by a bigram LM trained on the TARGET-DOMAIN corpus (the
    // documents %5 slice — CCNet trains on Wikipedia, scores the crawl;
    // `surprisalOf` is x36's scorer in its two-corpus form), then
    // bucketed head/middle/tail at the batch's surprisal terciles and
    // gated keep = not-tail. All integer math (floor-log2 bits, milli
    // means, integer thresholds), so the whole five-stage pipeline is
    // hash-checked end to end. Scale shape: parse is task-local, dedup
    // is d13's keyed agg, the LM joins are keyed (x36's shape); the
    // tercile here is exact over one crawl file's pages (file-bounded) —
    // corpus-wide bucketing at 100 TB is x39's capped per-language
    // order-statistics path.
    "s21_ccnet_lm_gate" -> ((s, dir) => {
      val kept = ccnetDedupedPages(s, dir)
      val lmDocs = Tables.documents(s, dir)
        .filter(col("doc_id") % 5 === 0).select(col("text"))
      // Pinned: `per` is referenced twice (the tercile aggregate AND the
      // crossJoin back), and each reference re-evaluates the whole
      // WARC-parse → paragraph-dedup → bigram-LM chain — the
      // re-evaluation hazard Mmr.select documents (ADVICE r15). Results
      // are unchanged; cost roughly halves.
      val per = TextPipelineQueries.surprisalOf(lmDocs,
        kept.select(col("uri"), col("text_deduped").as("text")), "uri")
        .localCheckpoint(true)
      val thr = per
        .agg(sort_array(collect_list(col("mean_milli"))).as("ms"))
        .select(
          element_at(col("ms"),
            ceil(size(col("ms")) / 3.0).cast("int")).as("t1"),
          element_at(col("ms"),
            ceil(size(col("ms")) * 2 / 3.0).cast("int")).as("t2"))
      per.crossJoin(broadcast(thr))
        .select(col("uri"), col("n_bigrams"), col("surprisal_bits"),
          col("mean_milli"),
          when(col("mean_milli") <= col("t1"), "head")
            .when(col("mean_milli") <= col("t2"), "middle")
            .otherwise("tail").as("ppl_bucket"),
          (col("mean_milli") <= col("t2")).as("keep"))
        .orderBy(col("uri"))
    }),

    "s9_loaders" -> ((s, dir) => {
      import graft.sources.{BinaryExtract, CliLoader}
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text")).collect()
      val path = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        s"graft_docs_v3_${math.abs(dir.hashCode)}")
      java.nio.file.Files.createDirectories(path)
      // Clean stale fixtures — binaryFile globs the whole directory.
      // (Close the Files.list stream: it holds a directory fd.)
      scala.util.Using.resource(java.nio.file.Files.list(path)) { st =>
        st.forEach(p => java.nio.file.Files.delete(p))
      }
      docs.foreach { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        (id % 4) match {
          case 0 => java.nio.file.Files.writeString(
            path.resolve(s"doc_$id.txt"), text)
          case 1 => java.nio.file.Files.writeString(
            path.resolve(s"doc_$id.md"), text)
          case 2 => java.nio.file.Files.write(path.resolve(s"doc_$id.pdf"),
            // id 6: corrupt pdf (plain text bytes) → CLI fallback path.
            if (id == 6) text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            else BinaryExtract.minimalPdf(text))
          case _ => java.nio.file.Files.write(path.resolve(s"doc_$id.docx"),
            BinaryExtract.minimalDocx(text))
        }
      }
      // Glob-free load: hand Spark the explicit file list. `load(dir/"*")`
      // throws FileNotFoundException when Hadoop's glob resolution
      // transiently matches nothing (observed r8/r9: it poisoned driver
      // bench runs with -1 timings) — the listing here runs on the same
      // thread that just wrote the files, so it cannot be empty.
      val files = scala.util.Using.resource(java.nio.file.Files.list(path)) {
        st =>
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.map(_.toString).toArray.sorted
      }
      val bins = s.read.format("binaryFile").load(files: _*)
      val isBinaryDoc = col("path").endsWith(".pdf") ||
        col("path").endsWith(".docx")
      val inline = bins.filter(!isBinaryDoc)
        .select(
          regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
          when(col("path").endsWith(".md"), "markdown")
            .otherwise("text").as("loader"),
          length(decode(col("content"), "UTF-8")).cast("long").as("n_chars"))
      val chains = CliLoader.defaultChains +
        ("pdf" -> (CliLoader.defaultChains("pdf") :+
          CliLoader.Converter(Seq("cat", "{{file_path}}"))))
      val extracted = CliLoader.load(bins.filter(isBinaryDoc), chains)
        .select(
          regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
          col("converter").as("loader"),
          length(col("text")).cast("long").as("n_chars"))
      inline.unionByName(extracted).orderBy(col("file"))
    }),

    // V9: int8 scalar quantization — codes + reconstruction error.
    "v9_quantize" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val am = Quantizer.train(emb, "embedding", idCol = "vec_id")
      Quantizer.quantizeVectors(
          emb.filter(col("vec_id") < 20), "embedding", am)
        .select(col("vec_id").cast("long").as("id"),
          aggregate(col("qcodes"), lit(0L), (a, q) => a + q).as("qsum"),
          array_min(col("qcodes")).as("qmin"),
          array_max(col("qcodes")).as("qmax"),
          round(sqrt(aggregate(
            zip_with(col("embedding").cast("array<double>"),
              Quantizer.dequantized(col("qcodes"), col("absmax")),
              (x, d) => (x - d) * (x - d)),
            lit(0.0), (a, x) => a + x)), 6).as("recon_err"))
        .orderBy(col("id"))
    }),

    // V10: precision migration — top-10 overlap between exact-float and
    // int8-dequantized cosine ranking per query (the recall cost of the
    // compressed index, `DB.Compress` ops.go:1604).
    "v10_precision_migration" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val am = Quantizer.train(emb, "embedding", idCol = "vec_id")
      val deq = Quantizer.quantizeVectors(emb, "embedding", am)
        .select(col("vec_id").cast("long").as("id"),
          col("embedding"),
          Quantizer.dequantized(col("qcodes"), col("absmax")).as("dvec"))
      def top10(vecCol: String, qvecCol: String, qids: DataFrame): DataFrame = {
        val q = qids.select(col("id").as("qid"), col(vecCol).as("qv"))
        deq.crossJoin(broadcast(q))
          .withColumn("d", lit(1.0) - (
            aggregate(zip_with(col(qvecCol).cast("array<double>"),
              col("qv").cast("array<double>"), (x, y) => x * y),
              lit(0.0), (a, x) => a + x) /
              (sqrt(aggregate(transform(col(qvecCol).cast("array<double>"),
                x => x * x), lit(0.0), (a, x) => a + x)) *
                sqrt(aggregate(transform(col("qv").cast("array<double>"),
                  x => x * x), lit(0.0), (a, x) => a + x)))))
          .withColumn("rn", row_number().over(
            Window.partitionBy("qid").orderBy(col("d"), col("id"))))
          .filter(col("rn") <= 10)
          .select(col("qid"), col("id"))
      }
      val qids = deq.filter(col("id") < 5)
      val exact = top10("embedding", "embedding", qids)
      val quant = top10("dvec", "dvec", qids)
      exact.join(quant, Seq("qid", "id"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as("n_overlap"))
        .orderBy(col("qid"))
    }),

    // V14: float16 precision path — pack f32 embeddings to IEEE 754 binary16
    // storage (half the bytes of f32 through every scan), then run the f16
    // Euclidean kernel against a packed query plus the per-vector storage
    // error. Covers the reference's third precision mode
    // (`distance_go.go:139-141`: f16 supports euclidean only); the oracle
    // replicates the round-to-nearest-even conversion arithmetically.
    "v14_f16" -> ((s, dir) => {
      import graft.functions.F16
      val emb = Tables.embeddings(s, dir)
      val packed = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").cast("long").as("id"),
          col("embedding"), F16.pack(col("embedding")).as("f16v"))
      val q = emb.filter(col("vec_id") === 0)
        .select(F16.pack(col("embedding")).as("qf16"))
      packed.crossJoin(broadcast(q))
        .select(col("id"),
          round(F16.euclideanSqWide(col("f16v"), col("qf16")), 6).as("qdist"),
          round(sqrt(aggregate(
            zip_with(col("embedding").cast("array<double>"),
              F16.unpack(col("f16v")).cast("array<double>"),
              (x, h) => (x - h) * (x - h)),
            lit(0.0), (a, t) => a + t)), 6).as("recon_err"))
        .orderBy(col("id"))
    }),

    // C8: contradiction candidates — entities with both strongly positive
    // and strongly negative recent mentions; the most recent of each side
    // becomes a contradicts edge (LLM judge stubbed deterministically).
    "c8_contradictions" -> ((s, dir) => {
      val m = GardenerQueries.mentions(s, dir)
        .withColumn("sscore",
          graft.analytics.Gardener.sentimentScore(col("content")))
        .filter(col("created_at") >= GardenerQueries.Now - 14L * 86400)
      m.groupBy(col("entity"))
        .agg(
          max(when(col("sscore") >= 2,
            struct(col("created_at"), col("event_id")))).as("pos"),
          max(when(col("sscore") <= -2,
            struct(col("created_at"), col("event_id")))).as("neg"))
        .filter(col("pos").isNotNull && col("neg").isNotNull)
        .select(col("entity"),
          col("pos.event_id").cast("long").as("pos_mem"),
          col("neg.event_id").cast("long").as("neg_mem"),
          lit("contradicts").as("rel"))
        .orderBy(col("entity"))
    })
  )

  /** The s20 funnel body, shared with s21's LM-gated composition: the
    * s18 crawl fixture (one page per document, a re-crawled mirror of
    * doc 3, doc 7 damaged in transit) flowing WARC-parse → quarantine →
    * HTML→text → paragraph dedup (d13's keep-first over 16-token chunks,
    * URI-ordered) → ≥5-token quality gate. Quarantine rows carry
    * warcType = "corrupt", so the type filter IS the quarantine gate;
    * records flagged `lenient_trailer` (payload intact, single-CRLF
    * writer) are deliberately KEPT — a corrupt-isNull filter here would
    * re-lose exactly the records the lenient-trailer rescue exists to
    * keep. Returns (uri, text_deduped, n_kept, n_dropped, n_tokens).
    */
  private def ccnetDedupedPages(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Warc
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 20)
      .select(col("doc_id"), col("text")).collect().sortBy(_.getLong(0))
    val mirror = docs.find(_.getLong(0) == 3L).map(r =>
      ("https://mirror/doc/3",
        s"<html><body><p>${r.getString(1)}</p></body></html>")).toSeq
    val responses = docs.map { r =>
      (s"https://crawl/doc/${r.getLong(0)}",
        s"<html><body><p>${r.getString(1)}</p></body></html>")
    }.toSeq ++ mirror
    val bytes = Warc.corruptRecord(Warc.write(responses),
      "https://crawl/doc/7")
    val bins = s.read.format("binaryFile")
      .load(fixtureFile("graft_ccnet_", ".warc", bytes))
    import s.implicits._
    val pages = bins.select(col("content")).as[Array[Byte]]
      .flatMap(b => Warc.parse(b))
      .toDF()
      .filter(col("warcType") === "response")
      .select(col("targetUri").as("doc_id"), col("text"))
    graft.dedup.Dedup.paragraphDedup(pages)
      .withColumn("n_tokens",
        size(split(col("text_deduped"), " ")).cast("long"))
      .filter(col("n_tokens") >= 5)
      .select(col("doc_id").as("uri"), col("text_deduped"),
        col("n_kept"), col("n_dropped"), col("n_tokens"))
  }

  val oracleSql: Map[String, String] = Map(
    // Analytic replay of the fixture's construction: the writer's strings
    // are rebuilt in SQL (ASCII corpus ⇒ chars = octets), doc 7 is the
    // quarantined record, the warcinfo payload is the fixed 31-byte
    // software line.
    "s17_warc" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 12),
        |resp AS (
        |  SELECT 'response' AS warc_type,
        |    'https://example.com/doc/' || doc_id AS uri,
        |    CAST(200 AS BIGINT) AS http_status, 'text/html' AS mime,
        |    CAST(length('doc ' || doc_id || ' ' || text) AS BIGINT) AS n_chars,
        |    CAST(length('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
        |      'Content-Type: text/html; charset=utf-8' ||
        |      chr(13) || chr(10) || chr(13) || chr(10) ||
        |      '<html><head><title>doc ' || doc_id ||
        |      '</title><style>p{color:red}</style></head><body><p>' ||
        |      text || '</p></body></html>') AS BIGINT) AS n_payload,
        |    '-' AS corrupt
        |  FROM d WHERE doc_id <> 7),
        |info AS (
        |  SELECT 'warcinfo' AS warc_type, '-' AS uri,
        |    CAST(0 AS BIGINT) AS http_status,
        |    'application/warc-fields' AS mime, CAST(31 AS BIGINT) AS n_chars,
        |    CAST(31 AS BIGINT) AS n_payload, '-' AS corrupt),
        |bad AS (
        |  SELECT 'corrupt' AS warc_type, '-' AS uri,
        |    CAST(0 AS BIGINT) AS http_status, '-' AS mime,
        |    CAST(0 AS BIGINT) AS n_chars, CAST(0 AS BIGINT) AS n_payload,
        |    'bad_magic' AS corrupt)
        |SELECT * FROM (
        |  SELECT * FROM resp UNION ALL SELECT * FROM info
        |  UNION ALL SELECT * FROM bad)
        |ORDER BY uri, warc_type""".stripMargin,

    // Analytic replay of the crawl funnel: doc 7 is the quarantined
    // record (never reaches the text stage), the mirror re-crawl of doc 3
    // collapses in the exact-dedup group-by (min uri survives —
    // 'crawl' < 'mirror'), and the quality signals are integer-exact
    // (ppm via floor-div; both engines agree on non-negative input).
    "s18_crawl_funnel" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
        |pages AS (
        |  SELECT 'https://crawl/doc/' || doc_id AS uri, text
        |  FROM d WHERE doc_id <> 7
        |  UNION ALL
        |  SELECT 'https://mirror/doc/3' AS uri, text FROM d WHERE doc_id = 3),
        |kept AS (SELECT min(uri) AS uri, text FROM pages GROUP BY text)
        |SELECT uri,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST((1000000 * len(list_filter(string_split(lower(text), ' '),
        |      t -> list_contains(['a','an','and','are','as','at','be','by',
        |        'for','from','has','he','in','is','it','its','of','on',
        |        'that','the','to','was','were','will','with'], t))))
        |    // len(string_split(text, ' ')) AS BIGINT) AS stop_ppm
        |FROM kept
        |WHERE len(string_split(text, ' ')) >= 5
        |ORDER BY uri""".stripMargin,

    // Analytic replay of the CCNet funnel: the corrupt doc 7 never
    // reaches the text stage; keep-first paragraph dedup replays as a
    // (para)-partitioned row_number ordered by (uri, pos) — the oracle
    // may use a window, it does not need to scale; reassembly is a
    // pos-ordered string_agg over the kept chunks; the ≥5-token gate
    // removes the mirror's empty husk.
    "s20_ccnet_funnel" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
        |pages AS (
        |  SELECT 'https://crawl/doc/' || doc_id AS uri, text
        |  FROM d WHERE doc_id <> 7
        |  UNION ALL
        |  SELECT 'https://mirror/doc/3' AS uri, text FROM d WHERE doc_id = 3),
        |toks AS (SELECT uri, str_split(text, ' ') AS w FROM pages),
        |chunks AS (
        |  SELECT uri, CAST(i AS BIGINT) AS pos,
        |    array_to_string(list_slice(w, (i - 1) * 16 + 1, i * 16), ' ') AS para
        |  FROM toks,
        |    unnest(generate_series(1, CAST(ceil(len(w) / 16.0) AS BIGINT))) AS t(i)),
        |ranked AS (
        |  SELECT uri, pos, para,
        |    row_number() OVER (PARTITION BY para ORDER BY uri, pos) AS rn
        |  FROM chunks),
        |dedup AS (
        |  SELECT uri,
        |    coalesce(string_agg(para, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
        |      '') AS text_deduped,
        |    CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |    CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
        |  FROM ranked GROUP BY uri)
        |SELECT uri, text_deduped, n_kept, n_dropped,
        |  CAST(len(str_split(text_deduped, ' ')) AS BIGINT) AS n_tokens
        |FROM dedup
        |WHERE len(str_split(text_deduped, ' ')) >= 5
        |ORDER BY uri""".stripMargin,

    // The full CCNet replay: s20's funnel CTEs, then x36's LM chain with
    // the LM trained on the documents %5 slice and the SCORED side being
    // the funnel's kept pages, then the batch tercile thresholds (exact
    // order statistics — the oracle may sort the whole batch; the Spark
    // side's collect_list is file-bounded). keep = mean_milli <= t2, the
    // same integer comparison as not-tail.
    "s21_ccnet_lm_gate" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
        |pages AS (
        |  SELECT 'https://crawl/doc/' || doc_id AS uri, text
        |  FROM d WHERE doc_id <> 7
        |  UNION ALL
        |  SELECT 'https://mirror/doc/3' AS uri, text FROM d WHERE doc_id = 3),
        |ptoks AS (SELECT uri, str_split(text, ' ') AS w FROM pages),
        |chunks AS (
        |  SELECT uri, CAST(i AS BIGINT) AS pos,
        |    array_to_string(list_slice(w, (i - 1) * 16 + 1, i * 16), ' ') AS para
        |  FROM ptoks,
        |    unnest(generate_series(1, CAST(ceil(len(w) / 16.0) AS BIGINT))) AS t(i)),
        |ranked AS (
        |  SELECT uri, pos, para,
        |    row_number() OVER (PARTITION BY para ORDER BY uri, pos) AS rn
        |  FROM chunks),
        |dedup AS (
        |  SELECT uri,
        |    coalesce(string_agg(para, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
        |      '') AS text_deduped
        |  FROM ranked GROUP BY uri),
        |kept AS (
        |  SELECT uri, text_deduped FROM dedup
        |  WHERE len(str_split(text_deduped, ' ')) >= 5),
        |ltok AS (SELECT str_split(text, ' ') AS ts FROM documents
        |         WHERE doc_id % 5 = 0),
        |lbg AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
        |        FROM ltok, unnest(range(1, len(ts))) t(i)),
        |lm AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |       FROM lbg GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lm GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS nv
        |      FROM (SELECT unnest(ts) AS t FROM ltok)),
        |ktok AS (SELECT uri, str_split(text_deduped, ' ') AS ts FROM kept),
        |kbg AS (SELECT uri, ts[i] AS w1, ts[i + 1] AS w2
        |        FROM ktok, unnest(range(1, len(ts))) t(i)),
        |sc AS (
        |  SELECT kbg.uri,
        |    CAST(length(bin((COALESCE(uni.c1, 0) + v.nv) //
        |      (COALESCE(lm.c12, 0) + 1))) - 1 AS BIGINT) AS bits
        |  FROM kbg CROSS JOIN v
        |  LEFT JOIN lm ON kbg.w1 = lm.w1 AND kbg.w2 = lm.w2
        |  LEFT JOIN uni ON kbg.w1 = uni.w1),
        |per AS (
        |  SELECT uri, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(bits) AS BIGINT) AS surprisal_bits,
        |    CAST((1000 * sum(bits)) // count(*) AS BIGINT) AS mean_milli
        |  FROM sc GROUP BY uri),
        |thr AS (
        |  SELECT ms[CAST(ceil(len(ms) / 3.0) AS BIGINT)] AS t1,
        |    ms[CAST(ceil(len(ms) * 2 / 3.0) AS BIGINT)] AS t2
        |  FROM (SELECT list_sort(list(mean_milli)) AS ms FROM per))
        |SELECT per.uri, per.n_bigrams, per.surprisal_bits, per.mean_milli,
        |  CASE WHEN per.mean_milli <= thr.t1 THEN 'head'
        |       WHEN per.mean_milli <= thr.t2 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket,
        |  per.mean_milli <= thr.t2 AS keep
        |FROM per CROSS JOIN thr ORDER BY per.uri""".stripMargin,

    // WET round trip: conversion payloads ARE the document text, so the
    // oracle is the documents table itself (doc 7 = the damaged record).
    "s19_wet_ingest" ->
      """SELECT 'https://wet/doc/' || doc_id AS uri, 'text/plain' AS mime,
        |  text, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents WHERE doc_id < 20 AND doc_id <> 7
        |ORDER BY uri""".stripMargin,

    "s6_bulk_import" ->
      """WITH batch AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 400000, embedding[1:32] FROM embeddings WHERE vec_id < 3),
        |dim AS (SELECT len(embedding) AS d FROM embeddings WHERE vec_id = 0)
        |SELECT CAST(sum(CASE WHEN len(embedding) = dim.d THEN 1 ELSE 0 END) AS BIGINT) AS n_imported,
        |       CAST(sum(CASE WHEN len(embedding) <> dim.d THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected
        |FROM batch CROSS JOIN dim""".stripMargin,

    "s7_export" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(label) AS BIGINT) AS label_sum
        |FROM embeddings WHERE vec_id % 17 <> 0""".stripMargin,

    // Real binaries round-trip through the pure-JVM extractors (writers are
    // lossless for single-line ASCII text, so n_chars == length(text));
    // doc 6 is a deliberately corrupt .pdf: the JVM parser rejects it,
    // pdftotext is absent, `cat` wins → 'cli:cat' with trimmed text.
    "s9_loaders" ->
      """SELECT 'doc_' || doc_id ||
        |    CASE doc_id % 4 WHEN 0 THEN '.txt' WHEN 1 THEN '.md'
        |      WHEN 2 THEN '.pdf' ELSE '.docx' END AS file,
        |  CASE WHEN doc_id % 4 = 0 THEN 'text'
        |       WHEN doc_id % 4 = 1 THEN 'markdown'
        |       WHEN doc_id = 6 THEN 'cli:cat'
        |       WHEN doc_id % 4 = 2 THEN 'jvm:pdf-mini'
        |       ELSE 'jvm:docx-xml' END AS loader,
        |  CAST(CASE WHEN doc_id % 4 >= 2
        |    THEN length(trim(text, ' ' || chr(9) || chr(10) || chr(13)))
        |    ELSE length(text) END AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id < 10 ORDER BY file""".stripMargin,

    "v9_quantize" ->
      s"""WITH $absMaxSql,
         |ex AS (
         |  SELECT vec_id, unnest(embedding) AS e, generate_subscripts(embedding, 1) AS pos
         |  FROM embeddings WHERE vec_id < 20),
         |q AS (
         |  SELECT vec_id, pos, CAST(e AS DOUBLE) AS x,
         |    $codeSql AS qc, absmax
         |  FROM ex CROSS JOIN am)
         |SELECT CAST(vec_id AS BIGINT) AS id,
         |  CAST(sum(qc) AS BIGINT) AS qsum,
         |  CAST(min(qc) AS BIGINT) AS qmin, CAST(max(qc) AS BIGINT) AS qmax,
         |  round(sqrt(sum((x - qc / 127.0 * absmax) * (x - qc / 127.0 * absmax))), 6) AS recon_err
         |FROM q GROUP BY vec_id ORDER BY id""".stripMargin,

    "v10_precision_migration" ->
      s"""WITH $absMaxSql,
         |deq AS (
         |  SELECT vec_id AS id, embedding,
         |    list_transform(embedding,
         |      e -> $codeSql / 127.0 * absmax) AS dvec
         |  FROM embeddings CROSS JOIN am),
         |qs AS (SELECT id AS qid, embedding AS qe, dvec AS qd FROM deq WHERE id < 5),
         |exact AS (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, d.id, row_number() OVER (PARTITION BY q.qid
         |      ORDER BY ${cosSql("d.embedding", "q.qe")}, d.id) AS rn
         |    FROM deq d CROSS JOIN qs q) WHERE rn <= 10),
         |quant AS (
         |  SELECT qid, id FROM (
         |    SELECT q.qid, d.id, row_number() OVER (PARTITION BY q.qid
         |      ORDER BY ${cosSql("d.dvec", "q.qd")}, d.id) AS rn
         |    FROM deq d CROSS JOIN qs q) WHERE rn <= 10)
         |SELECT CAST(e.qid AS BIGINT) AS qid, CAST(count(*) AS BIGINT) AS n_overlap
         |FROM exact e JOIN quant u ON e.qid = u.qid AND e.id = u.id
         |GROUP BY e.qid ORDER BY qid""".stripMargin,

    // Terms are exact (f16 diffs/squares fit a double); only accumulation
    // order differs between engines — round(…,6) absorbs it (v9 precedent).
    "v14_f16" -> {
      val h = f16Sql("x")
      s"""WITH ex AS (
         |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         |    generate_subscripts(embedding, 1) AS pos
         |  FROM embeddings WHERE vec_id < 20),
         |f AS (SELECT vec_id, pos, x, $h AS hv FROM ex),
         |qx AS (
         |  SELECT pos, $h AS qh FROM (
         |    SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
         |      generate_subscripts(embedding, 1) AS pos
         |    FROM embeddings WHERE vec_id = 0))
         |SELECT CAST(f.vec_id AS BIGINT) AS id,
         |  round(sum((f.hv - qx.qh) * (f.hv - qx.qh)), 6) AS qdist,
         |  round(sqrt(sum((f.x - f.hv) * (f.x - f.hv))), 6) AS recon_err
         |FROM f JOIN qx USING (pos)
         |GROUP BY f.vec_id ORDER BY id""".stripMargin
    },

    "c8_contradictions" -> {
      val mentionsAgg =
        s"""scored AS (
           |  SELECT entity, event_id, created_at,
           |    (CASE WHEN content LIKE '%good%' THEN 1.0 ELSE 0.0 END
           |     + CASE WHEN content LIKE '%great%' THEN 1.0 ELSE 0.0 END
           |     + CASE WHEN content LIKE '%love%' THEN 1.0 ELSE 0.0 END
           |     + CASE WHEN content LIKE '%win%' THEN 1.0 ELSE 0.0 END
           |     - CASE WHEN content LIKE '%bad%' THEN 1.0 ELSE 0.0 END
           |     - CASE WHEN content LIKE '%fail%' THEN 1.0 ELSE 0.0 END
           |     - CASE WHEN content LIKE '%awful%' THEN 1.0 ELSE 0.0 END) AS s
           |  FROM mentions
           |  WHERE created_at >= ${GardenerQueries.Now} - 14 * 86400)""".stripMargin
      s"""WITH ${GardenerQueries.mentionsSql},
         |$mentionsAgg,
         |agg AS (
         |  SELECT entity,
         |    max(CASE WHEN s >= 2 THEN struct_pack(created_at := created_at, event_id := event_id) END) AS pos,
         |    max(CASE WHEN s <= -2 THEN struct_pack(created_at := created_at, event_id := event_id) END) AS neg
         |  FROM scored GROUP BY entity)
         |SELECT entity, CAST(pos.event_id AS BIGINT) AS pos_mem,
         |  CAST(neg.event_id AS BIGINT) AS neg_mem, 'contradicts' AS rel
         |FROM agg WHERE pos IS NOT NULL AND neg IS NOT NULL
         |ORDER BY entity""".stripMargin
    }
  )
}
