package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CLI-delegated document text extraction — reference `pkg/rag/loader_cli.go:43`
  * (`CLILoader.Load`): binary codecs (PDF/DOCX) run as child processes with
  * a timeout, and loaders chain as fallbacks (`loader.go`'s dispatch tries
  * the advanced parser first, then the CLI tool). The command is a
  * list-based argv template with a `{{file_path}}` placeholder — no shell,
  * no injection — exactly the reference's contract.
  *
  * Spark shape: a `mapPartitions` over the `binaryFile` source. Each task
  * writes the document bytes to a task-local temp file (the distributed
  * file's bytes — no executor-local-path assumption), substitutes the
  * placeholder, execs the chain until one converter succeeds, and cleans
  * up. Stdout is redirected to a file so a hung converter can be killed on
  * timeout without a pipe-read deadlock. Extraction is pure in
  * (content, argv), so task retries are safe; process startup cost
  * amortizes per-file, matching the reference's per-`Load` exec.
  */
object CliLoader {

  /** One step of a fallback chain: an external CLI tool or an in-process
    * pure-JVM extractor (the reference's "advanced parser" leg —
    * `loader.go` tries the in-process parser before the CLI tool).
    */
  sealed trait Step extends Serializable

  /** One converter attempt: argv template (`{{file_path}}` replaced with
    * the local temp file) + max child runtime (reference default 2 min).
    */
  final case class Converter(argv: Seq[String], timeoutMs: Long = 120000L)
      extends Step

  /** In-process extractor over the raw bytes (e.g. [[BinaryExtract.pdf]]);
    * succeeds on `Right` with non-empty trimmed text, like the CLI leg.
    */
  final case class JvmConverter(name: String,
      fn: Array[Byte] => Either[String, String]) extends Step

  /** Output schema: extracted `text` + the `converter` that produced it, or
    * `error` carrying every attempt's failure (text/converter null) — the
    * reference returns the chain's accumulated errors the same way.
    */
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("converter", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** Run the fallback chain on one file. Right((qualified name, text)) on
    * the first step yielding non-empty trimmed text — `jvm:<name>` for an
    * in-process extractor, `cli:<argv0>` for an exit-0 child with non-empty
    * stdout (`loader_cli.go:75-78`); Left(joined errors) when the chain is
    * exhausted.
    */
  private def extract(bytes: Array[Byte], local: java.nio.file.Path,
                      chain: Seq[Step]): Either[String, (String, String)] = {
    val errs = new StringBuilder
    def fail(tool: String, why: String): Unit = errs.append(s"$tool: $why; ")
    chain.foreach {
      case JvmConverter(name, fn) =>
        (try fn(bytes) catch {
          case e: Exception => Left(String.valueOf(e.getMessage))
        }) match {
          case Right(text) if text.trim.nonEmpty =>
            return Right((s"jvm:$name", text.trim))
          case Right(_)  => fail(name, "empty output")
          case Left(err) => fail(name, err)
        }
      case c: Converter =>
        val argv = c.argv.map(_.replace("{{file_path}}", local.toString))
        val out = Files.createTempFile("graft_cli_out_", ".txt")
        try {
          val pb = new ProcessBuilder(argv: _*)
          pb.redirectOutput(out.toFile)
          pb.redirectError(ProcessBuilder.Redirect.DISCARD)
          val p = pb.start()
          p.getOutputStream.close()
          if (!p.waitFor(c.timeoutMs, TimeUnit.MILLISECONDS)) {
            p.destroyForcibly()
            p.waitFor()
            fail(argv.head, s"timed out after ${c.timeoutMs} ms")
          } else if (p.exitValue() != 0) {
            fail(argv.head, s"exit ${p.exitValue()}")
          } else {
            val text =
              new String(Files.readAllBytes(out), StandardCharsets.UTF_8).trim
            if (text.isEmpty) fail(argv.head, "empty output")
            else return Right((s"cli:${argv.head}", text))
          }
        } catch {
          // Missing binary (the pdftotext-not-installed case) → next in chain.
          case e: java.io.IOException => fail(argv.head, String.valueOf(e.getMessage))
        } finally Files.deleteIfExists(out)
    }
    Left(errs.toString.trim)
  }

  /** Extract text from `binaryFile` rows (`path`, `content`) by piping each
    * file through the converter chain for its extension. `chains` maps
    * lower-case extension → fallback chain; extensions without a chain get
    * an error row (the reference's "no loader for extension").
    */
  /** Default chains: pure-JVM extractor first (the advanced-parser leg),
    * then the usual CLI tools, then nothing — a corrupt binary surfaces the
    * accumulated errors rather than silently passing identity bytes.
    */
  val defaultChains: Map[String, Seq[Step]] = Map(
    "pdf" -> Seq(
      JvmConverter("pdf-mini", BinaryExtract.pdf _),
      Converter(Seq("pdftotext", "{{file_path}}", "-"))),
    "docx" -> Seq(
      JvmConverter("docx-xml", BinaryExtract.docx _),
      Converter(Seq("pandoc", "-t", "plain", "{{file_path}}"))))

  def load(files: DataFrame,
           chains: Map[String, Seq[Step]]): DataFrame = {
    val spark = files.sparkSession
    val rows = files.select(col("path"), col("content")).rdd.mapPartitions { it =>
      it.map { r =>
        val path = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val dot = path.lastIndexOf('.')
        val ext = if (dot < 0) "" else path.substring(dot + 1).toLowerCase
        chains.get(ext) match {
          case None => Row(path, null, null, s"no converter chain for .$ext")
          case Some(chain) =>
            // JVM-only chains never touch the filesystem; the temp file
            // exists only for CLI steps (argv needs a local path).
            val res =
              if (chain.forall(_.isInstanceOf[JvmConverter]))
                extract(bytes, null, chain)
              else {
                val tmp = Files.createTempFile("graft_cli_in_", s".$ext")
                try { Files.write(tmp, bytes); extract(bytes, tmp, chain) }
                finally Files.deleteIfExists(tmp)
              }
            res match {
              case Right((conv, text)) => Row(path, text, conv, null)
              case Left(err)           => Row(path, null, null, err)
            }
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
