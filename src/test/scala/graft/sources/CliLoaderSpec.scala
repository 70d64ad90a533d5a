package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CliLoader.Converter

/** CLI loader chain semantics — reference `loader_cli.go` (exec with
  * timeout, stderr tolerated, empty output = failure) + the dispatch
  * fallback chain. Converters here are deterministic coreutils (`cat`,
  * `sleep`, `true`) so the tests pin behavior without any codec jar.
  */
class CliLoaderSpec extends SparkSpec {

  private def fixture(texts: Map[String, String]): DataFrame = {
    val dir = Files.createTempDirectory("graft_cli_spec")
    texts.foreach { case (name, body) =>
      Files.writeString(dir.resolve(name), body)
    }
    spark.read.format("binaryFile").load(dir.toString + "/*")
  }

  private def byFile(df: DataFrame): Map[String, (String, String, String)] =
    df.select(regexp_extract(col("path"), "([^/]+)$", 1),
        col("text"), col("converter"), col("error"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap

  test("cat converter extracts (trimmed) text; converter recorded") {
    val files = fixture(Map("a.pdf" -> "  hello cli world \n"))
    val out = byFile(CliLoader.load(files,
      Map("pdf" -> Seq(Converter(Seq("cat", "{{file_path}}"))))))
    assert(out("a.pdf") == (("hello cli world", "cli:cat", null)))
  }

  test("missing binary falls through the chain (loader dispatch fallback)") {
    val files = fixture(Map("b.pdf" -> "fallback body"))
    val out = byFile(CliLoader.load(files,
      Map("pdf" -> Seq(
        Converter(Seq("graft-no-such-converter", "{{file_path}}")),
        Converter(Seq("cat", "{{file_path}}"))))))
    assert(out("b.pdf")._1 == "fallback body")
    assert(out("b.pdf")._2 == "cli:cat")
  }

  test("timeout kills the converter and falls back (defaultCLITimeout semantics)") {
    val files = fixture(Map("c.pdf" -> "slow body"))
    val out = byFile(CliLoader.load(files,
      Map("pdf" -> Seq(
        Converter(Seq("sleep", "30"), timeoutMs = 300L),
        Converter(Seq("cat", "{{file_path}}"))))))
    assert(out("c.pdf")._1 == "slow body")
    assert(out("c.pdf")._2 == "cli:cat")
  }

  test("exit-0 empty output is a failure (loader_cli.go:76), not a result") {
    val files = fixture(Map("d.pdf" -> "real body"))
    val out = byFile(CliLoader.load(files,
      Map("pdf" -> Seq(
        Converter(Seq("true")),
        Converter(Seq("cat", "{{file_path}}"))))))
    assert(out("d.pdf")._1 == "real body")
    assert(out("d.pdf")._2 == "cli:cat")
  }

  test("exhausted chain and unmapped extension produce error rows") {
    val files = fixture(Map("e.pdf" -> "x", "f.docx" -> "y"))
    val out = byFile(CliLoader.load(files,
      Map("pdf" -> Seq(
        Converter(Seq("graft-no-such-converter", "{{file_path}}")),
        Converter(Seq("false", "{{file_path}}"))))))
    val (t, c, err) = out("e.pdf")
    assert(t == null && c == null)
    assert(err.contains("graft-no-such-converter") && err.contains("false: exit 1"))
    assert(out("f.docx")._3.contains("no converter chain for .docx"))
  }
}
