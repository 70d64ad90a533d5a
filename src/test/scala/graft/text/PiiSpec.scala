package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PiiSpec extends SparkSpec {

  private def one(text: String): (String, Map[String, Long]) = {
    val s = spark
    import s.implicits._
    val df = Seq(text).toDF("t")
    val cnts = Pii.counts(col("t")).map { case (n, c) => c.as(n) }
    val row = df.select(Seq(Pii.redact(col("t")).as("r")) ++ cnts: _*)
      .collect().head
    (row.getString(0),
      Pii.Patterns.map(_._1).zipWithIndex
        .map { case (n, i) => n -> row.getLong(i + 1) }.toMap)
  }

  test("each pattern family is detected and replaced by its token") {
    val (r, c) = one("mail a.b_c%x+1@sub.example.co now, call 555-123-4567, " +
      "host 192.168.0.1, ssn 123-45-6789, card 4111111111111111 end")
    assert(r == "mail <EMAIL> now, call <PHONE>, host <IP>, ssn <SSN>, " +
      "card <CC> end")
    assert(c == Map("email" -> 1L, "phone" -> 1L, "ip" -> 1L, "ssn" -> 1L,
      "cc" -> 1L))
  }

  test("SSN (3-2-4) and phone (3-3-4) shapes do not cross-match") {
    val (r, c) = one("a 111-22-3333 b 444-555-6666 c")
    assert(r == "a <SSN> b <PHONE> c")
    assert(c("ssn") == 1L && c("phone") == 1L)
  }

  test("an IP inside a longer dotted-digit run is boundary-guarded") {
    // 5 octets: \b..\b still matches a 4-octet prefix? No — the trailing
    // `.5` continues the token, but `\b` sits between digit and dot, so
    // the first four octets DO match. Pin the actual (Java==RE2) behavior.
    val (r, _) = one("x 1.2.3.4 y")
    assert(r == "x <IP> y")
    val (rClean, c2) = one("ver 1.2.3 stays")
    assert(rClean == "ver 1.2.3 stays" && c2("ip") == 0L)
  }

  test("multiple occurrences are all replaced (global, not first-match)") {
    val (r, c) = one("a@b.com c@d.org 1.1.1.1 2.2.2.2")
    assert(r == "<EMAIL> <EMAIL> <IP> <IP>")
    assert(c("email") == 2L && c("ip") == 2L)
  }

  test("clean text passes through untouched") {
    val txt = "no pii here, just words and numbers like 42 or 3.14"
    val (r, c) = one(txt)
    assert(r == txt)
    assert(c.values.sum == 0L)
  }
}
