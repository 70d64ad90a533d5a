package graft.filter

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.filter.FilterDsl._

/** Mirrors the reference's filter semantics tests
  * (`pkg/engine/roaring_filters_test.go`, `pkg/core/core_test.go`).
  */
class FilterDslSpec extends SparkSpec {

  private lazy val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("category", StringType),
    StructField("year", DoubleType),
    StructField("archived", BooleanType),
    StructField("tags", ArrayType(StringType))
  ))

  private lazy val df = {
    val rows = Seq(
      Row("v1", "A", 2020.0, false, Seq("ml", "go")),
      Row("v2", "B", 2021.0, true, Seq("rust")),
      Row("v3", "A", 2022.0, false, Seq("ml", "spark")),
      Row("v4", null, null, null, null), // missing fields
      Row("v5", "C", 2024.0, false, Seq.empty[String])
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
  }

  private def ids(filter: String): Set[String] =
    df.filter(FilterDsl.compile(filter, schema))
      .select("id").collect().map(_.getString(0)).toSet

  test("parse: OR of AND blocks, case-insensitive connectors") {
    val blocks = parse("a = 1 and b = 2 OR c > 3")
    assert(blocks == Seq(
      Seq(Atom("a", "=", "1"), Atom("b", "=", "2")),
      Seq(Atom("c", ">", "3"))))
  }

  test("parse: operator detection order matches reference (!= before =)") {
    assert(parseAtom("x != 'y'") == Atom("x", "!=", "y"))
    assert(parseAtom("x <= 5") == Atom("x", "<=", "5"))
    assert(parseAtom("x>=5") == Atom("x", ">=", "5"))
  }

  test("parse: quotes stripped from values") {
    assert(parseAtom("k = 'hello world'") == Atom("k", "=", "hello world"))
    assert(parseAtom("k = \"x\"") == Atom("k", "=", "x"))
  }

  test("equality: string, bool, numeric classes") {
    assert(ids("category = 'A'") == Set("v1", "v3"))
    assert(ids("archived = true") == Set("v2"))
    assert(ids("year = 2021") == Set("v2"))
  }

  test("array field matches per-element (array-contains, core.go:1494)") {
    assert(ids("tags = 'ml'") == Set("v1", "v3"))
    assert(ids("tags = 'spark'") == Set("v3"))
  }

  test("range scans exclude rows missing the field") {
    assert(ids("year >= 2021") == Set("v2", "v3", "v5"))
    assert(ids("year < 2021") == Set("v1"))
    assert(ids("year <= 2022 AND year > 2020") == Set("v2", "v3"))
  }

  test("range with non-numeric value errors (core.go:1841)") {
    intercept[ParseException] { FilterDsl.compile("year > 'abc'", schema) }
  }

  test("!= includes rows where the field is missing (core.go:1879-1917)") {
    assert(ids("category != 'A'") == Set("v2", "v4", "v5"))
    assert(ids("year != 2020") == Set("v2", "v3", "v4", "v5"))
    assert(ids("archived != true") == Set("v1", "v3", "v4", "v5"))
  }

  test("unknown key: eq/range match nothing, != matches all") {
    assert(ids("nope = 'x'") == Set.empty)
    assert(ids("nope > 3") == Set.empty)
    assert(ids("nope != 'x'") == Set("v1", "v2", "v3", "v4", "v5"))
  }

  test("AND-block empty short-circuit then OR union") {
    assert(ids("category = 'A' AND year >= 2022 OR category = 'C'") == Set("v3", "v5"))
  }

  test("CONTAINS extraction (search_utils.go:21-44)") {
    val (bool1, q1, f1) = parseHybridFilter("category = 'A' AND CONTAINS(content, 'fox')")
    assert(bool1 == "category = 'A'" && q1 == "fox" && f1 == "content")
    val (bool2, q2, f2) = parseHybridFilter("CONTAINS(body, \"hello\") AND year > 2020")
    assert(bool2 == "year > 2020" && q2 == "hello" && f2 == "body")
    val (bool3, q3, f3) = parseHybridFilter("year > 2020")
    assert(bool3 == "year > 2020" && q3 == "" && f3 == "")
  }
}
