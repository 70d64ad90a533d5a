package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's bench artifact keeps only the last ~2000 chars of stdout and
  * JSON-parses the final line; BENCH_r01..r08 all record `parsed: null`
  * because the single detail line has always overflowed that window. The
  * compact summary line is the fix — this spec pins (a) that it parses as
  * the last line, (b) that it stays far under the window, and (c) that the
  * recall-matched family picks extract the right points from a real
  * round-8-shaped detail line.
  */
class BenchSummarySpec extends AnyFunSuite {

  private val detail = {
    val src = scala.io.Source.fromFile("bench_out.json")
    try src.mkString.trim finally src.close()
  }
  private val results = Seq(
    ("h1_fusion_batch", 4.423, true), ("g9_shortest_paths", 3.95, true),
    ("h9_full_pipeline", 3.84, true), ("v1_ivf_ann", 1.2, true),
    ("d2_minhash_lsh", 2.02, true), ("t6_bm25", 2.1, true),
    ("broken_query", -1.0, false))

  private val line = Bench.compactSummary(detail, results, 103.436,
    "32", "/root/testdata/sf0.1", """["broken_query"]""", "[]")

  test("summary fits the driver's 2000-char stdout tail with wide margin") {
    assert(line.length < 1600, s"summary too long: ${line.length} chars")
  }

  test("summary is a single line of well-formed JSON") {
    assert(!line.contains("\n"))
    // Minimal structural JSON check without a JSON lib on the classpath:
    // balanced braces/brackets outside strings, starts/ends as an object.
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}"))
    var depth = 0; var inStr = false; var prev = ' '
    line.foreach { c =>
      if (inStr) { if (c == '"' && prev != '\\') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1; assert(depth >= 0)
        case _ => ()
      }
      prev = c
    }
    assert(depth == 0 && !inStr)
  }

  test("driver-spec fields and slowest queries are present") {
    assert(line.contains(""""metric":"total""""))
    assert(line.contains(""""value":103.436"""))
    assert(line.contains(""""unit":"sec""""))
    assert(line.contains(""""sf":"/root/testdata/sf0.1""""))
    assert(line.contains(""""queries":{"h1_fusion_batch":4.423"""))
    assert(line.contains(""""failed":["broken_query"]"""))
    // Failed queries never appear in the timings map with -1.
    assert(!line.contains("-1.0"))
  }

  test("recall-matched picks come from the right family sweeps") {
    // Every family pick must be present, extracted from ITS OWN sweep, and
    // meet its recall bar (values move run to run; the invariants don't).
    val fam = """"(\w+)":\{"np":(\d+),"qps":([0-9.]+),"recall":([0-9.]+)\}""".r
    val picks = fam.findAllMatchIn(line)
      .map(m => m.group(1) -> (m.group(2).toInt, m.group(3).toDouble,
        m.group(4).toDouble)).toMap
    // The bars are BASELINE.md's published family recalls — the summary
    // picks are baseline-recall-matched by construction.
    val bars = Map("glove100_400k" -> 0.9664, "glove200_200k" -> 0.978,
      "glove300_200k" -> 0.957, "sift1m_l2" -> 0.9906)
    bars.foreach { case (k, bar) =>
      assert(picks.contains(k), s"missing family pick $k")
      assert(picks(k)._3 >= bar, s"$k recall ${picks(k)._3} below bar $bar")
    }
    assert(picks.contains("glove100_int8") && picks.contains("sift1m_f16"))
    // The pick is the max-QPS point MEETING the bar, not the sweep's max-
    // recall point: check against the detail line's own glove100 sweep.
    // `qps_min` (r18) is optional so both pre- and post-r18 artifacts parse.
    val pt = ("""\{"n_probe":(\d+),"qps":([0-9.]+)(?:,"qps_min":[0-9.]+)?""" +
      ""","recall_at_10":([0-9.]+)\}""").r
    val annIdx = detail.indexOf(""""ann":{"n"""")
    val sweepStart = detail.indexOf("\"ivf\":[", annIdx)
    val sweep = detail.substring(sweepStart, detail.indexOf("]", sweepStart))
    val best = pt.findAllMatchIn(sweep)
      .map(m => (m.group(1).toInt, m.group(2).toDouble, m.group(3).toDouble))
      .filter(_._3 >= 0.9664).maxBy(_._2)
    assert(picks("glove100_400k") == best)
    assert(line.contains(""""fused_qps":{"sf":"""))
    assert(line.contains(""""glove100_build_sec":"""))
  }

  test("guarded points with >2x same-run spread bought reps or are flagged " +
      "(r19, VERDICT r18 #2)") {
    // The r18 artifact committed a 16.7x same-run spread with
    // extra_reps: 0 — under the guard's own trigger that state must be
    // impossible, so the artifact now self-diagnoses: every qps_guard
    // entry either stayed tight, bought extra reps, or carries
    // "suspect":true so a reader can't take its median at face value.
    val entry =
      """"([A-Za-z0-9_.]+)":\{"min_sec":([0-9.eE+-]+),"max_sec":([0-9.eE+-]+),"extra_reps":(\d+)([^}]*)\}""".r
    val guard = """"qps_guard":\{""".r.findFirstMatchIn(detail)
    for (m <- guard.toSeq; e <- entry.findAllMatchIn(detail.drop(m.start))) {
      val (k, mn, mx, ex, rest) =
        (e.group(1), e.group(2).toDouble, e.group(3).toDouble,
          e.group(4).toInt, e.group(5))
      if (mx > 2.0 * mn)
        assert(ex > 0 || rest.contains(""""suspect":true"""),
          s"guard entry $k: spread ${mx / mn}x with extra_reps 0 and no " +
            "suspect flag")
    }
  }

  test("summary degrades gracefully when ANN sections are absent") {
    val bare = """{"metric":"total","unit":"sec","cpus":32,"failed":[],""" +
      """"flaky":[],"queries":{"q1":0.5},"value":0.5,"sf":"x"}"""
    val s = Bench.compactSummary(bare, Seq(("q1", 0.5, true)), 0.5,
      "32", "x", "[]", "[]")
    assert(s.contains(""""queries":{"q1":0.5}"""))
    assert(!s.contains(""""ann""""))
  }
}
