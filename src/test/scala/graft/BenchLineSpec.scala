package graft

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the bench stdout-line contract: one JSON line, valid, under the
  * hard [[Bench.LineCapBytes]] cap even on worst-case inputs (max-length
  * query names, every query flagged/suspect, long error messages, long
  * paths) — so headline-set growth can never silently regrow the line
  * past the driver's ~2 KB stdout-tail capture again (the r5 and r8
  * failure mode, `parsed: null`).
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def parse(line: String) = mapper.readTree(line)

  private def bytes(s: String): Int =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length

  private def stats(
      nQ: Int, nSf1: Int, nErr: Int, nameLen: Int, msgLen: Int,
      flagged: Boolean, suspect: Boolean): Bench.LineStats = {
    def name(i: Int) = (s"q${i}_" + "x" * nameLen).take(nameLen.max(4))
    val top = (0 until nQ).map(i => name(i) -> (1000.0 + i))
    val sf1Top = (0 until nSf1).map(i => name(i + nQ) -> (5000.0 + i))
    val errs = (0 until nErr).map(i =>
      name(i) -> ("java.lang.RuntimeException: " + "boom " * (msgLen / 5)))
    Bench.LineStats(
      total = 123456.789, trials = 5, sfDir = "/root/testdata/sf0.1/" + "d" * 80,
      top = top, nQueries = nQ, errors = errs,
      sf1Top = sf1Top, sf1Total = 987654.321, nSf1Queries = nSf1,
      sf1Errors = errs,
      loadStart = "31.99 30.88 29.77", loadEnd = "32.00 31.00 30.00",
      gateWaitSec = 600, sf1GateSec = 2400,
      flaggedWorst =
        if (flagged) Some((name(0), 99999.99, 88888.88)) else None,
      nFlagged = if (flagged) nQ + nSf1 else 0,
      suspectWorst = if (suspect) Some(name(1)) else None,
      nSuspect = if (suspect) nQ + nSf1 else 0,
      rejected = true, fullPath = "bench/" + "p" * 120 + ".json")
  }

  test("typical line: valid JSON, capped, driver keys present") {
    val line = Bench.compactLine(stats(33, 20, 0, 20, 0,
      flagged = false, suspect = false))
    assert(bytes(line) <= Bench.LineCapBytes, s"line ${bytes(line)}B: $line")
    val js = parse(line)
    assert(js.path("metric").asText() == "total")
    assert(js.path("value").asDouble() > 0)
    assert(js.path("unit").asText() == "sec")
    assert(js.path("queries").isObject)
    assert(js.path("sf1_queries").isObject)
    assert(js.path("sf").isTextual)
    assert(js.path("full").isTextual)
    // per-tier counts survive even though the maps are top-K only
    assert(js.path("n_queries").asInt() == 33)
    assert(js.path("n_sf1_queries").asInt() == 20)
  }

  test("worst case: 60+ queries, long names, all flagged+suspect, errors") {
    val line = Bench.compactLine(stats(64, 40, 64, 64, 200,
      flagged = true, suspect = true))
    assert(bytes(line) <= Bench.LineCapBytes, s"line ${bytes(line)}B: $line")
    val js = parse(line)
    assert(js.path("metric").asText() == "total")
    assert(js.path("n_errors").asInt() == 64)
    assert(js.path("n_flagged").asInt() == 104)
    assert(js.path("rejected").asBoolean())
  }

  test("pathological strings: quotes, backslashes, newlines stay valid JSON") {
    val base = stats(10, 5, 3, 24, 80, flagged = true, suspect = true)
    val evil = base.copy(
      sfDir = "/tmp/\"quoted\"\\back\nnew\tline",
      loadStart = "1.0\" \\ 2.0",
      errors = Seq("q_bad" -> "fail: \"msg\" with \\ and \n newline"),
      sf1Errors = Seq("q_bad2" -> "\t\r\n\"\\"),
      suspectWorst = Some("q\"uote\\name"),
      flaggedWorst = Some(("q\nname", 2.5, 0.1)))
    val line = Bench.compactLine(evil)
    assert(bytes(line) <= Bench.LineCapBytes)
    val js = parse(line) // throws if invalid
    assert(js.path("metric").asText() == "total")
  }

  test("empty tiers and empty errors: still valid and complete") {
    val line = Bench.compactLine(stats(0, 0, 0, 8, 0,
      flagged = false, suspect = false))
    assert(bytes(line) <= Bench.LineCapBytes)
    val js = parse(line)
    assert(js.path("queries").isObject && js.path("queries").size() == 0)
    assert(!js.has("errors")) // omitted when empty; count key remains
    assert(js.path("n_errors").asInt() == 0)
  }

  test("NaN/Inf totals render as numbers, not literals jackson rejects") {
    val line = Bench.compactLine(
      stats(3, 1, 0, 8, 0, flagged = false, suspect = false)
        .copy(total = Double.NaN, sf1Total = Double.PositiveInfinity))
    val js = parse(line)
    assert(js.path("value").isNumber)
    assert(js.path("sf1_total").isNumber)
  }
}
