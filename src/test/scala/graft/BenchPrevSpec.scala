package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the vs_prev trend sentence the aux bench mains embed into
  * hand-built JSON lines (r16 ADVICE): the sentence must be JSON-string-
  * safe (quotes/backslashes in a future key or artifact name must not
  * emit invalid JSON) and numerically locale-stable (a comma-decimal
  * default locale must not print `1,24x`). */
class BenchPrevSpec extends AnyFunSuite {

  test("jsonSafe escapes quotes, backslashes and control chars so the " +
      "sentence embeds verbatim in a JSON string literal") {
    val raw = "k\"v\\w\nx"
    val safe = BenchPrev.jsonSafe(raw)
    // the escaped form must round-trip through a real JSON parser
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(s"""{"vs_prev":"$safe"}""").get("vs_prev").asText()
    assert(!parsed.contains('\n'))
    assert(parsed.contains("k\"v\\w"))
  }

  test("number formatting is Locale.ROOT-stable: a comma-decimal default " +
      "locale still emits dot decimals") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(BenchPrev.ratio(1.2345) == "1.23")
    } finally java.util.Locale.setDefault(saved)
  }

  test("note() output parses as a JSON string value even when the prev " +
      "artifact's path carries a double quote") {
    val dir = java.nio.file.Files.createTempDirectory("benchprev")
    // a quote in a file name is legal on posix — the shape the escaping
    // exists for (the artifact NAME is embedded in the sentence)
    val prev = dir.resolve("BENCH_\"odd\".json")
    java.nio.file.Files.write(prev, """{"rate":100}""".getBytes("UTF-8"))
    val note = BenchPrev.note(prev.toString, Seq("rate" -> 124.0))
    assert(note.nonEmpty)
    val line = s"""{"metric":"x","vs_prev":"$note"}"""
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(line).get("vs_prev").asText()
    assert(parsed.contains("rate 100->124 (1.24x)"), parsed)
  }
}
