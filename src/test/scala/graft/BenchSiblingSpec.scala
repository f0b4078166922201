package graft

import org.scalatest.funsuite.AnyFunSuite

/** Role/pairing plumbing of the two-session bench protocol (r16 verdict
  * top task — the end-to-end pairing, min-shipping, both-session flag
  * and stale-sibling rejection are exercised by the evidence script's
  * smoke and self-test steps; these pin the path/role derivations a
  * driver re-run depends on). */
class BenchSiblingSpec extends AnyFunSuite {

  test("a detail path ending in _sibling.json IS the sibling session — " +
      "it must not pair or emit a vs-prev clause") {
    assert(Bench.isSiblingRun("bench_queries_sibling.json"))
    assert(Bench.isSiblingRun("/root/repo/BENCH_cluster_r17_queries_sibling.json"))
    assert(!Bench.isSiblingRun("bench_queries.json"))
    assert(!Bench.isSiblingRun("BENCH_cluster_r17_queries.json"))
  }

  test("the official session derives its sibling's path from its own " +
      "detail path (env override aside), so a bare driver re-run pairs " +
      "with the COMMITTED sibling") {
    if (sys.env.contains("SPARK_GRAFT_BENCH_SIBLING")) cancel("env override set")
    assert(Bench.siblingPathFor("bench_queries.json").getName ==
      "bench_queries_sibling.json")
    assert(Bench.siblingPathFor("/root/repo/BENCH_cluster_r17_queries.json")
      .getPath == "/root/repo/BENCH_cluster_r17_queries_sibling.json")
  }
}
