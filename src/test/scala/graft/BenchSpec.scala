package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench list is the regression radar: every registered driver query
  * must be timed per round, or a regression in the missing operator is
  * invisible between rounds (it happened twice to s2 before it was benched,
  * and 16 rows stayed blind through round 4).
  */
class BenchSpec extends AnyFunSuite {

  test("every SparkEntry query is benched, and every benched name exists") {
    val registered = SparkEntry.queries.keySet
    val benched = Bench.HeadlineQueries.toSet
    assert(Bench.HeadlineQueries.size == benched.size, "duplicate bench rows")
    val unbenched = registered -- benched
    assert(unbenched.isEmpty, s"registered but not benched: ${unbenched.toSeq.sorted.mkString(", ")}")
    val phantom = benched -- registered
    assert(phantom.isEmpty, s"benched but not registered: ${phantom.toSeq.sorted.mkString(", ")}")
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle (driver falls back to rows-only): ${missing.toSeq.sorted.mkString(", ")}")
  }
}
