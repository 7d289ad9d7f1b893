package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: every oracle key must name a
  * query, rows-only entries must be the documented exceptions, and names
  * must be unique and well-formed.
  */
class ContractSpec extends AnyFunSuite {

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("rows-only queries are exactly the documented set") {
    // Round 2 gave q28 a DuckDB byte-histogram oracle, so every query is
    // now hash-checked: the rows-only exception set is empty.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, rowsOnly.toString)
  }

  test("query names are unique, snake_case, and q-numbered") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    names.foreach(n => assert(n.matches("q\\d+_[a-z0-9_]+"), n))
  }
}
