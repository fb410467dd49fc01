package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract integrity: the query registry stays consistent. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size,
      names.groupBy(identity).collect { case (n, g) if g.size > 1 => n })
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("most queries carry a full SQL oracle (rows-only is the exception)") {
    val total = SparkEntry.allQueries.size
    val withOracle = SparkEntry.oracleSql.size
    assert(withOracle >= total - 5, s"$withOracle oracles of $total queries")
  }

  test("flagship entry query returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
