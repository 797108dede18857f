package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks the driver relies on: every query builds and executes at
  * sf0.001; every oracle key has a matching query; entry returns rows.
  */
class QueriesContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("every oracle key has a corresponding query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes with non-empty schema") {
      val df = fn(spark, SparkTestSession.sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
