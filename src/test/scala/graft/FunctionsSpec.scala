package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** The native-expression extension surface: registration makes vec_dot a
  * first-class SQL function (same injection as
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("vec_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d == 32.0)
    val f = spark.sql(
      "SELECT vec_dot(array(cast(1.5 AS float), cast(2 AS float)), " +
        "array(cast(2 AS float), cast(0.25 AS float))) AS d")
      .collect().head.getDouble(0)
    assert(f == 3.5)
  }

  test("vec_dot rejects non-array operands with a type error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(1.0, 2.0)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }
}
