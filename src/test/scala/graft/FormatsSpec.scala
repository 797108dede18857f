package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables

/** Source/sink format coverage beyond the reference's text/MTX/CSV edges:
  * every interchange format Spark ships natively round-trips losslessly
  * (parquet, ORC) or with documented type relaxation (JSON, CSV —
  * schema-on-read re-applied explicitly, the posture for 100 TB ingest
  * where inference over the full input is a non-starter).
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val d = SparkTestSession.sfDir

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-fmt-$name").resolve("out").toString

  test("parquet and orc round-trip the orders table losslessly") {
    val orders = Tables.orders(spark, d)
    Seq("parquet", "orc").foreach { fmt =>
      val path = tmp(fmt)
      orders.write.format(fmt).save(path)
      val back = spark.read.format(fmt).load(path)
      assert(back.schema == orders.schema, s"$fmt schema drift")
      assert(canon(back) == canon(orders), s"$fmt data drift")
    }
  }

  test("json round-trips orders with the schema re-applied (no inference)") {
    val orders = Tables.orders(spark, d)
    val path = tmp("json")
    orders.write.json(path)
    val back = spark.read.schema(orders.schema).json(path)
    assert(canon(back) == canon(orders))
  }

  test("csv round-trips orders with header + explicit schema + timestamp format") {
    val orders = Tables.orders(spark, d)
    val path = tmp("csv")
    orders.write.option("header", "true").csv(path)
    val back = spark.read
      .option("header", "true")
      .schema(orders.schema)
      .csv(path)
    assert(canon(back) == canon(orders))
  }

  test("csv DROPMALFORMED skips broken rows instead of failing the scan (P10)") {
    val path = tmp("csvbad")
    val dir = new java.io.File(path); dir.mkdirs()
    val f = new java.io.PrintWriter(s"$path/part-0.csv")
    f.println("k,v"); f.println("1,10.5"); f.println("oops,not_a_number"); f.println("2,20.0")
    f.close()
    val back = spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema("k INT, v DOUBLE")
      .csv(path)
      .filter(col("k").isNotNull && col("v").isNotNull)
    assert(back.count() == 2)
  }
}
