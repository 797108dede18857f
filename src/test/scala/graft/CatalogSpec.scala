package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables

/** Catalog / managed-table API surface: saveAsTable with partitioning,
  * catalog listing, INSERT INTO append, and pruning through the
  * catalog-resolved scan — the table-management layer a user of the
  * engine drives day to day.
  */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val d = SparkTestSession.sfDir

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val p = java.nio.file.Paths.get(s"spark-warehouse/$name")
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("saveAsTable + catalog listing + partition pruning through the catalog") {
    dropTable("docs_by_lang")
    Tables.documents(spark, d)
      .write.partitionBy("lang").saveAsTable("docs_by_lang")

    assert(spark.catalog.tableExists("docs_by_lang"))
    assert(spark.catalog.listTables().collect().exists(_.name == "docs_by_lang"))
    assert(spark.catalog.listColumns("docs_by_lang").collect().map(_.name).contains("doc_id"))

    // catalog-resolved scan still prunes partitions on the lang predicate
    val q = spark.table("docs_by_lang").filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"no partition pruning through the catalog:\n$scan")
    val direct = Tables.documents(spark, d).filter(col("lang") === "en").count()
    assert(q.count() == direct)
    dropTable("docs_by_lang")
  }

  test("INSERT INTO appends through the catalog with SQL") {
    dropTable("nation_copy")
    Tables.nation(spark, d).write.saveAsTable("nation_copy")
    val before = spark.table("nation_copy").count()
    spark.sql("INSERT INTO nation_copy SELECT * FROM nation_copy WHERE n_nationkey < 3")
    val added = Tables.nation(spark, d).filter(col("n_nationkey") < 3).count()
    assert(spark.table("nation_copy").count() == before + added)
    dropTable("nation_copy")
  }

  test("CREATE TABLE AS SELECT and DESCRIBE") {
    dropTable("big_orders")
    spark.sql(s"CREATE TABLE big_orders AS SELECT * FROM parquet.`$d/orders.parquet` WHERE o_totalprice > 400000")
    val desc = spark.sql("DESCRIBE TABLE big_orders").collect().map(_.getString(0))
    assert(desc.contains("o_orderkey") && desc.contains("o_totalprice"))
    assert(spark.table("big_orders").count() ==
      Tables.orders(spark, d).filter(col("o_totalprice") > 400000).count())
    dropTable("big_orders")
  }
}
