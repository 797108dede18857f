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

  // ---- loader schema contract (round-8 regression class) --------------
  // A regenerated testdata export with a changed encoding must fail at
  // LOAD time with a named table + column, not as a mid-query analysis
  // error ten queries deep.

  private def fakeSf(name: String)(write: String => Unit): String = {
    val dir = Files.createTempDirectory(s"graft-schema-$name").toString
    write(dir)
    dir
  }

  test("loader rejects a re-typed column with a named table+column error") {
    import spark.implicits._
    val sf = fakeSf("retype") { dir =>
      // doc_id re-exported as string — integral family violation
      Seq(("1", "hello", "en", "web", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val e = intercept[IllegalStateException](Tables.documents(spark, sf))
    assert(e.getMessage.contains("documents"))
    assert(e.getMessage.contains("doc_id"))
    assert(e.getMessage.contains("expected integral"))
  }

  test("loader rejects a missing column with a named table+column error") {
    import spark.implicits._
    val sf = fakeSf("missing") { dir =>
      Seq((1L, "hello")).toDF("doc_id", "text")
        .write.parquet(s"$dir/documents.parquet")
    }
    val e = intercept[IllegalStateException](Tables.documents(spark, sf))
    assert(e.getMessage.contains("missing required column 'lang'"))
  }

  test("events loader accepts both ts encodings (native timestamp and int64 nanos)") {
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampType
    // native micros timestamp (current testdata encoding)
    val sfNative = fakeSf("ev-native") { dir =>
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
    }
    val native = Tables.events(spark, sfNative)
    assert(native.schema("ts").dataType == TimestampType)
    assert(native.count() == 1)

    // legacy int64-nanos encoding: the shim must divide to micros
    val nanos = 1704067201000000000L // 2024-01-01T00:00:01Z in ns
    val sfLegacy = fakeSf("ev-legacy") { dir =>
      Seq((1L, nanos, 7L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
    }
    val legacy = Tables.events(spark, sfLegacy)
    assert(legacy.schema("ts").dataType == TimestampType)
    val got = legacy.select(unix_timestamp(col("ts"))).as[Long].head()
    assert(got == nanos / 1000000000L)
  }
}
