package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Sizing

/** Sized parquet writes: the byte-budget estimate drives the file
  * count, small tables never fan out, empty frames stay readable, and
  * the result is the same rows.
  */
class SizingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ~1 KiB of INCOMPRESSIBLE payload per row (seeded hex stream), so
  // parquet's compression can't collapse the size model under the test
  private def wideRows(n: Int) =
    spark.range(n.toLong).select(col("id"),
      concat_ws("", (0 until 32).map(i =>
        md5(concat(col("id").cast("string"), lit(s"|$i")))): _*).as("payload"))

  test("file count tracks the byte budget within the estimate band") {
    val dir = Files.createTempDirectory("graft-sizing").toString + "/t"
    // ~4000 rows x ~1 KiB = ~4 MiB raw; 512 KiB budget → ~8 ideal files
    val rep = Sizing.writeSized(wideRows(4000), dir, targetBytes = 512L * 1024)
    assert(rep.rows == 4000L)
    assert(rep.writtenFiles == rep.files)
    assert(rep.files >= 4 && rep.files <= 16, s"estimate band: $rep")
    // actual mean file size lands within 2x of the budget
    val mean = rep.writtenBytes.toDouble / rep.writtenFiles
    assert(mean > 512 * 1024 / 2.0 && mean < 512 * 1024 * 2.0,
      s"mean file size $mean vs budget: $rep")
    // and the data round-trips
    assert(spark.read.parquet(dir).count() == 4000L)
  }

  test("a small table under one budget writes exactly one file") {
    val dir = Files.createTempDirectory("graft-sizing-small").toString + "/t"
    val rep = Sizing.writeSized(wideRows(50), dir)
    assert(rep.files == 1 && rep.writtenFiles == 1, s"$rep")
    assert(spark.read.parquet(dir).count() == 50L)
  }

  test("maxFiles caps a pathological fan-out") {
    val dir = Files.createTempDirectory("graft-sizing-cap").toString + "/t"
    // 1-byte budget would want thousands of files; the cap holds it
    val rep = Sizing.writeSized(wideRows(2000), dir, targetBytes = 1L,
      maxFiles = 8)
    assert(rep.files == 8 && rep.writtenFiles == 8, s"$rep")
  }

  test("empty frames write a readable schema-bearing dataset") {
    val dir = Files.createTempDirectory("graft-sizing-empty").toString + "/t"
    val rep = Sizing.writeSized(wideRows(0), dir)
    assert(rep.rows == 0L && rep.files == 1)
    assert(spark.read.parquet(dir).count() == 0L)
    assert(spark.read.parquet(dir).columns.sameElements(Array("id", "payload")))
  }
}
