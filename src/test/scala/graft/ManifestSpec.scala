package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Manifest, Tables}

/** Dataset-manifest invariants: order-insensitivity of the fingerprint,
  * write/verify round-trip on the real testdata tree, and drift
  * detection (a changed row, a dropped row, a schema change).
  */
class ManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fingerprint is order- and layout-insensitive, and column boundaries don't alias") {
    val a = Seq((1L, "ab", "c"), (2L, "x", "y")).toDF("id", "u", "v")
    val (n1, f1) = Manifest.fingerprint(a)
    // reversed row order, different partitioning — same rows
    val b = Seq((2L, "x", "y"), (1L, "ab", "c")).toDF("id", "u", "v").repartition(7)
    val (n2, f2) = Manifest.fingerprint(b)
    assert((n1, f1) == (n2, f2))
    // ("ab","c") vs ("a","bc"): without the delimiter these would collide
    val c = Seq((1L, "a", "bc"), (2L, "x", "y")).toDF("id", "u", "v")
    assert(Manifest.fingerprint(c)._2 != f1, "column boundaries must not alias")
    // null is distinct from empty string
    val d1 = Seq((1L, null.asInstanceOf[String])).toDF("id", "u")
    val d2 = Seq((1L, "")).toDF("id", "u")
    assert(Manifest.fingerprint(d1)._2 != Manifest.fingerprint(d2)._2)
  }

  test("repr is injective under sentinel-bearing (adversarial) data") {
    val SEP = ""; val NUL = ""; val ESC = ""
    def fp(rows: Seq[(String, String)]): Long =
      Manifest.fingerprint(rows.toDF("u", "v"))._2
    // a separator INSIDE a value must not alias a column boundary:
    // ("ab", "c") vs ("a", "bc") — pre-escaping these
    // collided whenever the unescaped reprs matched
    assert(fp(Seq((s"a${SEP}b", "c"))) != fp(Seq(("a", s"b${SEP}c"))))
    // boundary shift without sentinels (regression for the classic case)
    assert(fp(Seq(("ab", "c"))) != fp(Seq(("a", "bc"))))
    // a literal "" value is NOT the same as NULL
    assert(fp(Seq((NUL, "x"))) != fp(Seq((null.asInstanceOf[String], "x"))))
    // the escape char itself round-trips unambiguously: a value that
    // already LOOKS escaped ("") differs from a real
    // separator-bearing value and from a bare escape char
    assert(fp(Seq((s"$ESC$SEP", "x"))) != fp(Seq((SEP, "x"))))
    assert(fp(Seq((s"$ESC$SEP", "x"))) != fp(Seq((ESC, "x"))))
    // value ending in the escape char vs next value starting with one
    assert(fp(Seq((s"a$ESC", "b"))) != fp(Seq(("a", s"${ESC}b"))))
    // and diff must see sentinel-bearing rows as different content
    val d = Manifest.diffSummary(
      Seq((s"a${SEP}b", "c")).toDF("u", "v"),
      Seq(("a", s"b${SEP}c")).toDF("u", "v")).head
    assert(d.getAs[Long]("rows_only_a") == 1L && d.getAs[Long]("rows_only_b") == 1L)
  }

  test("write/verify round-trips on the testdata tree; drift is detected and named") {
    val sfDir = SparkTestSession.sfDir
    val base = Files.createTempDirectory("graft-manifest")
    val manPath = base.resolve("manifest").toString
    Manifest.write(spark, sfDir, manPath)
    assert(Manifest.verify(spark, sfDir, manPath).isEmpty,
      "an unchanged tree must verify clean")

    // a drifted copy: same tree with one documents row's text changed
    val drifted = base.resolve("drifted").toString
    Tables.names.foreach { t =>
      val df = Tables.load(spark, sfDir, t)
      val out =
        if (t == "documents")
          df.withColumn("text",
            when(col("doc_id") === 0L, lit("tampered")).otherwise(col("text")))
        else df
      out.write.parquet(s"$drifted/$t.parquet")
    }
    val diffs = Manifest.verify(spark, drifted, manPath)
    assert(diffs.length == 1 && diffs.head.startsWith("documents:"),
      s"exactly the tampered table must be flagged, got $diffs")

    // a truncated copy: one dropped row flips the count and fingerprint
    val truncated = base.resolve("truncated").toString
    Tables.names.foreach { t =>
      val df = Tables.load(spark, sfDir, t)
      val out = if (t == "events") df.limit((df.count() - 1).toInt) else df
      out.write.parquet(s"$truncated/$t.parquet")
    }
    val tdiffs = Manifest.verify(spark, truncated, manPath)
    assert(tdiffs.length == 1 && tdiffs.head.startsWith("events:"), s"got $tdiffs")
  }

  test("diffSummary: multiset row accounting, identical frames, schema refusal") {
    import spark.implicits._
    val cols = Seq("rows_a", "rows_b", "rows_only_a", "rows_only_b", "rows_common")
    def summary(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val r = Manifest.diffSummary(a, b).collect().head
      cols.map(c => c -> r.getAs[Long](c)).toMap
    }
    val a = Seq((1L, "x"), (2L, "y"), (2L, "y"), (3L, "z")).toDF("id", "v")
    // b: one copy of the duplicate dropped, one row changed, one added
    val b = Seq((1L, "x"), (2L, "y"), (3L, "z2"), (4L, "w")).toDF("id", "v")
    assert(summary(a, b) == Map(
      "rows_a" -> 4L, "rows_b" -> 4L,
      // only-A: the extra (2,y) copy + the old (3,z); only-B: (3,z2) + (4,w)
      "rows_only_a" -> 2L, "rows_only_b" -> 2L, "rows_common" -> 2L))
    // identical frames (order scrambled): zero diff
    assert(summary(a, a.orderBy(org.apache.spark.sql.functions.rand(7))) == Map(
      "rows_a" -> 4L, "rows_b" -> 4L,
      "rows_only_a" -> 0L, "rows_only_b" -> 0L, "rows_common" -> 4L))
    // schema mismatch fails loudly
    val e = intercept[IllegalArgumentException] {
      Manifest.diff(a, Seq((1, "x")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("identical schemas"))
    // two EMPTY releases: exact zeros, not an all-NULL row
    val none = a.limit(0)
    assert(summary(none, none) == cols.map(_ -> 0L).toMap)
  }
}
