package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the model-based quality filter: the flags the declared
  * query hashes must actually hold, on the shared fixture and on a
  * crafted separable corpus.
  */
class QualityLrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("testdata: both splits present, flags green, counts consistent") {
    val rows = SparkEntry.queries("ml_quality_lr")(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4))).toList
    assert(rows.map(_._1).toSet == Set("train", "test"))
    rows.foreach { case (sp, n, pos, accOk, aucOk) =>
      assert(n > 0 && pos > 0 && pos < n, s"degenerate label balance in $sp")
      assert(accOk == 1, s"accuracy flag red in $sp")
      assert(aucOk == 1, s"AUC flag red in $sp")
    }
  }

  test("a corpus whose every doc hashes to 'test' yields the empty grouped result") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // generate candidates, keep only those the rolling-hash split sends
    // to 'test' (mod-10 bucket >= 8) — no model can be fit, and the
    // oracle's no-train-split guard returns zero rows too
    val candidates = (0 until 400).map(i => s"candidate text number $i tail${i % 17}")
      .toDF("text")
    val testOnly = candidates
      .withColumn("bucket",
        pmod(graft.functions.TextExprs.rollingHash(col("text")), lit(10L)))
      .filter(col("bucket") >= 8)
      .drop("bucket")
      .collect().map(_.getString(0))
    assert(testOnly.nonEmpty, "fixture needs at least one all-test doc")
    val dir = java.nio.file.Files.createTempDirectory("graft-qlr-test").toString
    testOnly.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("ml_quality_lr")(spark, dir)
    assert(got.collect().isEmpty,
      "no train split -> no model -> no rows (matching the oracle's guard)")
  }

  test("crafted separable corpus: held-out accuracy flag stays green") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-qlr").toString
    // 200 docs, half contain the positive marker; filler varies so the
    // hash split scatters both classes across train/test
    val docs = (0 until 200).map { i =>
      val marker = if (i % 2 == 0) "spark shines" else "plain prose"
      (i.toLong, s"$marker filler${i % 7} tail${i % 13}", "en", "src0", 20L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("ml_quality_lr")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3), r.getInt(4)))
    assert(rows.length == 2)
    rows.foreach { case (sp, n, accOk, aucOk) =>
      assert(n > 0, s"empty split $sp")
      assert(accOk == 1 && aucOk == 1, s"flags red on separable corpus in $sp")
    }
  }
}
