package graft

import org.scalatest.funsuite.AnyFunSuite

/** BM25 semantics on a crafted corpus — the oracle proves engine parity on
  * the shared testdata; these pin the ranking intent: rarity weighting
  * (idf), tf saturation, and length normalization.
  */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    SparkEntry.queries("t8_bm25_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
  }

  test("rarity beats commonality: the doc holding the rarer query term wins") {
    // 'spark' appears in 1 of 4 docs, 'hash' in 3 of 4; equal lengths.
    val got = run(Seq(
      (1L, "spark alpha beta gamma"),
      (2L, "hash alpha beta gamma"),
      (3L, "hash delta beta gamma"),
      (4L, "hash alpha delta gamma")))
    assert(got.head._1 == 1L) // the spark doc ranks first
    assert(got.forall(_._3 == 1)) // each doc matched exactly one term
  }

  test("tf saturates: 10 repeats scores more than 1 but far under 10x") {
    val byDoc = run(Seq(
      (1L, ("spark " * 10).trim + " " + ("pad " * 10).trim),
      (2L, "spark " + ("pad " * 19).trim)))
      .map { case (id, s, _) => (id, s) }.toMap
    assert(byDoc(1L) > byDoc(2L))
    assert(byDoc(1L) < 5 * byDoc(2L)) // saturation: nowhere near 10x linear
  }

  test("length normalization: same tf, shorter doc scores higher") {
    val got = run(Seq(
      (1L, "spark " + ("pad " * 5).trim),
      (2L, "spark " + ("pad " * 50).trim)))
      .map { case (id, s, _) => (id, s) }.toMap
    assert(got(1L) > got(2L))
  }

  test("docs without any query term do not appear") {
    val got = run(Seq((1L, "spark a"), (2L, "nothing relevant here")))
    assert(got.map(_._1).toSet == Set(1L))
  }
}
