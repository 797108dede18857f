package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.bbc.BbcTasks
import graft.io.{Dict, MtxCodec}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

/** Golden-file e2e parity against the reference's committed outputs
  * (SURVEY §5: tasks 1.1–1.4 are exactly replayable; 1.5 is content-
  * deterministic up to tie order).
  */
class BbcGoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // Fixtures are UTF-8 (bbc.terms contains £); the container default
  // charset is ASCII, so every Source.fromFile must say so explicitly.
  implicit val utf8: scala.io.Codec = scala.io.Codec.UTF8

  private val ref = "/root/reference/sources"

  /** Extract bbc-fulltext.zip once into target/. */
  lazy val corpusDir: String = {
    val dest = Paths.get("target/bbc-corpus")
    if (!Files.exists(dest.resolve("bbc"))) {
      Files.createDirectories(dest)
      val zin = new ZipInputStream(Files.newInputStream(
        Paths.get(s"$ref/1.1/input/bbc-fulltext.zip")))
      var e = zin.getNextEntry
      while (e != null) {
        val out = dest.resolve(e.getName).normalize()
        assert(out.startsWith(dest.normalize()))
        if (e.isDirectory) Files.createDirectories(out)
        else { Files.createDirectories(out.getParent); Files.copy(zin, out) }
        e = zin.getNextEntry
      }
      zin.close()
    }
    dest.resolve("bbc").toString
  }

  lazy val countMatrix = BbcTasks.countMatrix(spark, corpusDir,
    s"$ref/1.1/input/bbc.terms", s"$ref/1.1/input/bbc.docs",
    s"$ref/1.1/input/stopwords.txt").cache()

  lazy val filtered = BbcTasks.corpusFreqFilter(countMatrix).cache()

  private def goldenTriples(path: String, skipHeader: Int): Set[(Int, Int, String)] =
    scala.io.Source.fromFile(path).getLines().drop(skipHeader).map { l =>
      val p = l.trim.split("\\s+")
      (p(0).toInt, p(1).toInt, p(2))
    }.toSet

  test("task 1.1: count matrix matches the 142,278-cell golden exactly") {
    val got = countMatrix.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2).toString)).toSet
    val want = goldenTriples(s"$ref/1.1/output/OutputTask1_1.mtx", 2)
    assert(got.size == 142278)
    assert(got == want)
  }

  /** The 1.2 golden is contaminated by the reference's per-mapper header
    * skip (`row < 2`, `sources/1.2/source/task1_2.java:34-42`): the dims
    * line `9635 2225 142278` of a non-first split was parsed as a data
    * triple, whose phantom 142,278 "frequency" then rescued term 9635
    * (true corpus freq 2) past the >= 3 threshold. Golden = correct result
    * + exactly those 3 bogus rows. We fix the bug (SURVEY §7.2) and assert
    * both the correct result and the precise delta to the golden.
    */
  test("task 1.2: matches golden modulo the reference's 3 header-skip phantom rows") {
    val got = filtered.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2).toString)).toSet
    val golden = goldenTriples(s"$ref/1.2/output/Output_Task1_2.mtx", 2)
    val phantoms = Set((9635, 2186, "1"), (9635, 2218, "1"), (9635, 2225, "142278"))
    assert((golden diff got) == phantoms)
    assert((got diff golden).isEmpty)
    // and the correct semantics recomputed from the exact-match 1.1 matrix:
    val m11 = goldenTriples(s"$ref/1.1/output/OutputTask1_1.mtx", 2)
      .map { case (t, d, v) => (t, d, v.toInt) }
    // m11 is a Set — map to a Seq of freqs before summing, else equal
    // frequencies of one term collapse and the total undercounts
    val totals = m11.groupBy(_._1).view.mapValues(_.toSeq.map(_._3).sum)
    val expect = m11.filter { case (t, _, _) => totals(t) >= 3 }
      .map { case (t, d, v) => (t, d, v.toString) }
    assert(got == expect)
  }

  // The 1.3/1.4/1.5 committed goldens are NOT derivable from their
  // committed inputs (different uncommitted runs: 1.3's golden totals
  // exceed its input's, 1.4's golden has cells absent from its input,
  // 1.5's input is a 185,980-row transposed superset). We therefore
  // validate those operators against independent in-memory recomputations
  // of the declared semantics over the committed inputs.

  test("task 1.3: top-10 equals an independent in-memory recomputation") {
    val got = BbcTasks.topTerms(filtered, 10).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val triples = filtered.collect().map(r => (r.getInt(0), r.getInt(2).toLong))
    val expect = triples.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (t, s) => (-s, t) }.take(10)
    assert(got == expect)
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("task 1.4: TF-IDF equals an independent in-memory recomputation at 6 decimals") {
    val got = BbcTasks.tfidf(filtered, 2225L)
      .select(col("term_id"), col("doc_id"), format_string("%.6f", col("value")).as("v"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getString(2))).toMap
    val triples = filtered.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    val docTot = triples.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val df = triples.groupBy(_._1).view.mapValues(_.size)
    val expect = triples.map { case (t, d, v) =>
      val tf = BigDecimal(v.toDouble / docTot(d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      ((t, d), f"${tf * math.log(2225.0 / df(t))}%.6f")
    }.toMap
    assert(got.size == expect.size)
    val bad = expect.collect { case (k, v) if got(k) != v => (k, got(k), v) }.take(5)
    assert(bad.isEmpty, s"sample mismatches: $bad")
  }

  test("task 1.5: report equals an independent recomputation; format matches golden shape") {
    val docs = Dict.load(spark, s"$ref/1.1/input/bbc.docs", "doc_id", "doc_name")
    val terms = Dict.load(spark, s"$ref/1.1/input/bbc.terms", "term_id", "token")
    // committed 1.5 input is (doc_id term_id value) — swap on read
    val tf = MtxCodec.readHeaderless(spark, s"$ref/1.5/input/task_1_4.mtx")
      .select(col("doc_id").as("term_id"), col("term_id").as("doc_id"), col("value"))
    val got = BbcTasks.categoryReport(BbcTasks.categoryAvgTfidf(tf, docs), terms, 5)

    // independent recomputation with plain collections
    val docNames = scala.io.Source.fromFile(s"$ref/1.1/input/bbc.docs").getLines().map(_.trim).toArray
    val termNames = scala.io.Source.fromFile(s"$ref/1.1/input/bbc.terms").getLines().map(_.trim).toArray
    val rows = scala.io.Source.fromFile(s"$ref/1.5/input/task_1_4.mtx").getLines().map { l =>
      val p = l.trim.split("\\s+"); (p(0).toInt, p(1).toInt, p(2).toDouble)
    }.toSeq
    val byCat = rows.groupBy { case (d, _, _) => docNames(d - 1).dropRight(4) }
    val fmt = new java.text.DecimalFormat("#.##")
    val expect = byCat.toSeq.sortBy(_._1).map { case (cat, rs) =>
      val nDocs = rs.map { case (d, _, _) => docNames(d - 1).takeRight(4) }.distinct.size
      val top = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum / nDocs).toSeq
        .sortBy { case (t, v) => (-v, t) }.take(5)
      cat.capitalize + ": " + top.map { case (t, v) => s"${termNames(t - 1)}:${fmt.format(v)}" }.mkString(", ")
    }
    assert(got == expect)
    // format parity with the golden's observable shape
    val shape = "^[A-Z][a-z]+: (\\S+:\\d+(\\.\\d+)?)(, \\S+:\\d+(\\.\\d+)?){4}$".r
    got.foreach(l => assert(shape.matches(l), s"bad shape: $l"))
  }

  test("task 1.1 sink: legacy-sort mtx write reproduces the golden file byte-for-byte") {
    val tmp = Files.createTempDirectory("mtx11").resolve("OutputTask1_1.mtx").toString
    MtxCodec.write(countMatrix.withColumnRenamed("freq", "value"),
      MtxCodec.MtxDims(9635, 2225, 142278), tmp,
      integerValues = true, legacySort = true)
    val got = Files.readAllBytes(Paths.get(tmp))
    val want = Files.readAllBytes(Paths.get(s"$ref/1.1/output/OutputTask1_1.mtx"))
    assert(got.length == want.length, s"size ${got.length} != golden ${want.length}")
    assert(java.util.Arrays.equals(got, want))
  }

  test("mtx round-trip: write then read is identity (numeric + legacy sort)") {
    val tmp = Files.createTempDirectory("mtx").resolve("m.mtx").toString
    val dims = MtxCodec.MtxDims(9635, 2225, countMatrix.count())
    MtxCodec.write(countMatrix.withColumnRenamed("freq", "value"), dims, tmp,
      integerValues = true, legacySort = true)
    val (back, readDims) = MtxCodec.read(spark, tmp)
    assert(readDims == dims)
    assert(back.count() == dims.nnz)
    val lines = scala.io.Source.fromFile(tmp).getLines().toSeq
    assert(lines.head == "%%MatrixMarket matrix coordinate real general")
    // legacy sort = lexicographic on the rendered line (reference S5 quirk)
    assert(lines.drop(2) == lines.drop(2).sorted)
  }
}
