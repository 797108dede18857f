package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.functions.GraftTableFunctions
import graft.io.Tables
import graft.similarity.Similarity

/** SQL-only access to the scale pipelines (round 19): every registered
  * table-valued function must return EXACTLY what the Scala pipeline API
  * returns on the same inputs — the TVF builder composes the same
  * DataFrame chain, so any drift here is a registration/argument bug.
  * The two TVFs with DuckDB oracle rows (`sql_dedup_apply`,
  * `sql_quality_filter`) are additionally value-checked by the driver
  * gate; this spec covers the remaining three plus argument validation.
  */
class TableFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val d = SparkTestSession.sfDir

  private def registered(): Unit = GraftTableFunctions.register(spark)

  test("dedup_near_apply equals the Scala MinHash-LSH components apply") {
    registered()
    val docs = Tables.documents(spark, d)
    docs.createOrReplaceTempView("tvf_docs")
    val got = spark.sql(
      "SELECT doc_id FROM dedup_near_apply('tvf_docs', 'doc_id', 'text')")
      .collect().map(_.getLong(0)).toSet
    val cands = Dedup.minhashLshCandidates(docs, "doc_id", "text")
    val comps = Dedup.connectedComponents(
      docs.select("doc_id"), "doc_id", cands, "id_a", "id_b")
    val want = comps.filter(col("node") === col("component"))
      .select("node").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("decontaminate_apply equals the Scala anti-join apply") {
    registered()
    val docs = Tables.documents(spark, d)
    docs.createOrReplaceTempView("tvf_corpus")
    docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      .createOrReplaceTempView("tvf_bench")
    val got = spark.sql(
      "SELECT doc_id FROM decontaminate_apply('tvf_corpus', 'tvf_bench', 'doc_id', 'text')")
      .collect().map(_.getLong(0)).toSet
    val bench = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val want = docs.join(
        Dedup.decontaminate(docs, bench, "doc_id", "text").select("doc_id"),
        Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty && got.size < docs.count())
  }

  test("knn_topk equals the Scala buildIvfIndex + queryIvf on the same knobs") {
    registered()
    val emb = Tables.embeddings(spark, d)
    emb.createOrReplaceTempView("tvf_emb")
    emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      .createOrReplaceTempView("tvf_queries")
    val got = spark.sql(
      """SELECT query_id, neighbor_id, rank
        |FROM knn_topk('tvf_emb', 'tvf_queries', 'vec_id', 'embedding', 3, 4, 2)"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 4)
    val want = Similarity.queryIvf(idx,
        emb.filter(pmod(col("vec_id"), lit(50)) === 0),
        "vec_id", "embedding", k = 3, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("knn_topk_indexed serves the persisted index, no fit at analysis") {
    registered()
    val emb = Tables.embeddings(spark, d)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-tvf-ivf").toString
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 4)
    Similarity.writeIvfIndex(idx, idxDir)
    emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      .createOrReplaceTempView("tvf_queries_p")
    val got = spark.sql(
      s"""SELECT query_id, neighbor_id, rank
         |FROM knn_topk_indexed('$idxDir', 'tvf_queries_p', 'vec_id', 'embedding', 3, 2)"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.queryIvf(Similarity.readIvfIndex(spark, idxDir),
        emb.filter(pmod(col("vec_id"), lit(50)) === 0),
        "vec_id", "embedding", k = 3, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("TVF arguments must be literals with the declared arity") {
    registered()
    Tables.documents(spark, d).createOrReplaceTempView("tvf_docs_arity")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM dedup_exact_apply('tvf_docs_arity', 'doc_id')")
        .collect()
    }
    assert(e.getMessage.contains("dedup_exact_apply"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM knn_topk('tvf_docs_arity', 'x', 'id', 'v', 1, 2)")
        .collect()
    }
    assert(e2.getMessage.contains("knn_topk"))
  }
}
