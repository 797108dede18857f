package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cluster.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")

  test("fit is deterministic; components are orthonormal and sign-normalized") {
    val m1 = Pca.fit(emb, "embedding", k = 5)
    val m2 = Pca.fit(emb, "embedding", k = 5)
    assert(m1.mean.toSeq == m2.mean.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
    assert(m1.varianceRatio.toSeq == m2.varianceRatio.toSeq)

    for (i <- m1.components.indices; j <- m1.components.indices) {
      val d = m1.components(i).zip(m1.components(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"component dot ($i,$j) = $d")
    }
    m1.components.foreach { c =>
      val mx = c.indices.maxBy(i => math.abs(c(i)))
      assert(c(mx) > 0, "largest-magnitude coordinate must be positive")
    }
  }

  test("codegen projection equals the in-memory centered dot products") {
    val m = Pca.fit(emb, "embedding", k = 3)
    val raw = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val got = Pca.project(emb, "embedding", m)
      .select(col("vec_id"), col("projection"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(got.keySet == raw.keySet)
    got.foreach { case (id, ys) =>
      val x = raw(id)
      val expect = m.components.map(c =>
        c.indices.map(i => c(i) * (x(i) - m.mean(i))).sum)
      ys.zip(expect).foreach { case (y, e) =>
        // the kernel dots the raw float vector then subtracts the folded
        // mean shift; float-vs-double element reads bound the difference
        assert(math.abs(y - e) < 1e-4, s"vec $id: $y vs $e")
      }
    }
  }

  test("Pythagoras: residual is non-negative at k < dim and ~zero at k = dim") {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val m5 = Pca.fit(emb, "embedding", k = 5)
    val resid5 = Pca.project(emb, "embedding", m5)
      .select((Pca.centeredSqNorm("embedding", m5) -
        graft.functions.VectorExprs.dot(col("projection"), col("projection"))).as("r"))
      .agg(min("r")).head().getDouble(0)
    assert(resid5 >= -1e-6, s"projection energy exceeded the centered norm: $resid5")

    val mFull = Pca.fit(emb, "embedding", k = dim)
    val worstFull = Pca.project(emb, "embedding", mFull)
      .select(abs(Pca.centeredSqNorm("embedding", mFull) -
        graft.functions.VectorExprs.dot(col("projection"), col("projection"))).as("r"))
      .agg(max("r")).head().getDouble(0)
    assert(worstFull < 1e-4, s"full-rank projection must preserve the norm: $worstFull")
  }

  test("whitening: unit sample variance and zero mean per coordinate; scales recover λ") {
    val m = Pca.fit(emb, "embedding", k = 4)
    val w = Pca.whiten(emb, "embedding", m)
    val aggs = (0 until m.k).flatMap(j => Seq(
      var_samp(col("whitened")(j)).as(s"v$j"), avg(col("whitened")(j)).as(s"m$j")))
    val row = w.agg(aggs.head, aggs.tail: _*).head()
    (0 until m.k).foreach { j =>
      assert(math.abs(row.getDouble(2 * j) - 1.0) < 1e-6,
        s"coordinate $j variance ${row.getDouble(2 * j)}")
      assert(math.abs(row.getDouble(2 * j + 1)) < 1e-6,
        s"coordinate $j mean ${row.getDouble(2 * j + 1)}")
    }
    // whiten == project scaled by 1/sqrt(λ): the two maps must agree
    val p = Pca.project(emb, "embedding", m)
      .select(col("vec_id"), col("projection")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    Pca.whiten(emb, "embedding", m).select(col("vec_id"), col("whitened"))
      .collect().foreach { r =>
        val ys = p(r.getLong(0)); val ws = r.getSeq[Double](1)
        (0 until m.k).foreach { j =>
          assert(math.abs(ws(j) - ys(j) / math.sqrt(m.variance(j))) < 1e-9)
        }
      }
  }

  test("empirical variance of the projected corpus matches the eigen-derived ratios") {
    val m = Pca.fit(emb, "embedding", k = 5)
    val proj = Pca.project(emb, "embedding", m)
    val aggs = (0 until m.k).map(j =>
      sum(col("projection")(j) * col("projection")(j)).as(s"s$j"))
    val tot = sum(Pca.centeredSqNorm("embedding", m)).as("tot")
    val row = proj.agg(aggs.head, (aggs.tail :+ tot): _*).head()
    val total = row.getDouble(m.k)
    (0 until m.k).foreach { j =>
      val ratio = row.getDouble(j) / total
      assert(math.abs(ratio - m.varianceRatio(j)) < 1e-6,
        s"component $j: empirical $ratio vs model ${m.varianceRatio(j)}")
      if (j > 0) assert(m.varianceRatio(j - 1) >= m.varianceRatio(j) - 1e-12)
    }
  }
}
