package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.bbc.{Artifacts, BbcTasks, Points}
import graft.io.MtxCodec
import java.nio.file.Files

/** Reference tasks 2.1–2.3 end to end on the committed fixtures. The 2.x
  * goldens are unseeded (SURVEY §5), so assertions are convergence /
  * structure / tolerance, not bytes — except 2.1's centroids, which any
  * reasonable init recovers on its three well-separated clusters.
  */
class Bbc2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  implicit val utf8: scala.io.Codec = scala.io.Codec.UTF8

  private val ref = "/root/reference/sources"

  test("task 2.1: CSV source drops header, 500 points; MLlib kmeans recovers golden centroids") {
    val pts = Points.readPoints(spark, s"$ref/2.1/input/2DPoints.csv").cache()
    assert(pts.count() == 500)
    val feats = pts.select(
      org.apache.spark.ml.functions.array_to_vector(array(col("x"), col("y"))).as("features"))
    // deterministic multi-restart (standard k-means practice): fixed seed
    // list, keep the lowest-cost model — matches the unseeded reference's
    // converged global optimum without depending on one lucky seed
    val model = (1L to 5L).map { s =>
      graft.cluster.Clustering.fitKMeans(feats, k = 3, maxIter = 20,
        tol = 1e-5, seed = s)
    }.minBy(_.summary.trainingCost)
    val got = model.clusterCenters.map(c => (c(0), c(1))).sortBy(_._1)
    // golden lines are `clusterId,x,y`
    val golden = scala.io.Source.fromFile(s"$ref/2.1/output/task_2_1.clusters")
      .getLines().map { l => val p = l.split(","); (p(1).toDouble, p(2).toDouble) }
      .toArray.sortBy(_._1)
    assert(got.length == 3)
    got.zip(golden).foreach { case ((gx, gy), (wx, wy)) =>
      assert(math.abs(gx - wx) < 0.05 && math.abs(gy - wy) < 0.05,
        s"centroid ($gx,$gy) != golden ($wx,$wy)")
    }
  }

  test("task 2.1: explicit Lloyd loop converges within 20 iterations, assigns all points") {
    val pts = Points.readPoints(spark, s"$ref/2.1/input/2DPoints.csv")
    val res = Points.kmeans2D(spark, pts)
    assert(res.iterations <= 20)
    assert(res.centers.length == 3)
    val classes = Points.classesRows(pts, res).collect()
    assert(classes.length == 500)
    assert(classes.map(_.getInt(0)).toSet.subsetOf(Set(0, 1, 2)))

    // artifact sinks round-trip in the golden 2.1 formats
    val dir = Files.createTempDirectory("task21")
    Artifacts.writeClusters2D(res.centers, s"$dir/task_2_1.clusters")
    Artifacts.writeClasses2D(
      classes.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq,
      s"$dir/task_2_1.classes")
    val clusterLines = scala.io.Source.fromFile(s"$dir/task_2_1.clusters").getLines().toSeq
    assert(clusterLines.size == 3)
    assert(clusterLines.forall(_.matches("""-?\d+(\.\d+(E-?\d+)?)?,-?\d+(\.\d+(E-?\d+)?)?""")))
    assert(scala.io.Source.fromFile(s"$dir/task_2_1.classes").getLines().size == 500)
  }

  /** TF-IDF triples from the committed 1.5 input (doc_id term_id value —
    * transposed relative to 1.4's output; same source BbcGoldenSpec uses).
    */
  lazy val tfidfTriples = MtxCodec.readHeaderless(spark, s"$ref/1.5/input/task_1_4.mtx")
    .select(col("doc_id").as("term_id"), col("term_id").as("doc_id"), col("value"))

  lazy val docVecs = BbcTasks.docVectors(tfidfTriples, vocabSize = 9635).cache()

  test("task 2.2: explicit cosine Lloyd — 2,225 docs assigned, k=5, loss non-increasing") {
    val res = BbcTasks.docKMeansExplicit(spark, docVecs, k = 5, iters = 10)
    assert(res.iterations == 10)
    assert(res.assignments.count() == 2225)
    assert(res.centers.length == 5)
    val perIter = res.losses.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1).map(_._2)
    assert(perIter.size == 10)
    perIter.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"cosine WCSS increased: $a -> $b")
    }

    // top-10 components per centroid: 50 rows, no tie collapse
    val top = graft.cluster.Clustering.topComponents(res.centers, 10)
    assert(top.size == 50)
    assert(top.groupBy(_._1).forall(_._2.size == 10))

    // artifact sinks in the golden 2.2 formats
    val dir = Files.createTempDirectory("task22")
    Artifacts.writeClusters(res.centers, s"$dir/task_2_2.clusters")
    Artifacts.writeLosses(res.losses, s"$dir/task_2_2.losses")
    Artifacts.writeTopTerms(Seq((9, top)), 10, s"$dir/task_2_2.txt")
    Artifacts.writeClasses(
      res.assignments.select("doc_id", "cluster").collect()
        .map(r => (r.get(0).toString, r.getInt(1))).toSeq,
      s"$dir/task_2_2.classes")
    val losses = scala.io.Source.fromFile(s"$dir/task_2_2.losses").getLines().toSeq
    assert(losses.head == "Iteration 1: ")
    assert(scala.io.Source.fromFile(s"$dir/task_2_2.classes").getLines().size == 2225)
    val txt = scala.io.Source.fromFile(s"$dir/task_2_2.txt").getLines().toSeq
    assert(txt.head == "Iteration 10: ")
    assert(txt(1).matches("""(-?\d[^=]*=\d+, ){10}"""), s"bad txt line: ${txt(1)}")
  }

  test("task 2.3: k-means|| init — 5 centers, all docs assigned") {
    val model = BbcTasks.docKMeansScalable(docVecs, k = 5, iters = 10)
    assert(model.clusterCenters.length == 5)
    val assigned = model.transform(docVecs)
    assert(assigned.count() == 2225)
    assert(assigned.select("prediction").distinct().count() <= 5)
  }

  test("BbcRun: the one-command workload produces every reference artifact") {
    // reuse BbcGoldenSpec's corpus extraction
    val corpus = new BbcGoldenSpec().corpusDir
    val out = Files.createTempDirectory("bbcrun").toString
    graft.bbc.BbcRun.run(spark, graft.bbc.BbcRun.Paths(
      corpus, s"$ref/1.1/input/bbc.terms", s"$ref/1.1/input/bbc.docs",
      s"$ref/1.1/input/stopwords.txt", s"$ref/2.1/input/2DPoints.csv", out))
    val expected = Seq("OutputTask1_1.mtx", "Output_Task1_2.mtx", "task_1_3.txt",
      "task_1_4.mtx", "task_1_5.txt", "task_2_1.clusters", "task_2_1.classes",
      "task_2_2.clusters", "task_2_2.classes", "task_2_2.losses", "task_2_2.txt",
      "task_2_3.clusters", "task_2_3.classes", "task_2_3.txt")
    expected.foreach { f =>
      val p = java.nio.file.Paths.get(s"$out/$f")
      assert(Files.exists(p) && Files.size(p) > 0, s"missing artifact $f")
    }
    // 1.1 artifact is the byte-exact golden
    assert(java.util.Arrays.equals(
      Files.readAllBytes(java.nio.file.Paths.get(s"$out/OutputTask1_1.mtx")),
      Files.readAllBytes(java.nio.file.Paths.get(s"$ref/1.1/output/OutputTask1_1.mtx"))))
  }

  test("M8: model state round-trips through save/load with identical centers") {
    val model = BbcTasks.docKMeansScalable(docVecs, k = 5, iters = 2)
    val dir = Files.createTempDirectory("kmeans_model").resolve("m").toString
    model.write.overwrite().save(dir)
    val back = org.apache.spark.ml.clustering.KMeansModel.load(dir)
    assert(back.clusterCenters.length == model.clusterCenters.length)
    model.clusterCenters.zip(back.clusterCenters).foreach { case (a, b) =>
      assert(a == b, "centers changed across save/load")
    }
  }
}
