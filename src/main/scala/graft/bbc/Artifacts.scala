package graft.bbc

import org.apache.spark.ml.linalg.Vector
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** S9: the reference's per-iteration artifact files (`.clusters`,
  * `.classes`, `.losses`, `.txt` — `sources/2.2/source/KMeansReducer.java:
  * 27-128`), written once at end of run instead of append-hacked per
  * iteration. All artifacts are small (k centroids, n assignments, k×iters
  * losses), so these are plain driver-side writes; the distributed outputs
  * they serialize (assignments) arrive as already-collected rows.
  */
object Artifacts {

  private def write(path: String, lines: Iterable[String]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, lines.toSeq.asJava, StandardCharsets.UTF_8)
  }

  /** `.clusters` (2.2 format): `<id>\t<v1> <v2> …` per centroid. */
  def writeClusters(centers: Array[Vector], path: String): Unit =
    write(path, centers.zipWithIndex.map { case (c, i) =>
      s"$i\t${c.toArray.mkString(" ")}"
    })

  /** `.clusters` (2.1 format): `x,y` per centroid. */
  def writeClusters2D(centers: Array[Vector], path: String): Unit =
    write(path, centers.map(c => s"${c(0)},${c(1)}"))

  /** `.classes` (2.2 format): `<docId> <cluster>` per row. */
  def writeClasses(assignments: Seq[(String, Int)], path: String): Unit =
    write(path, assignments.map { case (id, c) => s"$id $c" })

  /** `.classes` (2.1 format): `<cluster>,<x>,<y>` per row. */
  def writeClasses2D(assignments: Seq[(Int, Double, Double)], path: String): Unit =
    write(path, assignments.map { case (c, x, y) => s"$c,$x,$y" })

  /** `.losses`: per iteration a header line then one loss per cluster
    * (golden shape `sources/2.2/ouput/task_2_2.losses`).
    */
  def writeLosses(losses: Seq[(Int, Int, Double)], path: String): Unit = {
    val lines = losses.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (iter, rows) =>
        (s"Iteration ${iter + 1}: " +:
          rows.sortBy(_._2).map(_._3.toString)) :+ ""
    }
    write(path, lines)
  }

  /** `.txt`: per iteration, per centroid, the top-n components rendered
    * `value=index, value=index, …` (golden shape
    * `sources/2.2/ouput/task_2_2.txt`; ties kept distinct, SURVEY A12).
    */
  def writeTopTerms(perIter: Seq[(Int, Seq[(Int, Int, Double)])], n: Int,
                    path: String): Unit = {
    val lines = perIter.sortBy(_._1).flatMap { case (iter, comps) =>
      val byCluster = comps.groupBy(_._1).toSeq.sortBy(_._1)
      (s"Iteration ${iter + 1}: " +:
        byCluster.map { case (_, rows) =>
          rows.sortBy { case (_, idx, v) => (-v, idx) }.take(n)
            .map { case (_, idx, v) => s"$v=$idx" }.mkString("", ", ", ", ")
        }) :+ ""
    }
    write(path, lines)
  }
}
