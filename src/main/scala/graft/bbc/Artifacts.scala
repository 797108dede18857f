package graft.bbc

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat, concat_ws, lit}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** S9: the reference's per-iteration artifact files (`.clusters`,
  * `.classes`, `.losses`, `.txt` — `sources/2.2/source/KMeansReducer.java:
  * 27-128`), written once at end of run instead of append-hacked per
  * iteration. Model-state artifacts (k centroids, k×iters losses) are
  * bounded driver writes by construction; the per-ROW `.classes` files
  * scale with the corpus and stream through [[writeClassesDf]] /
  * [[writeClasses2DDf]] — ordered partitions iterated one at a time (the
  * MtxCodec sink pattern), never a corpus-sized `collect()`.
  */
object Artifacts {

  private def write(path: String, lines: Iterable[String]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, lines.toSeq.asJava, StandardCharsets.UTF_8)
  }

  /** Row count above which [[streamLines]] abandons the single local
    * file and writes DISTRIBUTED sorted text shards instead (round 19):
    * the driver stream is bounded-memory but single-threaded and
    * single-disk — at corpus scale the one file it produces is itself
    * the anti-pattern (one reader task downstream, one slow serial
    * write here). 2M lines ≈ 50-100 MB of text: past that, real
    * pipelines want part files.
    */
  private[bbc] val DriverStreamMaxRows = 2000000L

  /** Stream a 1-column `line` frame to a local text file, ordered: the
    * sort runs distributed and `toLocalIterator` pulls ONE partition at a
    * time through the driver — bounded memory regardless of row count.
    *
    * Past `maxDriverRows` the single-file contract yields to scale: the
    * frame is written as globally-ordered text SHARDS at `<path>.d/`
    * (orderBy's range partitioning keeps part-file name order == line
    * order — concatenating the parts reproduces the single file byte for
    * byte), which is exactly the multi-`part-r-*` layout the reference's
    * own reducers emitted for corpus-sized outputs. The driver never
    * touches a row on that path.
    */
  private def streamLines(lines: DataFrame, path: String,
                          maxDriverRows: Long = DriverStreamMaxRows): Unit = {
    // bounded probe, not a full count: limit(max+1) stops scanning at
    // the threshold instead of executing the whole upstream plan a
    // second time (round-19 review)
    val probeCap = math.min(maxDriverRows, Int.MaxValue.toLong - 1).toInt
    val overThreshold = lines.limit(probeCap + 1).count() > maxDriverRows
    // a re-run that crosses the threshold in either direction must not
    // leave the OTHER layout's stale output behind — a reader checking
    // the single-file path first would silently get last run's data
    val single = Paths.get(path)
    val sharded = Paths.get(path + ".d")
    if (overThreshold) {
      Files.deleteIfExists(single)
      lines.orderBy("line").write.mode("overwrite").text(path + ".d")
      return
    }
    if (Files.exists(sharded)) {
      Files.walk(sharded).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    if (single.getParent != null) Files.createDirectories(single.getParent)
    val w = Files.newBufferedWriter(single, StandardCharsets.UTF_8)
    try lines.orderBy("line").toLocalIterator().asScala
      .foreach { r => w.write(r.getString(0)); w.write("\n") }
    finally w.close()
  }

  /** `.classes` (2.2 format) from a distributed (id, cluster) frame:
    * `<docId> <cluster>` per row, streamed — a corpus-sized assignment
    * table would OOM the collect-based [[writeClasses]]. Past
    * `maxDriverRows` rows the output is the sharded `<path>.d/` layout
    * (see [[streamLines]]).
    */
  def writeClassesDf(assignments: DataFrame, idCol: String,
                     clusterCol: String, path: String,
                     maxDriverRows: Long = DriverStreamMaxRows): Unit =
    streamLines(assignments
      .select(concat_ws(" ", col(idCol), col(clusterCol)).as("line")), path,
      maxDriverRows)

  /** `.classes` (2.1 format) from a distributed (cluster, x, y) frame:
    * `<cluster>,<x>,<y>` per row, streamed.
    */
  def writeClasses2DDf(assignments: DataFrame, path: String): Unit = {
    val Seq(c, x, y) = assignments.columns.toSeq.take(3).map(col)
    streamLines(assignments.select(concat_ws(",", c, x, y).as("line")), path)
  }

  /** One reference-style per-iteration snapshot dir (2.1's
    * `iterations/iter_N/`): `part-r-00000` with `cluster,\tx,y` lines
    * (the reference reducer's literal tab after the first comma —
    * `sources/2.1/output/iterations/iter_0/part-r-00000`) plus the empty
    * `_SUCCESS` marker Hadoop leaves.
    */
  def writeIterAssignments2D(assignments: DataFrame, dir: String): Unit = {
    val Seq(c, x, y) = assignments.columns.toSeq.take(3).map(col)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    streamLines(
      assignments.select(
        concat(c, lit(",\t"), x, lit(","), y).as("line")),
      s"$dir/part-r-00000")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_SUCCESS"),
      Array.empty[Byte])
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
