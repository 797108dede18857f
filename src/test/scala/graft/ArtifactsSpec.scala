package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bbc.Artifacts

/** The artifact writers' scale split (round 19): under the threshold, a
  * single locally-streamed file; past it, globally-ordered distributed
  * text shards whose concatenation reproduces the single file — and the
  * driver stream is never used on that path.
  */
class ArtifactsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("writeClassesDf: past the row threshold, sharded output replaces the driver stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-artifacts")
    val rows = (0 until 500).map(i => (f"doc_$i%04d", i % 7)).toDF("id", "cluster")

    // small-input contract: one local file, ordered lines
    val small = s"$dir/small.classes"
    Artifacts.writeClassesDf(rows, "id", "cluster", small)
    val smallLines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(small)).toArray.map(_.toString).toSeq
    assert(smallLines.size == 500 && smallLines == smallLines.sorted)

    // large-input contract: NO single file (the driver stream never ran),
    // a .d/ directory of ordered part files whose concatenation in
    // filename order equals the small path's output byte for byte
    val large = s"$dir/large.classes"
    Artifacts.writeClassesDf(rows, "id", "cluster", large, maxDriverRows = 100L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(large)),
      "the driver-streamed single file must not exist on the sharded path")
    val shardDir = java.nio.file.Paths.get(s"$large.d")
    assert(java.nio.file.Files.exists(shardDir))
    val parts = java.nio.file.Files.list(shardDir).toArray.map(_.toString)
      .filter(p => p.contains("part-") && !p.endsWith(".crc")).sorted.toSeq
    assert(parts.nonEmpty)
    val concatenated = parts.flatMap(p =>
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p))
        .toArray.map(_.toString).toSeq)
    assert(concatenated == smallLines,
      "part files concatenated in name order must reproduce the single file")
  }

  test("crossing the threshold in either direction removes the other layout's stale output") {
    val dir = java.nio.file.Files.createTempDirectory("graft-artifacts-cross")
    val rows = (0 until 300).map(i => (f"doc_$i%04d", i % 5)).toDF("id", "cluster")
    val path = s"$dir/cross.classes"
    // small first: single file
    Artifacts.writeClassesDf(rows, "id", "cluster", path)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    // grow past the threshold: the stale single file must vanish
    Artifacts.writeClassesDf(rows, "id", "cluster", path, maxDriverRows = 50L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "stale single file must be deleted when the sharded layout takes over")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path.d")))
    // shrink back under it: the stale shard dir must vanish
    Artifacts.writeClassesDf(rows, "id", "cluster", path)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path.d")),
      "stale shard dir must be deleted when the single file takes over")
  }
}
