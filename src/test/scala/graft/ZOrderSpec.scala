package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.layout.ZOrder

/** Morton-code mechanics plus the layout payoff: after `zorderBy`, each
  * written file covers a compact rectangle of the two layout dimensions,
  * so min/max file stats can prune scans filtered on EITHER column.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("morton interleave: known bit patterns") {
    import spark.implicits._
    val df = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL), (0x1234L, 0x0F0FL))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton(col("x"), col("y")).as("z"))
    val got = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

    def interleaveRef(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)

    got.foreach { case ((x, y), z) => assert(z == interleaveRef(x, y), s"($x,$y)") }
    assert(got((0xFFFFL, 0xFFFFL)) == 0xFFFFFFFFL) // full 32-bit coverage
  }

  test("mortonN: stride-3/4 interleave matches the reference bit spread; stride-2 equals morton") {
    import spark.implicits._
    def refN(vs: Seq[Long]): Long = {
      val n = vs.length
      (for (j <- vs.indices; b <- 0 until 16)
        yield ((vs(j) >> b) & 1L) << (b * n + j)).reduce(_ | _)
    }
    val triples = Seq((0L, 0L, 0L), (1L, 1L, 1L), (0xFFFFL, 0L, 0L),
      (0L, 0xFFFFL, 0L), (0L, 0L, 0xFFFFL), (0x1234L, 0x0F0FL, 0x00FFL),
      (0xFFFFL, 0xFFFFL, 0xFFFFL))
    val got3 = triples.toDF("a", "b", "c")
      .select(ZOrder.mortonN(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect().map(_.getLong(0))
    triples.zip(got3).foreach { case ((a, b, c), z) =>
      assert(z == refN(Seq(a, b, c)), s"($a,$b,$c)")
    }
    // full 48-bit coverage at all-ones
    assert(got3.last == (1L << 48) - 1)
    // 4 dims fill the long exactly
    val got4 = Seq((0xFFFFL, 0xFFFFL, 0xFFFFL, 0xFFFFL)).toDF("a", "b", "c", "d")
      .select(ZOrder.mortonN(Seq(col("a"), col("b"), col("c"), col("d"))))
      .head.getLong(0)
    assert(got4 == -1L) // all 64 bits set
    // the 2-dim special case must equal the ladder implementation
    val pairs = Seq((0x1234L, 0x0F0FL), (0xFFFFL, 0L))
    val viaN = pairs.toDF("x", "y")
      .select(ZOrder.mortonN(Seq(col("x"), col("y"))).as("z"))
      .collect().map(_.getLong(0))
    val viaLadder = pairs.toDF("x", "y")
      .select(ZOrder.morton(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(viaN.toSeq == viaLadder.toSeq)
  }

  test("morton preserves locality: nearby points share code prefixes") {
    import spark.implicits._
    // quadrant = top 2 bits of the code: points in the same half-plane
    // pair (x<32768, y<32768) must land in the same quadrant
    val pts = Seq((100L, 200L), (31000L, 29000L), (40000L, 40000L), (65000L, 64000L))
      .toDF("x", "y")
      .select(ZOrder.morton(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert((pts(0) >> 30) == 0L && (pts(1) >> 30) == 0L) // both in (lo, lo)
    assert((pts(2) >> 30) == 3L && (pts(3) >> 30) == 3L) // both in (hi, hi)
  }

  test("zorderBy shrinks per-file bounding boxes vs the natural layout") {
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_partkey", "l_suppkey")
    val out = java.nio.file.Files.createTempDirectory("zorder").toString

    ZOrder.zorderBy(li, "l_partkey", "l_suppkey", numFiles = 8)
      .write.mode("overwrite").parquet(s"$out/z")
    li.repartition(8).write.mode("overwrite").parquet(s"$out/natural")

    // mean normalized bounding-box area per file: the fraction of the
    // (part, supp) key space a scan of that file might touch
    def meanBoxArea(path: String): Double = {
      val byFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_partkey").as("minp"), max("l_partkey").as("maxp"),
          min("l_suppkey").as("mins"), max("l_suppkey").as("maxs"))
        .collect()
      val (rp, rs) = (byFile.map(_.getAs[Long]("maxp")).max.toDouble,
        byFile.map(_.getAs[Long]("maxs")).max.toDouble)
      byFile.map { r =>
        ((r.getAs[Long]("maxp") - r.getAs[Long]("minp")) / rp) *
          ((r.getAs[Long]("maxs") - r.getAs[Long]("mins")) / rs)
      }.sum / byFile.length
    }

    val (zArea, nArea) = (meanBoxArea(s"$out/z"), meanBoxArea(s"$out/natural"))
    // natural layout: every file spans ~the whole plane (area ~1). The
    // z-ordered layout's 8 files tile the Morton curve, so each covers
    // a small rectangle. 0.5 is a loose bound; observed is far lower.
    assert(zArea < 0.5 * nArea, s"z=$zArea natural=$nArea")

    // data-skipping payoff: a box predicate on BOTH dims overlaps few
    // z-ordered file bounding boxes (file-level min/max pruning's view)
    val boxes = spark.read.parquet(s"$out/z")
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("minp"), max("l_partkey").as("maxp"),
        min("l_suppkey").as("mins"), max("l_suppkey").as("maxs"))
      .collect()
    val (pLo, pHi, sLo, sHi) = (1L, 50L, 1L, 3L) // small corner box
    val overlapping = boxes.count(r =>
      r.getAs[Long]("minp") <= pHi && r.getAs[Long]("maxp") >= pLo &&
        r.getAs[Long]("mins") <= sHi && r.getAs[Long]("maxs") >= sLo)
    assert(overlapping < boxes.length, s"box predicate overlaps all ${boxes.length} files")
  }

  test("the engine actually prunes: z-ordered scan emits fewer rows under a 2-D box predicate") {
    // end-to-end enforcement, not just layout geometry: parquet's pushed
    // min/max filters skip whole row groups on the clustered layout, so
    // the SCAN node emits far fewer rows than on the natural layout for
    // the identical (correct-result) query. The soak's zorder_skipping
    // shape records the same two numbers at amplified scale.
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_partkey", "l_suppkey")
    val out = java.nio.file.Files.createTempDirectory("zorder-prune").toString
    ZOrder.zorderBy(li, "l_partkey", "l_suppkey", numFiles = 8)
      .write.mode("overwrite").parquet(s"$out/z")
    li.repartition(8).write.mode("overwrite").parquet(s"$out/natural")
    val mx = li.agg(max("l_partkey"), max("l_suppkey")).head
    val (pCut, sCut) = (mx.getLong(0) / 8, mx.getLong(1) / 8)
    def emittedAndResult(dir: String): (Long, Long) = {
      val q = spark.read.parquet(dir)
        .filter(col("l_partkey") <= pCut && col("l_suppkey") <= sCut)
      val n = q.count() // the correct result, any layout
      q.queryExecution.toRdd.foreach(_ => ()) // drive THIS plan for its metrics
      val emitted = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
      (emitted, n)
    }
    val (zEmit, zN) = emittedAndResult(s"$out/z")
    val (nEmit, nN) = emittedAndResult(s"$out/natural")
    assert(zN == nN, "both layouts must return the identical result")
    assert(zEmit < nEmit,
      s"z-ordered scan must emit fewer rows (row-group pruning): z=$zEmit natural=$nEmit")
  }

  test("quantize16 survives full-range long columns (no native-int overflow)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // keys near both ends of the long range: a native-integer (c - min)
    // wrapped negative here and produced codes far outside [0, 65535],
    // silently destroying the layout's locality. The widened arithmetic
    // must keep every quantized value in range and monotone.
    val df = Seq(
      Long.MinValue + 1L, -3000000000000000000L, -1L, 0L, 1L,
      3000000000000000000L, Long.MaxValue - 1L)
      .toDF("k").withColumn("j", lit(0L))
    val z = graft.layout.ZOrder.withZCode(df, "k", "j", "z")
      .select("k", "z").collect().sortBy(_.getLong(0))
    val codes = z.map(_.getLong(1))
    assert(codes.forall(c => c >= 0L && c <= 0x55555555L),
      s"codes out of the 16-bit even-lane range: ${codes.mkString(",")}")
    assert(codes.toSeq == codes.sorted.toSeq,
      s"quantization must stay monotone over the key order: ${codes.mkString(",")}")
    assert(codes.head == 0L && codes.last == 0x55555555L,
      "the range endpoints must map to the quantization endpoints")
  }
}
