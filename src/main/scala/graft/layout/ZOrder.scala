package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton space-filling-curve) layout for multi-dimensional
  * data skipping.
  *
  * A 100 TB fact table is usually range-clustered on ONE column; a
  * predicate on any other column then scans everything. Interleaving
  * the bits of two (quantized) columns into a Morton code and
  * range-partitioning + sorting the write on that code gives every
  * output file a small bounding box in BOTH dimensions, so parquet
  * min/max stats prune files for predicates on either column — the
  * layout trick behind Delta/Iceberg `ZORDER BY`, built here from
  * stock Spark primitives (`repartitionByRange` + `sortWithinPartitions`,
  * bit-twiddling in codegen'd built-ins — no UDF, no custom rule).
  *
  * Quantization maps each dimension onto [0, 65535] by min/max scaling;
  * the interleave is the classic mask-shift bit spread. All arithmetic
  * is integer + one double multiply/divide, reproducible bit-for-bit in
  * any engine (the DuckDB oracle for `tp_zorder` replays the identical
  * expression chain).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` onto the even bit positions of a
    * 32-bit word (mask-shift ladder, all codegen'd built-ins).
    */
  def spreadBits16(c: Column): Column = {
    val x0 = c.cast("long")
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two 16-bit quantized values: x on even bits, y on
    * odd bits — adjacent codes are adjacent in BOTH dimensions.
    */
  def morton(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Min/max-quantize `c` onto [0, 65535]. `minC`/`maxC` ride in as a
    * broadcast 1-row cross join (never an `OVER ()` global window).
    * Degenerate range (min == max) maps to 0.
    */
  def quantize16(c: Column, minC: Column, maxC: Column): Column =
    // widen to double BEFORE subtracting: a native-integer (c − minC)
    // wraps on long/int columns spanning more than the type's range
    // (e.g. keys near both Long.MinValue and Long.MaxValue), silently
    // aliasing distinct values into colliding Z-codes — and DuckDB
    // raises an overflow error on the same arithmetic, diverging from
    // the engine. 16-bit quantization tolerates double rounding above
    // 2^53 by construction.
    when(maxC === minC, lit(0L))
      .otherwise(floor((c.cast("double") - minC.cast("double")) * 65535.0
        / (maxC.cast("double") - minC.cast("double"))).cast("long"))

  /** `df` plus its Z-order key in column `zCol`: one min/max aggregate
    * rides in as a broadcast 1-row cross join, the quantize + interleave
    * is a pure map. Shared by [[zorderBy]] and the declared `tp_zorder`
    * query so the layout writer and its oracle-checked key can't drift.
    */
  def withZCode(df: DataFrame, xCol: String, yCol: String,
                zCol: String = "__z"): DataFrame = {
    val mm = df.agg(
      min(xCol).as("__minx"), max(xCol).as("__maxx"),
      min(yCol).as("__miny"), max(yCol).as("__maxy"))
    df.crossJoin(broadcast(mm))
      .withColumn(zCol, morton(
        quantize16(col(xCol), col("__minx"), col("__maxx")),
        quantize16(col(yCol), col("__miny"), col("__maxy"))))
      .drop("__minx", "__maxx", "__miny", "__maxy")
  }

  /** The 4-stage (shift, mask) ladder that spreads 16 bits at stride
    * `n`, computed by simulating the bit walk: bit b must travel
    * b·(n−1) positions, decomposed over shifts (n−1)·{8,4,2,1}; each
    * stage's mask keeps exactly the current bit positions (clearing the
    * unshifted duplicates the OR leaves behind). For n = 2 this
    * reproduces the classic 0x00FF00FF/0x0F0F0F0F/0x33333333/0x55555555
    * ladder; `ZOrderSpec` checks every stride against the literal
    * per-bit reference spread (all-ones patterns detect any collision).
    */
  private def ladder(n: Int): Seq[(Int, Long)] = {
    val pos = Array.tabulate(16)(b => (b * n).toLong) // target...
    val cur = Array.tabulate(16)(_.toLong)
    Seq(8, 4, 2, 1).map { k =>
      val s = k * (n - 1)
      var mask = 0L
      var b = 0
      while (b < 16) {
        if (pos(b) - cur(b) >= s) cur(b) += s
        mask |= 1L << cur(b)
        b += 1
      }
      (s, mask)
    }
  }

  /** Spread the low 16 bits of `c` at stride `n` (bit b lands at
    * position b·n) — the generalized mask-shift ladder: 4 shift/AND
    * stages whatever the stride, so the expression stays as small and
    * codegen-friendly as the 2-dim ladder (the naive 16-term-per-dim
    * spread compiled past the codegen method limit and ran interpreted,
    * 25x slower on the declared 3-dim query).
    */
  def spreadBitsStride(c: Column, n: Int): Column =
    if (n == 1) c.cast("long")
    else ladder(n).foldLeft(c.cast("long")) { case (x, (s, m)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }

  /** Morton code of 1–4 quantized 16-bit values (≤ 64-bit key):
    * dimension j's bits land on positions ≡ j (mod n), so adjacent codes
    * are adjacent in EVERY dimension — the N-column data-skipping key
    * (16·n bits; 4 dims fill the long exactly).
    */
  def mortonN(qs: Seq[Column]): Column = {
    require(qs.nonEmpty && qs.length <= 4,
      s"mortonN interleaves 1..4 dims into 64 bits, got ${qs.length}")
    qs.zipWithIndex
      .map { case (q, j) => shiftleft(spreadBitsStride(q, qs.length), j) }
      .reduce(_.bitwiseOR(_))
  }

  /** [[withZCode]] for 1–4 dimensions: one min/max aggregate over ALL
    * columns rides in as a single broadcast 1-row cross join, the
    * quantize + interleave stays a pure map.
    */
  def withZCodeN(df: DataFrame, colNames: Seq[String],
                 zCol: String = "__z"): DataFrame = {
    // bounds-check HERE so an empty column list fails with the designed
    // message, not aggs.head's bare NoSuchElementException
    require(colNames.nonEmpty && colNames.length <= 4,
      s"z-order interleaves 1..4 dims into 64 bits, got ${colNames.length}")
    val aggs = colNames.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c).as(s"__min$i"), max(c).as(s"__max$i"))
    }
    val mm = df.agg(aggs.head, aggs.tail: _*)
    val qs = colNames.zipWithIndex.map { case (c, i) =>
      quantize16(col(c), col(s"__min$i"), col(s"__max$i"))
    }
    df.crossJoin(broadcast(mm))
      .withColumn(zCol, mortonN(qs))
      .drop(colNames.indices
        .flatMap(i => Seq(s"__min$i", s"__max$i")): _*)
  }

  /** [[zorderBy]] for 1–4 dimensions. */
  def zorderByN(df: DataFrame, colNames: Seq[String],
                numFiles: Int): DataFrame =
    withZCodeN(df, colNames)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Rewrite `df` in Z-order on `(xCol, yCol)`: compute the Morton code
    * of the quantized pair, range-partition into `numFiles` partitions
    * on it, and sort each partition by it. Written as-is, every file
    * covers a compact rectangle of (x, y) space; `ZOrderSpec` measures
    * the bounding-box shrink vs the natural layout.
    *
    * One exchange (the range partitioner's sample pass + shuffle) — the
    * same cost as any clustered write; the skipping payoff repays it on
    * every subsequent selective scan.
    */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
               numFiles: Int): DataFrame =
    withZCode(df, xCol, yCol)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
