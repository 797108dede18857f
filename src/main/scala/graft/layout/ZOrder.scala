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
    when(maxC === minC, lit(0L))
      .otherwise(floor((c - minC) * 65535.0 / (maxC - minC)).cast("long"))

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
