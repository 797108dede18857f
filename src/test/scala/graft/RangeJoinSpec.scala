package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("range join: inclusive lo, exclusive hi, multi-bin intervals, overlaps") {
    val facts = Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 25.0), (5L, 30.0))
      .toDF("fid", "v")
    val ivals = Seq(
      ("a", 0.0, 10.0),   // [0,10): fids 1,2 — not 3 (hi exclusive)
      ("b", 10.0, 30.0),  // [10,30): fids 3,4 — spans 2 bins at w=10
      ("c", 20.0, 40.0)   // [20,40): fids 4,5 — overlaps b
    ).toDF("band", "lo", "hi")
    val got = RangeJoin.rangeJoin(facts, "v", ivals, "lo", "hi", binWidth = 10.0)
      .select("fid", "band")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (4L, "c"), (5L, "c")))
  }
}
