package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asof join: latest right at-or-before left; null when none; inclusive ties") {
    val left = Seq(
      (1L, 100L, "p1"), // after rights at 50, 90 -> match 90
      (1L, 50L, "p2"),  // exactly at right 50 -> inclusive match 50
      (1L, 10L, "p3"),  // before all rights -> null
      (2L, 100L, "p4")  // key with no rights -> null
    ).toDF("k", "t", "pid")
    val right = Seq(
      (1L, 50L, "r50"),
      (1L, 90L, "r90"),
      (1L, 200L, "r200") // after every left -> never matched
    ).toDF("k", "rt", "payload")

    val got = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("payload"))
      .select(col("pid"), col("__asof.payload").as("m"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "p1" -> Some("r90"), "p2" -> Some("r50"), "p3" -> None, "p4" -> None))
  }

  test("asof join: NULL keys never match (agrees with BroadcastAsofJoin and SQL ASOF)") {
    val left = Seq(
      (Option(1L), 100L, "p1"),   // normal match
      (Option.empty[Long], 100L, "pnull") // NULL key -> no match, ever
    ).toDF("k", "t", "pid")
    val right = Seq(
      (Option(1L), 50L, "r50"),
      (Option.empty[Long], 40L, "rnull") // NULL-key right must not leak
    ).toDF("k", "rt", "payload")

    val viaWindow = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("payload"))
      .select(col("pid"), col("__asof.payload").as("m"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(viaWindow == Map("p1" -> Some("r50"), "pnull" -> None))

    val viaBroadcast = graft.operators.BroadcastAsofJoin
      .asofJoinBroadcast(left, right, "k", "t", "rt", Seq("payload"))
      .select(col("pid"), col("payload").as("m"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(viaBroadcast == viaWindow, "the two asof implementations must agree on NULL keys")
  }
}
