package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsofJoin, BroadcastAsofJoin}

class BroadcastAsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("broadcast asof: latest right at-or-before left; null when none; inclusive ties") {
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

    val got = BroadcastAsofJoin.asofJoinBroadcast(left, right, "k", "t", "rt", Seq("payload"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got == Map(
      "p1" -> Some("r90"), "p2" -> Some("r50"), "p3" -> None, "p4" -> None))
  }

  test("matches the union+window asof join on the events table") {
    val d = SparkTestSession.sfDir
    val ev = graft.io.Tables.events(spark, d)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))

    val viaWindow = AsofJoin
      .asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("click_id"))
      .select(col("purchase_id"), col("__asof.click_id").as("click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val viaBroadcast = BroadcastAsofJoin
      .asofJoinBroadcast(purchases, clicks, "user_id", "ts", "ts", Seq("click_id"))
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(viaBroadcast.nonEmpty)
    assert(viaBroadcast == viaWindow)
  }

  test("plan is map-only: custom exec present, zero exchanges in the whole plan") {
    val d = SparkTestSession.sfDir
    val ev = graft.io.Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
    val rates = Seq((1L, 0L, 1.0), (1L, 1000L, 2.0), (2L, 0L, 3.0))
      .toDF("user_id", "rts", "rate")
      .withColumn("rts", timestamp_micros(col("rts")))
      .withColumnRenamed("rts", "ts")
    val plan = BroadcastAsofJoin
      .asofJoinBroadcast(purchases, rates, "user_id", "ts", "ts", Seq("rate"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsofJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Exchange"),
      s"fact side must stay map-only (no shuffle/broadcast exchange):\n$plan")
  }

  test("null keys and times never match; duplicate-free right is honored") {
    val left = Seq(
      (Some(1L), Some(100L), "a"),
      (None: Option[Long], Some(100L), "b"),
      (Some(1L), None: Option[Long], "c")
    ).toDF("k", "t", "pid")
    val right = Seq((1L, 10L, "r")).toDF("k", "rt", "payload")
    val got = BroadcastAsofJoin.asofJoinBroadcast(left, right, "k", "t", "rt", Seq("payload"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got == Map("a" -> Some("r"), "b" -> None, "c" -> None))
  }
}
