package graft

import org.scalatest.funsuite.AnyFunSuite

class PinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Dataset.unpersist is a no-op for localCheckpoint pins; Pins.release drops them") {
    def pins() = spark.sparkContext.getPersistentRDDs.size
    val base = pins()
    val df = (1 to 100).toDF("x").localCheckpoint(true)
    assert(pins() == base + 1, "localCheckpoint must pin exactly one RDD")
    // documents the Spark behavior Pins exists for: the checkpoint pin
    // lives below the CacheManager, so Dataset.unpersist cannot see it
    df.unpersist(blocking = true)
    assert(pins() == base + 1, "plain unpersist unexpectedly dropped the pin")
    graft.util.Pins.release(df)
    assert(pins() == base, "Pins.release must drop the checkpoint pin")
  }

  test("Pins.release falls back to plain unpersist for cached plans") {
    val df = (1 to 100).toDF("x").cache()
    df.count()
    assert(df.storageLevel.useMemory)
    graft.util.Pins.release(df)
    assert(!df.storageLevel.useMemory, "cached plan must uncache via the fallback")
  }
}
