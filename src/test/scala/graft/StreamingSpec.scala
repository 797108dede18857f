package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** File-stream sources need a *directory*; stage the single parquet file
    * into a temp dir once.
    */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling agg over events equals the batch computation") {
    val streamed = EventsStream.tumblingAgg(EventsStream.readEvents(spark, eventsDir))
    // Complete mode flushes every window, so the set equals the batch query
    // (append mode would withhold windows past the final watermark).
    val got = EventsStream.runToMemory(spark, streamed, "tumbling_test", OutputMode.Complete())
      .select("w_start", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = Tables.events(spark, SparkTestSession.sfDir)
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("flatMapGroupsWithState running totals: final snapshot equals batch aggregation") {
    val streamed = EventsStream.statefulUserTotals(
      EventsStream.readEvents(spark, eventsDir))
    // one snapshot per (user, micro-batch); the final snapshot per user —
    // the one with the highest running count — must equal the batch totals
    val got = EventsStream.runToMemory(spark, streamed.toDF(), "stateful_test")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .groupBy(_._1).map { case (u, snaps) => u -> snaps.map(_._2).maxBy(_._1) }

    val batch = Tables.events(spark, SparkTestSession.sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("tv"), max("value").as("mv"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (u, (n, tv, mv)) =>
      val (bn, btv, bmv) = batch(u)
      assert(n == bn && math.abs(tv - btv) < 1e-9 && mv == bmv,
        s"user $u: got ($n,$tv,$mv) want ($bn,$btv,$bmv)")
    }
  }

  test("sliding windows cover each event len/slide times") {
    val streamed = EventsStream.slidingAgg(
      EventsStream.readEvents(spark, eventsDir),
      windowLen = "30 minutes", slide = "10 minutes")
    val got = EventsStream.runToMemory(spark, streamed, "sliding_test",
      OutputMode.Complete())
    val nEvents = Tables.events(spark, SparkTestSession.sfDir).count()
    // every event lands in exactly len/slide = 3 overlapping windows
    assert(got.agg(sum("n_events")).collect().head.getLong(0) == 3 * nEvents)
  }

  test("transformWithState running totals match flatMapGroupsWithState (RocksDB store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = EventsStream.statefulUserTotalsV2(
        EventsStream.readEvents(spark, eventsDir))
      val got = EventsStream.runToMemory(spark, streamed.toDF(), "tws_test")
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .groupBy(_._1).map { case (u, s) => u -> s.map(_._2).maxBy(_._1) }
      val batch = Tables.events(spark, SparkTestSession.sfDir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("tv"), max("value").as("mv"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      assert(got == batch)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming funnel replay equals the batch ev_funnel stage counts (RocksDB store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = EventsStream.streamingFunnel(
        EventsStream.readEvents(spark, eventsDir))
      // stage is monotone under ordered delivery: the max snapshot per
      // user is the final stage
      val perUser = EventsStream.runToMemory(spark, streamed.toDF(), "funnel_tws")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).map { case (u, s) => u -> s.map(_._2).max }
      val got = perUser.groupBy(_._2)
        .map { case (stage, us) => stage -> us.size.toLong }
      val want = SparkEntry.queries("ev_funnel")(spark, SparkTestSession.sfDir)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == want)
      assert(got.values.sum > 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("event-time funnel: deliberately out-of-order replay equals batch ev_funnel (RocksDB store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ev = Tables.events(spark, SparkTestSession.sfDir)
      val dir = java.nio.file.Files.createTempDirectory("events_ooo")
      // stage `df` as one parquet FILE with a pinned mtime: the file
      // source batches oldest-mtime-first under maxFilesPerTrigger=1,
      // so mtimes dictate arrival order
      def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory(s"stage_$name")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .find(f => f.getName.endsWith(".parquet")).get
        val dst = dir.resolve(name)
        java.nio.file.Files.move(part.toPath, dst)
        assert(dst.toFile.setLastModified(mtime))
      }
      // adversarial order: each user's LATER events arrive a whole
      // microbatch before their earlier ones — the delivery the ordered
      // FunnelProcessor documents it cannot survive
      val split = lit("2024-01-15").cast("timestamp")
      val t0 = System.currentTimeMillis()
      val late = ev.filter(col("ts") >= split)
      val early = ev.filter(col("ts") < split)
      assert(late.count() > 0 && early.count() > 0, "split must cut the replay in two")
      stage(late, "a_late.parquet", t0 - 300000)
      stage(early, "b_early.parquet", t0 - 200000)
      // flush sentinel far past max(ts)+delay: advances the watermark
      // over every real event so the tail seals on a finite replay
      stage(spark.sql(
        "SELECT CAST(-1 AS BIGINT) AS event_id, TIMESTAMP'2024-06-01 00:00:00' AS ts, " +
          "CAST(-1 AS BIGINT) AS user_id, 'view' AS event_type, " +
          "CAST(0.0 AS DOUBLE) AS value, '' AS props"),
        "c_flush.parquet", t0 - 100000)

      // delay wider than the whole replay span: nothing is "too late",
      // so the event-time fold must reproduce the batch answer exactly
      val streamed = EventsStream.streamingFunnelEventTime(
        EventsStream.readEvents(spark, dir.toString, Map("maxFilesPerTrigger" -> "1")),
        delay = "45 days")
      val snaps = EventsStream.runToMemory(spark, streamed.toDF(), "funnel_ooo")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val perUser = snaps.filter(_._1 != -1L).groupBy(_._1)
        .map { case (u, s) => u -> s.maxBy(_._3)._2 }
      val got = perUser.groupBy(_._2).map { case (st, us) => st -> us.size.toLong }
      val want = SparkEntry.queries("ev_funnel")(spark, SparkTestSession.sfDir)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == want, s"out-of-order replay diverged: got $got want $want")
      assert(got.values.sum > 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming session paths: sealed sessions equal the batch table minus each user's open tail (RocksDB store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = EventsStream.streamingSessionPaths(
        EventsStream.readEvents(spark, eventsDir))
      val got = EventsStream.runToMemory(spark, streamed.toDF(), "sess_paths_tws")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      // batch per-session paths, dropping each user's LAST session — the
      // one the stream keeps open because no later event seals it
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val table = graft.queries.Relational.sessionPathTable(
        graft.io.Tables.events(spark, SparkTestSession.sfDir))
      val sealedBatch = table
        .withColumn("max_sid",
          max("session_id").over(Window.partitionBy("user_id")))
        .filter(col("session_id") < col("max_sid"))
        .select(col("user_id"), col("path"),
          (size(split(col("path"), ">")) .cast("long")).as("n_events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      assert(got == sealedBatch, "sealed-session multiset diverged from batch")
      assert(got.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("event-time session paths: out-of-order delivery + idle flush seal EVERY session batch-equal (RocksDB store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // user 1: session A (2 events), 40-min gap, session B (2 events);
      // user 2: one 3-event session. File ONE delivers everything EXCEPT
      // an early session-A event that arrives LATE in file two (out of
      // order, within the 1h watermark delay); file three is the flush
      // event that drives the watermark past every gap horizon.
      val f1 = Seq(
        (2L, ts("2024-01-01 10:05:00"), 1L, "click"),
        (3L, ts("2024-01-01 10:50:00"), 1L, "view"),  // session B starts
        (4L, ts("2024-01-01 10:51:00"), 1L, "purchase"),
        (10L, ts("2024-01-01 09:00:00"), 2L, "view"),
        (11L, ts("2024-01-01 09:10:00"), 2L, "click"),
        (12L, ts("2024-01-01 09:20:00"), 2L, "error"))
      val f2 = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "view")) // late!
      val f3 = Seq((99L, ts("2024-01-02 00:00:00"), 999L, "view")) // flush
      val dir = java.nio.file.Files.createTempDirectory("events_etsess")
      val t0 = System.currentTimeMillis()
      Seq(("a.parquet", f1, t0 - 300000L), ("b.parquet", f2, t0 - 200000L),
        ("c.parquet", f3, t0 - 100000L)).foreach { case (n, rows, mtime) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"etsess_$n")
        rows.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") }
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = dir.resolve(n)
        java.nio.file.Files.move(part.toPath, dst)
        assert(dst.toFile.setLastModified(mtime))
      }
      val streamed = EventsStream.streamingSessionPathsEventTime(
        EventsStream.readEvents(spark, dir.toString,
          Map("maxFilesPerTrigger" -> "1")))
      val got = EventsStream
        .runToMemory(spark, streamed.toDF(), "etsess_tws")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // the late view must head session A despite arriving after the
      // click was processed; idle flush seals B and user 2's session
      assert(got == Set(
        (1L, "view>click", 2L),
        (1L, "view>purchase", 2L),
        (2L, "view>click>error", 3L)), s"got $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming transitions replay equals the batch ev_transitions matrix (RocksDB store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = EventsStream.streamingTransitions(
        EventsStream.readEvents(spark, eventsDir))
      val got = EventsStream.runToMemory(spark, streamed.toDF(), "trans_tws")
        .groupBy("prev_type", "event_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = SparkEntry.queries("ev_transitions")(spark, SparkTestSession.sfDir)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want, s"transition replay diverged")
      assert(got.values.sum > 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming retention replay equals the batch ev_retention matrix (RocksDB store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // two batches, same file staged twice: every user's weeks arrive
      // twice across batches — set-union/min state must absorb the
      // replays and emit the identical final profile
      val dir = java.nio.file.Files.createTempDirectory("events_retention")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"),
        dir.resolve("a.parquet"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"),
        dir.resolve("b.parquet"))
      val streamed = EventsStream.streamingRetention(
        EventsStream.readEvents(spark, dir.toString, Map("maxFilesPerTrigger" -> "1")))
      val snaps = EventsStream.runToMemory(spark, streamed.toDF(), "retention_tws")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      // latest snapshot per user = the one with the largest week set
      // (any state change strictly grows it)
      val latest = snaps.groupBy(_._1).map { case (_, s) => s.maxBy(_._3.size) }
      val got = latest.toSeq
        .flatMap { case (_, cohort, wks) => wks.map(w => (cohort, w - cohort)) }
        .groupBy(identity).map { case (cell, hits) => cell -> hits.size.toLong }
      val want = SparkEntry.queries("ev_retention")(spark, SparkTestSession.sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"retention replay diverged: got $got want $want")
      assert(got.values.sum > 0)
      // and the library rollup computes the same matrix from the
      // latest-per-user snapshots
      import spark.implicits._
      val matrix = EventsStream.retentionMatrix(
        latest.toSeq.toDF("user_id", "cohort_week", "weeks"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(matrix == want)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("retention snapshots through the upsert log resolve to the batch matrix (RocksDB store)") {
    // the documented serving composition, end to end: stateful retention
    // snapshots -> CDC upsert log keyed by user (week-set size as the
    // version: any state change strictly grows it) -> latest-per-user
    // read -> matrix rollup == the batch ev_retention answer
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("retention_upsert")
      val target = base.resolve("log").toString
      val ckpt = base.resolve("ckpt").toString
      val snaps = EventsStream.streamingRetention(
          EventsStream.readEvents(spark, eventsDir, Map("maxFilesPerTrigger" -> "1")))
        .toDF()
        .withColumn("ver", size(col("weeks")))
      EventsStream.upsertToParquetLog(snaps, "user_id", "ver", target, ckpt)
        .awaitTermination()
      val latest = EventsStream.readUpserted(spark, target, "user_id", "ver")
      val got = EventsStream.retentionMatrix(latest)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = SparkEntry.queries("ev_retention")(spark, SparkTestSession.sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"served matrix diverged: got $got want $want")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming anomaly replay equals the batch ev_anomaly z-scores (RocksDB store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = java.nio.file.Files.createTempDirectory("events_anomaly")
      val t0 = System.currentTimeMillis()
      val a = dir.resolve("a.parquet")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"), a)
      assert(a.toFile.setLastModified(t0 - 200000))
      // flush sentinel on its OWN event_type: seals every real window
      // without touching any real type's counts
      val tmp = java.nio.file.Files.createTempDirectory("anomaly_flush")
      spark.sql(
        "SELECT CAST(-1 AS BIGINT) AS event_id, TIMESTAMP'2024-06-01 00:00:00' AS ts, " +
          "CAST(-1 AS BIGINT) AS user_id, 'flush' AS event_type, " +
          "CAST(0.0 AS DOUBLE) AS value, '' AS props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val b = dir.resolve("b.parquet")
      java.nio.file.Files.move(part.toPath, b)
      assert(b.toFile.setLastModified(t0 - 100000))

      val streamed = EventsStream.streamingAnomaly(
        EventsStream.readEvents(spark, dir.toString, Map("maxFilesPerTrigger" -> "1")))
      val got = EventsStream.runToMemory(spark, streamed.toDF(), "anomaly_tws")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
        .filter(_._1._1 != "flush").toMap
      val want = SparkEntry.queries("ev_anomaly")(spark, SparkTestSession.sfDir)
        .collect()
        .map(r => (r.getString(1), r.getTimestamp(0).getTime * 1000L) ->
          (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(got.keySet == want.keySet,
        s"row sets diverged: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
      got.foreach { case (k, (n, z)) =>
        val (wn, wz) = want(k)
        assert(n == wn && math.abs(z - wz) < 1e-6, s"$k: got ($n,$z) want ($wn,$wz)")
      }
      assert(got.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = EventsStream.purchaseClickJoin(
      EventsStream.readEvents(spark, eventsDir))
    val got = EventsStream.runToMemory(spark, streamed, "ssjoin_test")
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = Tables.events(spark, SparkTestSession.sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val want = p.join(c, col("pu") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 30 minutes") &&
        col("cts") <= col("pts"))
      .select("pid", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming dedup drops duplicate event ids across input files") {
    // stage the same parquet twice -> every event id arrives twice
    val dir = java.nio.file.Files.createTempDirectory("events_dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"),
      dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"),
      dir.resolve("b.parquet"))
    val streamed = EventsStream.dedupEvents(
      EventsStream.readEvents(spark, dir.toString))
    val got = EventsStream.runToMemory(spark, streamed, "dedup_test")
    val want = Tables.events(spark, SparkTestSession.sfDir)
      .select("event_id").distinct().count()
    assert(got.count() == want)
  }

  test("readEvents on an initially empty directory starts an empty stream on the declared schema") {
    // the common producer-not-started-yet state: nothing to peek a
    // parquet footer from, so the stream must fall back to rawSchema
    // instead of failing stream DEFINITION with 'unable to infer schema'
    val dir = java.nio.file.Files.createTempDirectory("events_empty")
    val streamed = EventsStream.readEvents(spark, dir.toString)
    assert(streamed.schema == EventsStream.rawSchema)
    val got = EventsStream.runToMemory(spark,
      EventsStream.tumblingAgg(streamed), "empty_dir_test", OutputMode.Complete())
    assert(got.isEmpty)
  }

  test("session windows produce per-user sessions with positive spans") {
    val streamed = EventsStream.sessionAgg(EventsStream.readEvents(spark, eventsDir))
    val rows = EventsStream.runToMemory(spark, streamed, "session_test").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getTimestamp(1).before(r.getTimestamp(0))) // end >= start
      assert(r.getLong(3) >= 1)                            // n_events
    }
  }

  test("streaming session_window replay equals the batch ev_sessionize sessions") {
    import spark.implicits._
    // Stage the events plus a far-future sentinel (nonexistent user -1)
    // written as a SECOND file: the file source replays by mtime, so the
    // sentinel lands with-or-after the real data, pushes the watermark
    // past every real event, and the no-data batch then seals and emits
    // EVERY real session (append-mode session_window only emits a
    // session once the watermark passes its end).
    val dir = java.nio.file.Files.createTempDirectory("events_sess_parity")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"),
      dir.resolve("events.parquet"))
    val maxTs = Tables.events(spark, SparkTestSession.sfDir)
      .agg(max("ts")).head().getTimestamp(0)
    val sentinel = new java.sql.Timestamp(maxTs.getTime + 10L * 86400 * 1000)
    // the file source does not recurse into nested dirs: stage the
    // sentinel as a FLAT file (move the part file out of its write dir)
    val tmp = java.nio.file.Files.createTempDirectory("sess_sentinel")
    Seq((-1L, sentinel, -1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, dir.resolve("sentinel.parquet"))

    // the sentinel is dropped AFTER collection, not with a .filter inside
    // the streaming query — a deterministic filter pushes BELOW the
    // EventTimeWatermark operator, which would exclude the sentinel from
    // watermark computation and withhold the final hour's sessions
    val streamed = EventsStream
      .sessionAgg(EventsStream.readEvents(spark, dir.toString))
    // java.sql.Timestamp equality includes the nanos field, so these
    // tuples compare at full microsecond precision — the precision the
    // anchor-identity claim is about
    val got = EventsStream.runToMemory(spark, streamed, "session_parity")
      .collect()
      .map(r => (r.getLong(2), r.getTimestamp(0), r.getTimestamp(1), r.getLong(3)))
      .filter(_._1 != -1L)
      .toSet
    val want = SparkEntry.queries("ev_sessions")(spark, SparkTestSession.sfDir)
      .select(col("user_id"), col("session_start"),
        expr("session_end + INTERVAL 30 MINUTES").as("s_end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"session parity diverged: ${(got -- want).take(3)} vs ${(want -- got).take(3)}")
  }
}
