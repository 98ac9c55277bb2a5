package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Feeds
import graft.streaming.Streams

class StreamsFeedsSpec extends AnyFunSuite {
  import TestSession._

  test("streaming windowed agg matches the batch equivalent") {
    import spark.implicits._
    // materialize events to a parquet dir the stream can read with a plain schema
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val ev  = Tables.events(spark, sf).select($"ts", $"event_type", $"value")
    ev.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    // Complete mode: on a bounded source, append mode would withhold
    // the final windows still inside the watermark
    val got = Streams.runToMemory(
      spark, Streams.windowedAggStream(stream), "win_agg_test", OutputMode.Complete())
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", round($"total", 6).as("total"))
    val want = Streams.windowedAggBatch(Tables.events(spark, sf))
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("stateful sessionization emits exactly the batch sessions (minus still-open tails)") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"value").as[Streams.SEv]
    // batch execution of the stateful function: no timeouts fire, so
    // the emitted set is every session CLOSED by a later event — i.e.
    // all batch sessions except each user's last (still open at EOF)
    val streamed = Streams.sessionizeStream(ev, 30).toDF()
    val batch = Streams.sessionizeBatch(Tables.events(spark, sf))
    val lastPerUser = batch
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy(col("session_id").desc)))
      .filter($"rn" === 1)
    val want = batch.join(
        lastPerUser.select($"user_id", $"session_id"), Seq("user_id", "session_id"), "left_anti")
      .select($"user_id", $"start_us", $"end_us", $"n_events", $"total_value")
    val got = streamed.select($"user_id", $"start_us", $"end_us", $"n_events", $"total_value")
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("streaming EMA matches the batch fold bit-exactly and drops late data") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // batch execution of the stateful fold: one pass per key == the
    // aggregate's sorted fold, so values must be bit-equal
    val ev  = Tables.events(spark, sf).select($"user_id", $"ts", $"value").as[Streams.SEv]
    val got = Streams.emaStream(ev, 20).toDF().select($"user_id", $"ema")
    graft.plans.GraftFunctions.register(spark)
    val want = Tables.events(spark, sf).groupBy($"user_id")
      .agg(expr("graft_ema(ts, value, 20)").as("ema"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    // multi-batch: the fold continues across batches from O(1) state;
    // an event behind the fold point is dropped by contract
    val mem = MemoryStream[Streams.SEv]
    val out = Streams.emaStream(mem.toDS(), span = 3, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("ema_stream_test").outputMode("update").start()
    def at(m: Int) = java.time.Instant.parse(f"2024-01-01T10:$m%02d:00Z")
    try {
      mem.addData(Streams.SEv(1L, at(0), 10.0), Streams.SEv(1L, at(1), 20.0))
      q.processAllAvailable()
      mem.addData(Streams.SEv(1L, at(2), 30.0), Streams.SEv(1L, at(0), 999.0))
      q.processAllAvailable()
      val last = spark.table("ema_stream_test").as[Streams.EmaOut].collect().maxBy(_.ts_us)
      // alpha = 0.5: 10 -> 15 -> 22.5; the late 999 never folds
      assert(last.ema === 22.5)
      assert(last.ts_us === at(2).toEpochMilli * 1000)
    } finally q.stop()
  }

  test("streaming drawdown matches the batch running-max fold; peak persists across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // batch execution: per-event emissions equal the batch window fold
    val evd = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"value")
      // the in-batch fold sorts by (ts, value): dedupe ts ties the same way
      .groupBy($"user_id", $"ts").agg(max($"value").as("value"))
      .select($"user_id", $"ts", $"value").as[Streams.SEv]
    val got = Streams.drawdownStream(evd).toDF()
      .select($"user_id", $"ts_us", $"peak", $"drawdown")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = evd.toDF()
      .withColumn("peak", max($"value").over(w))
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"peak",
        when($"peak" =!= 0, $"value" / $"peak" - 1).otherwise(0.0).as("drawdown"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    // cross-batch: the peak survives the batch boundary in O(1) state
    val mem = MemoryStream[Streams.SEv]
    val q = Streams.drawdownStream(mem.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("dd_stream_test").outputMode("append").start()
    def at(m: Int) = java.time.Instant.parse(f"2024-01-01T10:$m%02d:00Z")
    try {
      mem.addData(Streams.SEv(1L, at(0), 100.0), Streams.SEv(1L, at(1), 80.0))
      q.processAllAvailable()
      mem.addData(Streams.SEv(1L, at(2), 90.0))
      q.processAllAvailable()
      val rows = spark.table("dd_stream_test").as[Streams.DdOut].collect().sortBy(_.ts_us)
      assert(rows.map(_.peak).toSeq === Seq(100.0, 100.0, 100.0), "peak must persist")
      assert(math.abs(rows.last.drawdown - (90.0 / 100.0 - 1)) < 1e-12)
    } finally q.stop()
  }

  test("sessionize stream evicts idle users' state on event-time timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Streams.SEv]
    val out = Streams.sessionizeStream(mem.toDS(), gapMin = 30, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess_evict_test").outputMode("append").start()
    def at(h: Int, m: Int) = java.time.Instant.parse(f"2024-01-01T$h%02d:$m%02d:00Z")
    def stateRows: Long = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    try {
      // b1: A has two events, B one — both users get open state;
      // watermark is still behind either timeout, nothing emitted
      mem.addData(Streams.SEv(1L, at(10, 0), 1.0), Streams.SEv(1L, at(10, 5), 2.0), Streams.SEv(2L, at(10, 0), 7.0))
      q.processAllAvailable()
      assert(stateRows === 2)
      assert(spark.table("sess_evict_test").count() === 0)
      // b2: A returns after the gap — closes A's s1 inline; the
      // 12:00 event then advances the watermark to 11:59, and the
      // follow-up timeout batch (processAllAvailable runs it) fires
      // B's 10:30 timeout: B's session flushes as final and B's
      // state row is REMOVED — only A's open s2 remains
      mem.addData(Streams.SEv(1L, at(12, 0), 3.0))
      q.processAllAvailable()
      val afterB2 = spark.table("sess_evict_test").as[Streams.SessionOut].collect().toSet
      assert(afterB2 === Set(
        Streams.SessionOut(1L, at(10, 0).toEpochMilli * 1000, at(10, 5).toEpochMilli * 1000, 2L, 3.0),
        Streams.SessionOut(2L, at(10, 0).toEpochMilli * 1000, at(10, 0).toEpochMilli * 1000, 1L, 7.0)))
      assert(stateRows === 1)
      // b3: an unrelated user far ahead pushes the watermark past
      // A's 12:30 timeout -> A's open session flushes and its state
      // is dropped; only user 3's fresh state remains
      mem.addData(Streams.SEv(3L, at(15, 0), 9.0))
      q.processAllAvailable()
      val flushed = spark.table("sess_evict_test").as[Streams.SessionOut].collect().toSet
      assert(flushed.contains(Streams.SessionOut(1L, at(12, 0).toEpochMilli * 1000, at(12, 0).toEpochMilli * 1000, 1L, 3.0)))
      assert(stateRows === 1)
      // b4: B returns — state was evicted, so a brand-new session
      // opens (state row count grows again): eviction, not retention
      mem.addData(Streams.SEv(2L, at(15, 30), 4.0))
      q.processAllAvailable()
      assert(stateRows === 2)
    } finally q.stop()
  }

  test("emaStream state guard fires on a key explosion and stays silent on a bounded universe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def at(m: Int) = java.time.Instant.parse(f"2024-01-01T10:$m%02d:00Z")
    val mem = MemoryStream[Streams.SEv]
    val out = Streams.emaStream(mem.toDS(), span = 3)
    val q = out.writeStream.format("memory").queryName("ema_guard_test").outputMode("update").start()
    try {
      // bounded universe: 5 instruments, cap 10 — silent
      mem.addData((1L to 5L).map(k => Streams.SEv(k, at(0), 1.0)): _*)
      q.processAllAvailable()
      Streams.checkStateBound(q, Some(10L))
      // no cap configured anywhere: no-op even over the cap
      mem.addData((6L to 50L).map(k => Streams.SEv(k, at(1), 1.0)): _*)
      q.processAllAvailable()
      Streams.checkStateBound(q, None)
      // explosion past the cap (via the session conf): fails loudly
      spark.conf.set("graft.emaStream.maxKeys", "10")
      val e = intercept[IllegalStateException] { Streams.checkStateBound(q) }
      assert(e.getMessage.contains("exceeding maxKeys=10"), e.getMessage)
      assert(!q.isActive, "the guard must stop the leaking query")
    } finally {
      spark.conf.unset("graft.emaStream.maxKeys")
      if (q.isActive) q.stop()
    }
  }

  test("state-bound listener kills a key explosion within one micro-batch, no explicit check call") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def at(m: Int) = java.time.Instant.parse(f"2024-01-01T10:$m%02d:00Z")
    val enforcer = Streams.enforceStateBound(spark)
    spark.conf.set("graft.emaStream.maxKeys", "10")
    val mem = MemoryStream[Streams.SEv]
    val out = Streams.emaStream(mem.toDS(), span = 3)
    val q = out.writeStream.format("memory").queryName("ema_listener_test").outputMode("update").start()
    try {
      // bounded universe: the listener sees every progress event and
      // stays silent under the cap
      mem.addData((1L to 5L).map(k => Streams.SEv(k, at(0), 1.0)): _*)
      q.processAllAvailable()
      Thread.sleep(500) // listener bus is async
      assert(q.isActive && enforcer.violation(q).isEmpty)
      // key explosion: the harness only feeds data — NO checkStateBound
      // call anywhere. The listener must stop the query itself.
      mem.addData((6L to 50L).map(k => Streams.SEv(k, at(1), 1.0)): _*)
      q.processAllAvailable()
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (q.isActive && System.nanoTime() < deadline) Thread.sleep(100)
      assert(!q.isActive, "listener must stop the leaking query within one micro-batch")
      val v = enforcer.violation(q)
      assert(v.exists(_.contains("exceeding maxKeys=10")), s"violation not recorded: $v")
      val e = intercept[IllegalStateException] { enforcer.raise() }
      assert(e.getMessage.contains("exceeding maxKeys=10"))
      // acknowledged violations don't haunt later healthy scenarios
      enforcer.clear()
      enforcer.raise()
      assert(enforcer.violation(q).isEmpty)
      // a malformed cap must surface as a violation, not silently
      // disable enforcement (the listener bus swallows exceptions)
      spark.conf.set("graft.emaStream.maxKeys", "10k")
      val mem2 = MemoryStream[Streams.SEv]
      val q2 = Streams.emaStream(mem2.toDS(), span = 3)
        .writeStream.format("memory").queryName("ema_listener_badconf").outputMode("update").start()
      try {
        mem2.addData(Streams.SEv(1L, at(2), 1.0))
        q2.processAllAvailable()
        val deadline2 = System.nanoTime() + 15L * 1000000000L
        while (enforcer.violation(q2).isEmpty && System.nanoTime() < deadline2) Thread.sleep(100)
        assert(enforcer.violation(q2).exists(_.contains("not a number")),
          "malformed maxKeys must be recorded loudly")
      } finally if (q2.isActive) q2.stop()
    } finally {
      enforcer.close()
      spark.conf.unset("graft.emaStream.maxKeys")
      if (q.isActive) q.stop()
    }
  }

  test("cross-batch in-watermark out-of-order event cannot shrink or split a session") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Streams.SEv]
    val out = Streams.sessionizeStream(mem.toDS(), gapMin = 30, watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("sess_ooo_test").outputMode("append").start()
    def at(h: Int, m: Int) = java.time.Instant.parse(f"2024-01-01T$h%02d:$m%02d:00Z")
    try {
      mem.addData(Streams.SEv(1L, at(10, 0), 1.0), Streams.SEv(1L, at(10, 20), 2.0))
      q.processAllAvailable()
      // 10:10 arrives a batch late but inside the watermark: it folds
      // into the open session and must NOT move its end back to 10:10
      // — otherwise the 10:45 event (25 min after the TRUE end) would
      // read as gap-exceeded and split a session sessionizeBatch
      // keeps whole
      mem.addData(Streams.SEv(1L, at(10, 10), 4.0), Streams.SEv(1L, at(10, 45), 8.0))
      q.processAllAvailable()
      mem.addData(Streams.SEv(1L, at(12, 0), 16.0)) // gap exceeded: closes the session inline
      q.processAllAvailable()
      val got = spark.table("sess_ooo_test").as[Streams.SessionOut].collect().toSet
      assert(got === Set(Streams.SessionOut(
        1L, at(10, 0).toEpochMilli * 1000, at(10, 45).toEpochMilli * 1000, 4L, 15.0)))
    } finally q.stop()
  }

  test("all five stateful twins are state-store-provider agnostic (RocksDB == default HDFS-backed)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def at(h: Int, m: Int) = java.time.Instant.parse(f"2024-01-01T$h%02d:$m%02d:00Z")
    def ts(h: Int, m: Int) = java.sql.Timestamp.from(at(h, m))
    // the same multi-batch scenarios the provider-default tests run,
    // once per provider; the operators must not depend on the
    // in-memory provider's semantics (RocksDB is the at-scale store:
    // state spills to disk instead of growing the executor heap).
    // Every stateful twin is covered: sessionizer + EMA
    // (mapGroupsWithState), vwap (windowed agg state), dedup
    // (dropDuplicatesWithinWatermark state), stream-stream join
    // (join state).
    def runScenarios(tag: String): (Set[Streams.SessionOut], Double, Set[String], Set[Long], Set[String]) = {
      val smem = MemoryStream[Streams.SEv]
      val sq1 = Streams.sessionizeStream(smem.toDS(), gapMin = 30, watermark = "1 minute")
        .writeStream.format("memory").queryName(s"prov_sess_$tag").outputMode("append").start()
      try {
        smem.addData(Streams.SEv(1L, at(10, 0), 1.0), Streams.SEv(1L, at(10, 5), 2.0), Streams.SEv(2L, at(10, 0), 7.0))
        sq1.processAllAvailable()
        smem.addData(Streams.SEv(1L, at(12, 0), 3.0))
        sq1.processAllAvailable()
      } finally sq1.stop()
      val emem = MemoryStream[Streams.SEv]
      val eq = Streams.emaStream(emem.toDS(), span = 3, watermark = "0 seconds")
        .writeStream.format("memory").queryName(s"prov_ema_$tag").outputMode("update").start()
      try {
        emem.addData(Streams.SEv(1L, at(10, 0), 10.0), Streams.SEv(1L, at(10, 1), 20.0))
        eq.processAllAvailable()
        emem.addData(Streams.SEv(1L, at(10, 2), 30.0))
        eq.processAllAvailable()
      } finally eq.stop()
      val vmem = MemoryStream[(java.sql.Timestamp, Long, Double, String)]
      val vq = Streams.vwapStream(vmem.toDF().toDF("ts", "user_id", "value", "props"), "1 day", "1 hour")
        .writeStream.format("memory").queryName(s"prov_vwap_$tag").outputMode("complete").start()
      try {
        vmem.addData((ts(10, 0), 1L, 100.0, """{"k":10}"""), (ts(11, 0), 1L, 110.0, """{"k":30}"""))
        vq.processAllAvailable()
        vmem.addData((ts(12, 0), 1L, 120.0, """{"k":60}"""), (ts(10, 30), 2L, 50.0, """{"k":5}"""))
        vq.processAllAvailable()
      } finally vq.stop()
      val dmem = MemoryStream[(Long, java.sql.Timestamp)]
      val dq = Streams.dedupStream(dmem.toDF().toDF("event_id", "ts"), "1 hour")
        .writeStream.format("memory").queryName(s"prov_dedup_$tag").outputMode("append").start()
      try {
        dmem.addData((1L, ts(10, 0)), (2L, ts(10, 1)))
        dq.processAllAvailable()
        // replay across a batch boundary: state must drop them
        dmem.addData((1L, ts(10, 0)), (2L, ts(10, 1)), (3L, ts(10, 2)))
        dq.processAllAvailable()
      } finally dq.stop()
      val cmem = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val pmem = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val jq = Streams.streamStreamJoin(
        cmem.toDF().toDF("user_id", "ts", "value"),
        pmem.toDF().toDF("user_id", "ts", "value"))
        .writeStream.format("memory").queryName(s"prov_ssj_$tag").outputMode("append").start()
      try {
        cmem.addData((1L, ts(10, 0), 1.0), (1L, ts(10, 30), 2.0), (2L, ts(10, 0), 3.0))
        jq.processAllAvailable()
        // purchase arrives a batch later: the click state must match it
        pmem.addData((1L, ts(10, 45), 99.0))
        jq.processAllAvailable()
      } finally jq.stop()
      (spark.table(s"prov_sess_$tag").as[Streams.SessionOut].collect().toSet,
        spark.table(s"prov_ema_$tag").as[Streams.EmaOut].collect().maxBy(_.ts_us).ema,
        spark.table(s"prov_vwap_$tag").collect().map(_.toString).toSet,
        spark.table(s"prov_dedup_$tag").select($"event_id").as[Long].collect().toSet,
        spark.table(s"prov_ssj_$tag").collect().map(_.toString).toSet)
    }
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(conf)
    def under(provider: Option[String], tag: String) = {
      provider match {
        case Some(p) => spark.conf.set(conf, p)
        case None    => spark.conf.unset(conf)
      }
      try runScenarios(tag)
      finally prev match {
        case Some(v) => spark.conf.set(conf, v)
        case None    => spark.conf.unset(conf)
      }
    }
    val base  = under(None, "hdfs")
    val rocks = under(
      Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"), "rocks")
    assert(base === rocks, "every stateful twin must produce identical results on both providers")
    val (sessions, ema, vwap, dedup, ssj) = rocks
    assert(sessions === Set(
      Streams.SessionOut(1L, at(10, 0).toEpochMilli * 1000, at(10, 5).toEpochMilli * 1000, 2L, 3.0),
      Streams.SessionOut(2L, at(10, 0).toEpochMilli * 1000, at(10, 0).toEpochMilli * 1000, 1L, 7.0)))
    assert(ema === 22.5) // alpha=0.5: 10 -> 15 -> 22.5, bit-exact on RocksDB too
    // cross-provider equality alone could pass vacuously on empty
    // sinks — pin the expected cardinalities
    assert(vwap.size === 2 && dedup === Set(1L, 2L, 3L) && ssj.size === 2)
  }

  test("watermark drops late events in append mode") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = Streams.windowedAggStream(mem.toDF().toDF("ts", "event_type", "value"), "1 hour", "1 hour")
    val q = agg.writeStream.format("memory").queryName("late_test").outputMode("append").start()
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    mem.addData((t(1), "click", 1.0)); q.processAllAvailable()
    mem.addData((t(10), "click", 1.0)); q.processAllAvailable() // watermark -> 09:30
    mem.addData((t(2), "click", 5.0)); q.processAllAvailable()  // late: window [02:00,03:00) expired
    mem.addData((t(12), "click", 1.0)); q.processAllAvailable() // close the 10:00 window
    q.stop()
    val out = spark.table("late_test")
    assert(out.filter(date_format($"window.start", "HH:mm") === "02:00").count() === 0,
      "late event should have been dropped by the watermark")
    assert(out.filter(date_format($"window.start", "HH:mm") === "01:00").count() === 1)
    assert(out.filter(date_format($"window.start", "HH:mm") === "10:00").count() === 1)
  }

  test("narrow curation ops (quality gate, repetition score) run unchanged on a stream") {
    import spark.implicits._
    // every per-row curation op is stateless, so the same operator
    // call works on an unbounded source in append mode — the
    // document feed becomes a curation stream with zero code change
    val docs = Tables.documents(spark, sf)
    val dir  = java.nio.file.Files.createTempDirectory("graft_curate").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val gated = Streams.runToMemory(
      spark, graft.operators.TextAnalysis.qualityGate(stream), "curate_gate", OutputMode.Append())
    val gatedBatch = graft.operators.TextAnalysis.qualityGate(docs)
    assert(gated.count() === docs.count())
    assert(gated.except(gatedBatch).count() === 0 && gatedBatch.except(gated).count() === 0)
    val rep = Streams.runToMemory(
      spark, graft.operators.TextAnalysis.repetitionScore(stream), "curate_rep", OutputMode.Append())
    val repBatch = graft.operators.TextAnalysis.repetitionScore(docs)
    assert(rep.except(repBatch).count() === 0 && repBatch.except(rep).count() === 0)
  }

  test("streaming vwap matches the batch operator once windows close") {
    import spark.implicits._
    val ev  = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_vwap").toString
    ev.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val streamed = Streams.runToMemory(
      spark, Streams.vwapStream(stream, "1 day"), "vwap_test", OutputMode.Complete())
      .select(date_format($"bar_start", "yyyy-MM-dd").as("day"), $"user_id", $"volume", $"vwap")
    val batch = graft.operators.TimeSeries.vwap(ev)
      .withColumn("day", date_format($"day", "yyyy-MM-dd"))
      .select($"day", $"user_id", $"volume", $"vwap")
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0)
  }

  test("streaming OHLC bars match the batch resample exactly once windows close") {
    import spark.implicits._
    val ev  = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ohlc").toString
    ev.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val streamed = Streams.runToMemory(
      spark, Streams.ohlcStream(stream, "1 day"), "ohlc_test", OutputMode.Complete())
      .select(date_format($"bar_start", "yyyy-MM-dd").as("day"), $"user_id",
        $"open", $"high", $"low", $"close", $"n_obs")
    val batch = graft.operators.Relational.ohlcResample(ev)
      .select(date_format($"bar_start", "yyyy-MM-dd").as("day"), $"user_id",
        $"open", $"high", $"low", $"close", $"n_obs")
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() === 0 && batch.except(streamed).count() === 0)
  }

  test("streaming dedup drops a replayed batch's duplicates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    val ev  = Tables.events(spark, sf).select($"event_id", $"ts", $"user_id", $"value")
    // write the same data twice -> every event is duplicated
    ev.write.mode("overwrite").parquet(dir + "/a")
    ev.write.mode("overwrite").parquet(dir + "/b")
    val stream = spark.readStream.schema(ev.schema).parquet(dir + "/*")
    val got = Streams.runToMemory(
      spark, Streams.dedupStream(stream), "dedup_test", OutputMode.Append())
    assert(got.count() === ev.count())
    assert(got.groupBy($"event_id").count().filter($"count" > 1).count() === 0)
  }

  test("stream-to-static enrichment joins every event") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_enrich").toString
    val ev  = Tables.events(spark, sf).select($"event_id", $"ts", $"user_id", $"value")
    ev.write.mode("overwrite").parquet(dir)
    val dim = Tables.events(spark, sf).select($"user_id").distinct()
      .withColumn("cohort", org.apache.spark.sql.functions.pmod($"user_id", org.apache.spark.sql.functions.lit(10)))
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val got = Streams.runToMemory(
      spark, Streams.enrichStream(stream, dim), "enrich_test", OutputMode.Append())
    assert(got.count() === ev.count())
    assert(got.filter($"cohort".isNull).count() === 0)
  }

  test("stream-stream interval join matches the batch equivalent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    val ev  = Tables.events(spark, sf).select($"user_id", $"ts", $"event_type", $"value")
    ev.filter($"event_type" === "click").write.mode("overwrite").parquet(dir + "/clicks")
    ev.filter($"event_type" === "purchase").write.mode("overwrite").parquet(dir + "/purchases")
    val schema = ev.select($"user_id", $"ts", $"value").schema
    val cS = spark.readStream.schema(schema).parquet(dir + "/clicks")
    val pS = spark.readStream.schema(schema).parquet(dir + "/purchases")
    val got = Streams.runToMemory(
      spark, Streams.streamStreamJoin(cS, pS), "ssj_test", OutputMode.Append())
    val cB = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"), $"value".as("click_value"))
    val pB = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_uid"), $"ts".as("purchase_ts"), $"value".as("purchase_value"))
    val want = pB.join(cB,
      pB("p_uid") === cB("user_id") &&
        cB("click_ts") <= pB("purchase_ts") &&
        cB("click_ts") >= pB("purchase_ts") - expr("interval 1 hour"))
      .select($"user_id", $"purchase_ts", $"purchase_value", $"click_ts", $"click_value")
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("multimodal features are deterministic and complete") {
    import spark.implicits._
    val docs  = Tables.documents(spark, sf)
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
    assert(feats.count() === docs.count())
    assert(feats.filter($"feat_width" < 16 || $"feat_width" >= 80).count() === 0)
    assert(feats.filter(!$"feat_hash".rlike("^[0-9a-f]{32}$")).count() === 0)
  }

  test("binary byteStats: entropy bounds, JVM-reference equality, and ASCII corpus precondition") {
    import spark.implicits._
    val docs  = Tables.documents(spark, sf)
    // the DuckDB oracle reads chars where Spark reads bytes — valid
    // only while the corpus is pure ASCII; assert the precondition
    // the oracle comment claims
    assert(docs.filter(octet_length($"text") =!= length($"text")).count() === 0,
      "documents corpus is no longer pure ASCII: q_binary_entropy/q_binary_chunks oracles need rework")
    val media = Multimodal.mediaFromDocuments(docs).toDF()
    val stats = Multimodal.byteStats(media)
    assert(stats.count() === docs.count())
    // Shannon bounds: 0 <= H <= log2(distinct); modal count consistent
    assert(stats.filter($"entropy" < 0 || $"entropy" > log2($"distinct_bytes") + 1e-9).count() === 0)
    assert(stats.filter($"top_count" * $"distinct_bytes" < $"n_bytes").count() === 0,
      "modal byte count below uniform bound")
    // spot-check one row against a plain JVM histogram fold
    val row  = stats.orderBy($"media_id").head()
    val text = docs.filter($"doc_id" === row.getLong(0)).head().getAs[String]("text")
    val bytes = text.getBytes("UTF-8")
    val hist  = bytes.groupBy(b => b & 0xff).view.mapValues(_.length.toLong).toMap
    val n     = bytes.length.toDouble
    val href  = math.log(n) / math.log(2) -
      hist.toSeq.sortBy(_._1).map { case (_, c) => c * (math.log(c.toDouble) / math.log(2)) }.sum / n
    assert(row.getLong(1) === bytes.length.toLong)
    assert(row.getInt(2) === hist.size)
    assert(row.getLong(4) === hist.values.max)
    assert(math.abs(row.getDouble(5) - BigDecimal(href).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("wav decode: the JDK's own javax.sound parser agrees with WavPcmStats on generated payloads") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(20)
    val wav  = Multimodal.wavFromDocuments(docs).collect()
    assert(wav.nonEmpty)
    wav.foreach { rec =>
      val in  = new java.io.ByteArrayInputStream(rec.payload)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(in)
      val fmt = ais.getFormat
      assert(fmt.getSampleRate === 8000f, s"media ${rec.media_id}")
      assert(fmt.getChannels === 1 && fmt.getSampleSizeInBits === 16)
      assert(!fmt.isBigEndian, "canonical WAV PCM is little-endian")
      val frames = ais.getFrameLength
      // JDK-decoded samples must match our parser's exact moments
      val buf = ais.readAllBytes()
      val jdk = (0 until frames.toInt).map { i =>
        ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
      }
      val row = graft.plans.GraftHashOps.wavPcmStats(rec.payload)
      assert(row.getBoolean(0), "parser rejected a JDK-valid WAV")
      assert(row.getLong(4) === frames)
      if (jdk.nonEmpty) {
        assert(row.getInt(5) === jdk.map(math.abs).max)
        assert(row.getLong(6) === jdk.map(_.toLong).sum)
        assert(row.getLong(7) === jdk.map(s => s.toLong * s).sum)
      }
    }
  }

  test("bmp decode: the JDK's own ImageIO agrees with BmpPixelStats on generated payloads") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(20)
    val bmp  = Multimodal.bmpFromDocuments(docs).collect()
    assert(bmp.nonEmpty)
    bmp.foreach { rec =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rec.payload))
      assert(img != null, s"ImageIO rejected media ${rec.media_id}")
      assert(img.getWidth === 7 && img.getHeight === 4)
      var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0; var luma = 0L
      for (y <- 0 until 4; x <- 0 until 7) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        peak = math.max(peak, math.max(r, math.max(g, b)))
        luma += 299L * r + 587L * g + 114L * b
      }
      val row = graft.plans.GraftHashOps.bmpPixelStats(rec.payload)
      assert(row.getBoolean(0), "parser rejected an ImageIO-valid BMP")
      assert(row.getInt(1) === 7 && row.getInt(2) === 4 && row.getLong(3) === 28L)
      assert(row.getLong(4) === sr && row.getLong(5) === sg && row.getLong(6) === sb,
        s"channel sums disagree with ImageIO on media ${rec.media_id} (BGR/stride bug?)")
      assert(row.getInt(7) === peak && row.getLong(8) === luma)
    }
  }

  test("bmp decode: malformed payloads report valid=false, never throw or lie") {
    val ok = Multimodal.bmpBytes("hello world bmp fixture", 96)
    assert(graft.plans.GraftHashOps.bmpPixelStats(ok).getBoolean(0))
    val cases = Seq[Array[Byte]](
      Array.empty,
      ok.take(53),                                      // truncated header
      { val b = ok.clone(); b(0) = 'X'.toByte; b },     // wrong magic
      { val b = ok.clone(); b(28) = 32; b },            // 32 bpp (unsupported here)
      { val b = ok.clone(); b(30) = 1; b },             // RLE compression
      { val b = ok.clone(); b(22) = 100.toByte; b })    // height overruns payload
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.bmpPixelStats(p).getBoolean(0), s"accepted ${p.length} bytes")
    }
  }

  test("png decode: the JDK's own ImageIO agrees with PngPixelStats on generated payloads") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(20)
    val png  = Multimodal.pngFromDocuments(docs).collect()
    assert(png.nonEmpty)
    png.foreach { rec =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rec.payload))
      assert(img != null, s"ImageIO rejected media ${rec.media_id}")
      assert(img.getWidth === 7 && img.getHeight === 5)
      var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0; var luma = 0L
      for (y <- 0 until 5; x <- 0 until 7) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        peak = math.max(peak, math.max(r, math.max(g, b)))
        luma += 299L * r + 587L * g + 114L * b
      }
      val row = graft.plans.GraftHashOps.pngPixelStats(rec.payload)
      assert(row.getBoolean(0), "parser rejected an ImageIO-valid PNG")
      assert(row.getInt(1) === 7 && row.getInt(2) === 5 && row.getLong(3) === 35L)
      assert(row.getLong(4) === sr && row.getLong(5) === sg && row.getLong(6) === sb,
        s"channel sums disagree with ImageIO on media ${rec.media_id} (defilter/inflate bug?)")
      assert(row.getInt(7) === peak && row.getLong(8) === luma)
    }
  }

  test("png encoder really writes all five filter types (the decoder is exercised end to end)") {
    val p = Multimodal.pngBytes("all five png filters, every row a different one", 105)
    // walk chunks to the IDAT, inflate, read the leading filter byte of each row
    def be32(o: Int): Int =
      ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) | ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
    var off = 8
    var idat: Array[Byte] = null
    while (idat == null) {
      val len = be32(off)
      if (new String(p, off + 4, 4, "US-ASCII") == "IDAT") idat = p.slice(off + 8, off + 8 + len)
      off += 12 + len
    }
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat)
    val raw = new Array[Byte](5 * (1 + 21))
    var got = 0
    while (got < raw.length && !inf.finished()) got += inf.inflate(raw, got, raw.length - got)
    inf.end()
    assert(got === raw.length)
    val filters = (0 until 5).map(y => raw(y * 22) & 0xff)
    assert(filters === Seq(0, 1, 2, 3, 4), "rows must cycle None/Sub/Up/Average/Paeth")
  }

  test("png decode: malformed payloads report valid=false, never throw or lie") {
    val ok = Multimodal.pngBytes("hello world png fixture", 105)
    assert(graft.plans.GraftHashOps.pngPixelStats(ok).getBoolean(0))
    // re-sign a patched IHDR so the tampered FIELD (not the CRC) is
    // what the parser has to reject
    def patchIhdr(mut: Array[Byte] => Unit): Array[Byte] = {
      val b = ok.clone(); mut(b)
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 17) // IHDR type + 13 data bytes
      val v = crc.getValue
      b(29) = ((v >> 24) & 0xff).toByte; b(30) = ((v >> 16) & 0xff).toByte
      b(31) = ((v >> 8) & 0xff).toByte; b(32) = (v & 0xff).toByte
      b
    }
    val cases = Seq[Array[Byte]](
      Array.empty,
      ok.take(7),                                        // truncated signature
      ok.take(40),                                       // truncated mid-chunk
      { val b = ok.clone(); b(0) = 'X'.toByte; b },      // wrong magic
      { val b = ok.clone(); b(45) = (b(45) ^ 0x5a).toByte; b }, // flipped IDAT data byte → CRC fail
      patchIhdr(b => b(25) = 3.toByte),                  // palette color type (unsupported)
      patchIhdr(b => b(24) = 16.toByte),                 // 16-bit depth (unsupported)
      patchIhdr(b => b(28) = 1.toByte),                  // interlaced (unsupported)
      patchIhdr(b => b(23) = 100.toByte))                // height lies → inflate comes up short
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.pngPixelStats(p).getBoolean(0), s"accepted ${p.length} bytes")
    }
  }

  test("gif decode: the JDK's own ImageIO agrees with GifPixelStats on generated payloads") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(20)
    val gif  = Multimodal.gifFromDocuments(docs).collect()
    assert(gif.nonEmpty)
    gif.foreach { rec =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rec.payload))
      assert(img != null, s"ImageIO rejected media ${rec.media_id}")
      assert(img.getWidth === 7 && img.getHeight === 5)
      var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0; var luma = 0L
      for (y <- 0 until 5; x <- 0 until 7) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        peak = math.max(peak, math.max(r, math.max(g, b)))
        luma += 299L * r + 587L * g + 114L * b
      }
      val row = graft.plans.GraftHashOps.gifPixelStats(rec.payload)
      assert(row.getBoolean(0), "parser rejected an ImageIO-valid GIF")
      assert(row.getInt(1) === 7 && row.getInt(2) === 5 && row.getLong(3) === 35L)
      assert(row.getLong(4) === sr && row.getLong(5) === sg && row.getLong(6) === sb,
        s"channel sums disagree with ImageIO on media ${rec.media_id} (LZW/palette bug?)")
      assert(row.getInt(7) === peak && row.getLong(8) === luma)
    }
  }

  test("gif decode: ImageIO's own REAL-LZW encoder round-trips through the in-repo decoder") {
    // the generated corpus uses the fixed-width uncompressed-LZW
    // trick; this fixture forces the REAL decode paths — dictionary
    // growth past 9/10/11 bits and compressed multi-byte entries —
    // from an INDEPENDENT encoder (the JDK's GIF writer) on a 64x32
    // noisy indexed image
    val img = new java.awt.image.BufferedImage(64, 32, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 32; x <- 0 until 64) {
      val v = (x * 31 + y * 17 + (x * y) % 13) % 216
      img.setRGB(x, y, img.getColorModel.asInstanceOf[java.awt.image.IndexColorModel].getRGB(v))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos), "JDK has no GIF writer?")
    val payload = bos.toByteArray
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0; var luma = 0L
    for (y <- 0 until 32; x <- 0 until 64) {
      val rgb = back.getRGB(x, y)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      sr += r; sg += g; sb += b
      peak = math.max(peak, math.max(r, math.max(g, b)))
      luma += 299L * r + 587L * g + 114L * b
    }
    val row = graft.plans.GraftHashOps.gifPixelStats(payload)
    assert(row.getBoolean(0), "decoder rejected an ImageIO-written GIF")
    assert(row.getInt(1) === 64 && row.getInt(2) === 32 && row.getLong(3) === 2048L)
    assert(row.getLong(4) === sr && row.getLong(5) === sg && row.getLong(6) === sb,
      "channel sums disagree with ImageIO on its own GIF (dictionary-growth bug?)")
    assert(row.getInt(7) === peak && row.getLong(8) === luma)
  }

  test("gif decode: malformed payloads report valid=false, never throw or lie") {
    val ok = Multimodal.gifBytes("hello world gif fixture", 35)
    assert(graft.plans.GraftHashOps.gifPixelStats(ok).getBoolean(0))
    // layout: LSD packed at 10, GCT 13..780, image-descriptor packed
    // at 790, LZW min-code-size at 791
    val cases = Seq[Array[Byte]](
      Array.empty,
      ok.take(10),                                       // truncated LSD
      { val b = ok.clone(); b(0) = 'X'.toByte; b },      // wrong magic
      { val b = ok.clone(); b(10) = (b(10) & 0x7f).toByte; b }, // GCT flag off → no palette
      { val b = ok.clone(); b(786) = 8.toByte; b },      // image width lies vs logical screen
      { val b = ok.clone(); b(791) = 1.toByte; b },      // LZW min code size out of range
      ok.take(ok.length - 10))                           // truncated LZW stream
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.gifPixelStats(p).getBoolean(0), s"accepted ${p.length} bytes")
    }
  }

  test("jpeg decode: ImageIO agrees pixel-exact on generated flat-block payloads, stats match the text rule") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(20)
    val recs = Multimodal.jpegFromDocuments(docs).collect()
    val texts = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(recs.nonEmpty)
    recs.foreach { rec =>
      val text = texts(rec.media_id)
      val l    = math.min(64, text.length)
      val nb   = math.max(8, ((l + 7) / 8) * 8)
      def v(j: Int): Int = if (j < l) ((text.charAt(j) & 0x7f) * 7 + j) % 256 else 128
      // independent decoder: the JDK's ImageIO must reconstruct the
      // exact flat-block pixels (DC-only blocks are IDCT-exact)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rec.payload))
      assert(img != null, s"ImageIO rejected media ${rec.media_id}")
      assert(img.getWidth === 64 && img.getHeight === nb)
      // raster samples, not getRGB: getRGB pushes TYPE_BYTE_GRAY
      // through a gray->sRGB colorspace conversion
      for (j <- 0 until nb; yy <- 0 until 2; xx <- 0 until 2) {
        val px = img.getRaster.getSample((j % 8) * 8 + xx * 7, (j / 8) * 8 + yy * 7, 0)
        assert(px === v(j),
          s"ImageIO pixel disagrees with the flat-block rule at block $j on media ${rec.media_id}")
      }
      // the in-repo decoder's exact moments vs the text rule
      val row = graft.plans.GraftHashOps.jpegStats(rec.payload)
      assert(row.getBoolean(0), s"parser rejected its own encoder on media ${rec.media_id}")
      assert(row.getInt(1) === 64 && row.getInt(2) === nb)
      assert(row.getLong(3) === 64L * nb)
      val vs = (0 until nb).map(v)
      assert(row.getLong(4) === 64L * vs.sum, s"sum_r disagrees on media ${rec.media_id}")
      assert(row.getLong(5) === row.getLong(4) && row.getLong(6) === row.getLong(4))
      assert(row.getInt(7) === vs.max)
      assert(row.getLong(8) === 64L * 1000L * vs.sum)
    }
  }

  test("jpeg decode: ImageIO's own REAL encoder (quantizer + AC coefficients) round-trips within IDCT rounding") {
    // the generated corpus is DC-only; this fixture forces the full
    // coding layers — multi-category DC, real AC run/size symbols,
    // ZRL, a non-trivial quantization table, Annex-K-style Huffman
    // tables — from an INDEPENDENT encoder (the JDK's JPEG writer)
    // on a noisy 64x32 grayscale image. Both decoders then see the
    // identical coefficients, so any disagreement beyond IDCT
    // rounding (+-2/px) is an entropy/dequant bug
    val img = new java.awt.image.BufferedImage(64, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 32; x <- 0 until 64) {
      val v = (x * 31 + y * 17 + (x * y) % 29) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JDK has no JPEG writer?")
    val payload = bos.toByteArray
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val dec  = graft.plans.GraftHashOps.jpegDecode(payload)
    assert(dec != null, "decoder rejected an ImageIO-written baseline JPEG")
    assert(dec.width === 64 && dec.height === 32 && dec.planes.length === 1)
    var worst = 0
    var sumAbs = 0L
    for (y <- 0 until 32; x <- 0 until 64) {
      val a = back.getRaster.getSample(x, y, 0) // raw sample, no gray->sRGB
      val b = dec.planes(0)(y * dec.padW + x) & 0xff
      val d = math.abs(a - b)
      worst = math.max(worst, d)
      sumAbs += d
    }
    assert(worst <= 2, s"per-pixel drift $worst exceeds IDCT rounding (entropy/dequant bug)")
    assert(sumAbs.toDouble / (64 * 32) < 0.6, s"mean abs drift ${sumAbs.toDouble / 2048} too high")
  }

  test("jpeg decode: malformed payloads report valid=false, never throw or lie") {
    val ok = Multimodal.jpegBytes("hello world jpeg fixture", 64)
    assert(graft.plans.GraftHashOps.jpegStats(ok).getBoolean(0))
    // generated layout: SOI(0) DQT(2, entries at 7..70) SOF0(71:
    // marker 71-72, len 73-74, P 75, H 76-77, W 78-79, Nf 80,
    // comp 81-83) DHT(84) SOS(135) entropy(145..)
    val cases = Seq[Array[Byte]](
      Array.empty,
      ok.take(60),                                        // truncated mid-DQT
      ok.take(ok.length - 3),                             // truncated entropy + EOI
      { val b = ok.clone(); b(1) = 0xd0.toByte; b },      // not SOI
      { val b = ok.clone(); b(72) = 0xc2.toByte; b },     // progressive SOF2: out of scope
      { val b = ok.clone(); b(77) = 0.toByte; b(76) = 0.toByte; b }, // height 0
      { val b = ok.clone(); b(82) = 0x22.toByte; b },     // 2x2 subsampling: out of scope
      { val b = ok.clone(); b(7) = 0.toByte; b },         // zero quant entry
      ok :+ 0.toByte,                                     // trailing garbage after EOI
      { val b = ok.clone(); b(76) = 0.toByte; b(77) = 16.toByte; b }) // height lies: entropy/framing desync
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.jpegStats(p).getBoolean(0), s"accepted ${p.length} bytes")
    }
  }

  test("wav decode: malformed payloads report valid=false, never throw or lie") {
    val ok = Multimodal.wavBytes("hello world", 96)
    assert(graft.plans.GraftHashOps.wavPcmStats(ok).getBoolean(0))
    val cases = Seq[Array[Byte]](
      Array.empty,
      ok.take(43),                                      // truncated header
      { val b = ok.clone(); b(0) = 'X'.toByte; b },     // wrong RIFF magic
      { val b = ok.clone(); b(20) = 3; b },             // non-PCM format code
      { val b = ok.clone(); b(34) = 8; b },             // 8-bit (unsupported layout)
      { val b = ok.clone(); b(40) = (b(40) + 64).toByte; b }) // dataSize past payload
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.wavPcmStats(p).getBoolean(0), s"accepted ${p.length} bytes")
    }
  }

  test("utf8 decode: strict validator agrees with the JDK charset decoder and the mapping rule") {
    import spark.implicits._
    val docs  = Tables.documents(spark, sf).limit(100)
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val recs  = Multimodal.utf8FromDocuments(docs).collect()
    assert(recs.nonEmpty)
    recs.foreach { rec =>
      // JDK strict decode must succeed and agree on codepoint count
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val s = dec.decode(java.nio.ByteBuffer.wrap(rec.payload)).toString
      val row = graft.plans.GraftHashOps.utf8Stats(rec.payload)
      assert(row.getBoolean(0), s"validator rejected JDK-valid UTF-8 on media ${rec.media_id}")
      assert(row.getLong(2) === s.codePointCount(0, s.length).toLong)
      // class counts per the text mapping rule
      val t = texts(rec.media_id).take(200)
      val vow = t.count(c => "aeiou".contains(c))
      val dig = t.count(c => c >= '0' && c <= '9')
      val upp = t.count(c => c >= 'A' && c <= 'Z')
      assert(row.getLong(4) === vow.toLong && row.getLong(5) === dig.toLong && row.getLong(6) === upp.toLong,
        s"class counts disagree on media ${rec.media_id}")
      assert(row.getLong(1) === rec.payload.length.toLong)
    }
  }

  test("utf8 decode: RFC 3629 malformed vectors are each rejected") {
    import graft.plans.GraftHashOps.utf8Stats
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    assert(utf8Stats(b('o', 'k')).getBoolean(0))
    assert(utf8Stats(b(0xf4, 0x8f, 0xbf, 0xbf)).getBoolean(0), "U+10FFFF itself is valid")
    val cases = Seq(
      "stray continuation lead" -> b(0x80),
      "overlong 2-byte C0 80"   -> b(0xc0, 0x80),
      "overlong 2-byte C1 BF"   -> b(0xc1, 0xbf),
      "overlong 3-byte E0 80 80" -> b(0xe0, 0x80, 0x80),
      "surrogate ED A0 80"      -> b(0xed, 0xa0, 0x80),
      "past Unicode F4 90 80 80" -> b(0xf4, 0x90, 0x80, 0x80),
      "invalid lead F8"         -> b(0xf8, 0x80, 0x80, 0x80, 0x80),
      "truncated 2-byte tail"   -> b('a', 0xc3),
      "truncated 4-byte tail"   -> b(0xf0, 0x9f, 0x98),
      "bad continuation byte"   -> b(0xc3, 0x41))
    cases.foreach { case (name, p) =>
      assert(!utf8Stats(p).getBoolean(0), s"accepted: $name")
    }
  }

  test("base64 decode: strict decoder round-trips the JDK encoder and rejects non-canonical forms") {
    import graft.plans.GraftHashOps.base64Stats
    val rnd = new java.util.Random(64L)
    (0 until 60).foreach { i =>
      val data = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(data)
      val enc = java.util.Base64.getEncoder.encode(data)
      val row = base64Stats(enc)
      assert(row.getBoolean(0), s"rejected a JDK encoding (case $i)")
      assert(row.getLong(1) === data.length.toLong)
      assert(row.getLong(2) === data.map(b => (b & 0xff).toLong).sum)
      assert(row.getInt(3) === (if (data.isEmpty) 0 else data.map(_ & 0xff).max))
    }
    def s(x: String) = x.getBytes("US-ASCII")
    val badCases = Seq(
      "length not multiple of 4" -> s("QUJD QQ"),
      "bad alphabet char"        -> s("QUJ-"),
      "padding mid-stream"       -> s("QQ==QUJD"),
      "all padding"              -> s("===="),
      "non-canonical low bits ==" -> s("QR=="), // R=17, low 4 bits nonzero
      "non-canonical low bits ="  -> s("QUF="), // F=5, low 2 bits nonzero
      "pad in third slot only"    -> s("QU=B"))
    badCases.foreach { case (name, p) =>
      assert(!base64Stats(p).getBoolean(0), s"accepted: $name")
    }
    // canonical forms of the same prefixes ARE accepted
    assert(base64Stats(s("QQ==")).getBoolean(0) && base64Stats(s("QUE=")).getBoolean(0))
  }

  test("deflate decode: in-repo inflate is byte-equal to the JDK Inflater on corpus and adversarial streams") {
    import spark.implicits._
    def jdkInflate(p: Array[Byte]): Array[Byte] = {
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(p)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput()) throw new IllegalStateException("truncated")
        bos.write(buf, 0, k)
      }
      inf.end()
      bos.toByteArray
    }
    // corpus at all three levels (stored / fastest / best)
    val texts = Tables.documents(spark, sf).select($"text").as[String].take(100)
    texts.foreach { t =>
      Seq(0, 1, 9).foreach { level =>
        val p = Multimodal.deflateBytes(t, 512, level)
        val ours = graft.plans.GraftHashOps.inflateRaw(p, 0, 1 << 20)
        assert(ours != null, s"rejected a JDK level-$level stream")
        assert(java.util.Arrays.equals(ours, jdkInflate(p)), s"byte mismatch at level $level")
      }
    }
    // adversarial: long overlapping LZ77 matches, high-entropy bytes,
    // and block-type mixes from a deterministic PRNG
    val rnd = new java.util.Random(20260816L)
    (0 until 50).foreach { i =>
      val data: Array[Byte] = i % 3 match {
        case 0 => ("abc" * (1 + rnd.nextInt(2000))).getBytes("US-ASCII") // dist-3 overlap runs
        case 1 => { val b = new Array[Byte](1 + rnd.nextInt(6000)); rnd.nextBytes(b); b } // stored-leaning
        case _ => (0 until 1 + rnd.nextInt(3000)).map(k => ('a' + (k % 7)).toChar).mkString.getBytes("US-ASCII")
      }
      val defl = new java.util.zip.Deflater(rnd.nextInt(10), true)
      defl.setInput(data); defl.finish()
      val zb = new Array[Byte](data.length + 128)
      var zl = 0
      while (!defl.finished()) zl += defl.deflate(zb, zl, zb.length - zl)
      defl.end()
      val p = java.util.Arrays.copyOf(zb, zl)
      val ours = graft.plans.GraftHashOps.inflateRaw(p, 0, 1 << 24)
      assert(ours != null && java.util.Arrays.equals(ours, data), s"mismatch on adversarial case $i")
    }
  }

  test("deflate decode: hand-built RFC 1951 vectors (fixed Huffman, stored, malformed)") {
    import graft.plans.GraftHashOps.inflateRaw
    // LSB-first bit writer; Huffman codes enter MSB-of-code first
    class BitW {
      val bos = new java.io.ByteArrayOutputStream()
      var acc = 0; var nb = 0
      def bit(b: Int): Unit = { acc |= (b & 1) << nb; nb += 1; if (nb == 8) { bos.write(acc); acc = 0; nb = 0 } }
      def bits(v: Int, n: Int): Unit = (0 until n).foreach(i => bit((v >> i) & 1))      // field: LSB first
      def code(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach(i => bit((v >> i) & 1)) // code: MSB first
      def done(): Array[Byte] = { if (nb > 0) { bos.write(acc) }; bos.toByteArray }
    }
    def fixedLit(sym: Int): (Int, Int) =
      if (sym < 144) (0x30 + sym, 8)
      else if (sym < 256) (0x190 + sym - 144, 9)
      else if (sym < 280) (sym - 256, 7)
      else (0xc0 + sym - 280, 8)
    // fixed-Huffman block: "AB" + a length-3 distance-2 match -> "ABABA"
    val w = new BitW
    w.bits(1, 1); w.bits(1, 2) // BFINAL, BTYPE=01
    Seq('A'.toInt, 'B'.toInt).foreach { s => val (c, n) = fixedLit(s); w.code(c, n) }
    val (l257, n257) = fixedLit(257) // length 3, no extra bits
    w.code(l257, n257)
    w.code(1, 5)                 // distance symbol 1 = distance 2
    val (eob, neob) = fixedLit(256)
    w.code(eob, neob)
    val got = inflateRaw(w.done(), 0, 1 << 10)
    assert(got != null && new String(got, "US-ASCII") === "ABABA",
      "fixed-Huffman + overlapping back-reference must yield ABABA")
    // stored block with the ones'-complement check
    val sw = new BitW
    sw.bits(1, 1); sw.bits(0, 2)
    val sb = sw.done() // aligns to byte
    val stored = sb ++ Array[Byte](3, 0, (~3 & 0xff).toByte, 0xff.toByte, 'x'.toByte, 'y'.toByte, 'z'.toByte)
    val sgot = inflateRaw(stored, 0, 1 << 10)
    assert(sgot != null && new String(sgot, "US-ASCII") === "xyz")
    // malformed: NLEN lie
    val badNlen = stored.clone(); badNlen(3) = 7
    assert(inflateRaw(badNlen, 0, 1 << 10) == null, "accepted a lying NLEN")
    // malformed: reserved block type 3
    val rw = new BitW; rw.bits(1, 1); rw.bits(3, 2); rw.bits(0, 5)
    assert(inflateRaw(rw.done(), 0, 1 << 10) == null, "accepted BTYPE=3")
    // malformed: distance reaching before output start
    val dw = new BitW
    dw.bits(1, 1); dw.bits(1, 2)
    dw.code(l257, n257) // length 3 as the FIRST symbol
    dw.code(0, 5)       // distance 1 with no output yet
    dw.code(eob, neob)
    assert(inflateRaw(dw.done(), 0, 1 << 10) == null, "accepted a pre-start distance")
    // malformed: truncated mid-stream and trailing garbage
    val full = Multimodal.deflateBytes("truncation fixture text for deflate", 512, 9)
    assert(inflateRaw(java.util.Arrays.copyOf(full, full.length - 2), 0, 1 << 10) == null)
    assert(inflateRaw(full ++ Array[Byte](0x55), 0, 1 << 10) == null, "accepted trailing garbage")
    assert(inflateRaw(Array.emptyByteArray, 0, 1 << 10) == null)
    // oversubscribed dynamic code: 19 code-length entries all length 1
    val ow = new BitW
    ow.bits(1, 1); ow.bits(2, 2)       // BFINAL, BTYPE=10
    ow.bits(0, 5); ow.bits(0, 5); ow.bits(15, 4) // HLIT=257, HDIST=1, HCLEN=19
    (0 until 19).foreach(_ => ow.bits(1, 3))     // every CL code length 1 -> Kraft > 1
    assert(inflateRaw(ow.done(), 0, 1 << 10) == null, "accepted an oversubscribed code")
  }

  test("targz decode: the JDK's own gzip reader agrees with TarGzStats on generated payloads") {
    import spark.implicits._
    val docs  = Tables.documents(spark, sf).limit(20)
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val recs  = Multimodal.targzFromDocuments(docs).collect()
    assert(recs.nonEmpty)
    recs.foreach { rec =>
      // gzip layer cross-check: the JDK reader must accept the
      // payload and yield a block-aligned tar
      val gis = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(rec.payload))
      val tar = gis.readAllBytes()
      assert(tar.length % 512 === 0 && tar.length >= 1024)
      val text = texts(rec.media_id)
      val n = math.min(256, text.length)
      val expEntries = if (n == 0) 1 else (n + 99) / 100
      val row = graft.plans.GraftHashOps.targzStats(rec.payload)
      assert(row.getBoolean(0), s"parser rejected its own archive on media ${rec.media_id}")
      assert(row.getInt(1) === expEntries)
      assert(row.getLong(2) === n.toLong)
      assert(row.getLong(3) === text.take(n).map(c => (c & 0xff).toLong).sum,
        s"content byte-sum disagrees on media ${rec.media_id}")
      assert(row.getLong(4) === (if (n == 0) 0L else math.min(n, 100).toLong))
    }
  }

  test("targz decode: RFC 1952 optional header fields are skipped correctly") {
    val plain = Multimodal.targzBytes("optional gzip fields fixture text", 256)
    val tar   = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(plain)).readAllBytes()
    // rebuild the member with FEXTRA+FNAME+FCOMMENT+FHCRC all set
    val bos = new java.io.ByteArrayOutputStream()
    val hdr = new java.io.ByteArrayOutputStream()
    Seq(0x1f, 0x8b, 8, 2 | 4 | 8 | 16, 0, 0, 0, 0, 0, 255).foreach(hdr.write)
    hdr.write(3); hdr.write(0); hdr.write('x'); hdr.write('y'); hdr.write('z') // FEXTRA len 3
    "name.tar".getBytes("US-ASCII").foreach(b => hdr.write(b)); hdr.write(0)   // FNAME
    "a comment".getBytes("US-ASCII").foreach(b => hdr.write(b)); hdr.write(0)  // FCOMMENT
    val hcrc = new java.util.zip.CRC32(); hcrc.update(hdr.toByteArray)
    hdr.write((hcrc.getValue & 0xff).toInt); hdr.write(((hcrc.getValue >> 8) & 0xff).toInt) // FHCRC
    bos.write(hdr.toByteArray)
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    defl.setInput(tar); defl.finish()
    val zb = new Array[Byte](tar.length + 64)
    var zl = 0
    while (!defl.finished()) zl += defl.deflate(zb, zl, zb.length - zl)
    defl.end()
    bos.write(zb, 0, zl)
    val crc = new java.util.zip.CRC32(); crc.update(tar)
    def le32(v: Long): Unit = (0 until 4).foreach(k => bos.write(((v >> (8 * k)) & 0xff).toInt))
    le32(crc.getValue); le32(tar.length.toLong)
    val row  = graft.plans.GraftHashOps.targzStats(bos.toByteArray)
    val base = graft.plans.GraftHashOps.targzStats(plain)
    assert(row.getBoolean(0), "rejected a member with optional fields")
    (1 to 4).foreach(i => assert(row.get(i, null) === base.get(i, null)))
  }

  test("targz decode: malformed payloads report valid=false, never throw or lie") {
    val ok = Multimodal.targzBytes("hello world targz fixture with enough text", 256)
    assert(graft.plans.GraftHashOps.targzStats(ok).getBoolean(0))
    // tamper INSIDE the tar, then re-gzip with a CONSISTENT trailer:
    // the gzip layer passes and the tar checks must catch it
    def regz(mutate: Array[Byte] => Unit): Array[Byte] = {
      val tar = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(ok)).readAllBytes()
      mutate(tar)
      val bos = new java.io.ByteArrayOutputStream()
      val gz  = new java.util.zip.GZIPOutputStream(bos)
      gz.write(tar); gz.close()
      bos.toByteArray
    }
    // re-sign a mutated header so the MUTATED field (not the
    // checksum) is what the decoder has to catch
    def resign(t: Array[Byte]): Unit = {
      java.util.Arrays.fill(t, 148, 156, ' '.toByte)
      var s = 0L
      (0 until 512).foreach(i => s += t(i) & 0xff)
      System.arraycopy("%06o".format(s).getBytes("US-ASCII"), 0, t, 148, 6)
      t(154) = 0; t(155) = ' '.toByte
    }
    val cases = Seq[Array[Byte]](
      Array.empty,
      ok.take(ok.length - 3),                                  // truncated trailer
      { val b = ok.clone(); b(0) = 'X'.toByte; b },            // wrong magic
      { val b = ok.clone(); b(3) = (b(3) | 0x20).toByte; b },  // reserved FLG bit
      { val b = ok.clone(); b(12) = (b(12) ^ 0x55).toByte; b }, // flipped deflate byte -> CRC fail
      { val b = ok.clone(); b(b.length - 2) = (b(b.length - 2) + 1).toByte; b }, // ISIZE lies
      regz(t => t(148) = (t(148) + 1).toByte),                 // tar header checksum lies
      regz { t => t(126) = '7'.toByte; resign(t) },            // tar size field lies (re-signed)
      regz { t => t(257) = 'X'.toByte; resign(t) },            // not ustar (re-signed)
      regz { t => t(156) = '5'.toByte; resign(t) })            // directory entry (re-signed)
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.targzStats(p).getBoolean(0), s"accepted ${p.length} bytes")
    }
  }

  test("zip decode: the JDK's own ZipInputStream agrees with ZipArchiveStats on generated payloads") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(20)
    val recs = Multimodal.zipFromDocuments(docs).collect()
    assert(recs.nonEmpty)
    recs.foreach { rec =>
      val zis = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(rec.payload))
      var n = 0; var total = 0L; var sum = 0L; var maxE = 0L
      var e = zis.getNextEntry
      val names = scala.collection.mutable.ArrayBuffer[String]()
      while (e != null) {
        val content = zis.readAllBytes()
        names += e.getName
        n += 1; total += content.length; maxE = math.max(maxE, content.length.toLong)
        content.foreach(b => sum += b & 0xff)
        e = zis.getNextEntry
      }
      assert(names.toSeq === Seq("a.txt", "b.txt"))
      val row = graft.plans.GraftHashOps.zipStats(rec.payload)
      assert(row.getBoolean(0), s"parser rejected a JDK-valid ZIP on media ${rec.media_id}")
      assert(row.getInt(1) === n)
      assert(row.getLong(2) === total, s"total bytes disagree on media ${rec.media_id}")
      assert(row.getLong(3) === sum, s"content byte-sum disagrees on media ${rec.media_id}")
      assert(row.getLong(4) === maxE)
    }
  }

  test("zip decode: stored-method entries decode through the uncompressed path") {
    val content = "stored entry content, no deflate".getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val e   = new java.util.zip.ZipEntry("s.txt")
    e.setMethod(java.util.zip.ZipEntry.STORED)
    e.setSize(content.length)
    e.setCompressedSize(content.length)
    val crc = new java.util.zip.CRC32(); crc.update(content)
    e.setCrc(crc.getValue)
    e.setTime(0L)
    zos.putNextEntry(e); zos.write(content); zos.closeEntry(); zos.close()
    val row = graft.plans.GraftHashOps.zipStats(bos.toByteArray)
    assert(row.getBoolean(0), "rejected a stored-method archive")
    assert(row.getInt(1) === 1 && row.getLong(2) === content.length.toLong)
    assert(row.getLong(3) === content.map(b => (b & 0xff).toLong).sum)
  }

  test("zip decode: malformed payloads report valid=false, never throw or lie") {
    val ok = Multimodal.zipBytes("hello world zip fixture with enough text to split", 256)
    assert(graft.plans.GraftHashOps.zipStats(ok).getBoolean(0))
    // first entry's data offset from ITS local header (30 + name + extra)
    def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val dataOff = 30 + le16(ok, 26) + le16(ok, 28)
    val cases = Seq[Array[Byte]](
      Array.empty,
      ok.take(ok.length - 3),                                // truncated EOCD
      { val b = ok.clone(); b(dataOff + 2) = (b(dataOff + 2) ^ 0x55).toByte; b }, // flipped data byte -> CRC/inflate fail
      { val b = ok.clone(); b(b.length - 12) = 9; b },       // EOCD entry count lies
      { val b = ok.clone(); b(b.length - 6) = (b(b.length - 6) + 1).toByte; b }) // CD offset lies
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.zipStats(p).getBoolean(0), s"accepted ${p.length} bytes")
    }
    // an unsupported compression method in the central directory is
    // rejected, not guessed at: find the first CD header and poke it
    val sig = Array[Byte](0x50, 0x4b, 1, 2)
    val cd  = ok.indices.find(i => i + 4 <= ok.length && sig.indices.forall(k => ok(i + k) == sig(k))).get
    val badMethod = ok.clone(); badMethod(cd + 10) = 99.toByte
    assert(!graft.plans.GraftHashOps.zipStats(badMethod).getBoolean(0), "accepted method 99")
    // a usize lie in the central directory fails the exact-size rule
    val badSize = ok.clone(); badSize(cd + 24) = (badSize(cd + 24) + 1).toByte
    assert(!graft.plans.GraftHashOps.zipStats(badSize).getBoolean(0), "accepted a lying usize")
  }

  test("qoi decode: round-trips the reference-algorithm encoder on generated payloads, all op types exercised") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(200)
    val recs = Multimodal.qoiFromDocuments(docs).collect()
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(recs.nonEmpty)
    // walk the chunk stream to census op types (chunk lengths are
    // fully determined by the tag byte)
    val ops = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    recs.foreach { rec =>
      var off = 14
      while (off < rec.payload.length - 8) {
        val b0 = rec.payload(off) & 0xff
        if (b0 == 0xfe) { ops("rgb") += 1; off += 4 }
        else if (b0 == 0xff) { ops("rgba") += 1; off += 5 }
        else (b0 >> 6) match {
          case 0 => ops("index") += 1; off += 1
          case 1 => ops("diff") += 1; off += 1
          case 2 => ops("luma") += 1; off += 2
          case _ => ops("run") += 1; off += 1
        }
      }
      assert(off === rec.payload.length - 8, s"chunk walk misaligned on media ${rec.media_id}")
      // decoded moments must equal the text-derived expectation
      val text = texts(rec.media_id)
      val l = math.min(120, text.length)
      def ch(j: Int): Int = if (l == 0) 0 else text.charAt(j % l) & 0x7f
      var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0
      (0 until 40).foreach { p =>
        val r = ch(3 * p); val g = ch(3 * p + 1); val b = ch(3 * p + 2)
        sr += r; sg += g; sb += b
        peak = math.max(peak, math.max(r, math.max(g, b)))
      }
      val row = graft.plans.GraftHashOps.qoiPixelStats(rec.payload)
      assert(row.getBoolean(0), s"decoder rejected its own encoder on media ${rec.media_id}")
      assert(row.getInt(1) === 8 && row.getInt(2) === 5 && row.getLong(3) === 40L)
      assert(row.getLong(4) === sr && row.getLong(5) === sg && row.getLong(6) === sb,
        s"channel sums disagree with the text rule on media ${rec.media_id}")
      assert(row.getInt(7) === peak)
    }
    // real text must drive the stateful encoder paths: index hits
    // (recurring colors), green-anchored deltas, literals. RUN and
    // DIFF need consecutive triples equal / within ±2 per channel —
    // rare in natural text — so those paths get constructed fixtures
    // below.
    Seq("index", "luma", "rgb").foreach { k =>
      assert(ops(k) > 0, s"op $k never emitted across the corpus — encoder not exercising the decoder")
    }
    def census(payload: Array[Byte]): Map[String, Int] = {
      val m = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
      var off = 14
      while (off < payload.length - 8) {
        val b0 = payload(off) & 0xff
        if (b0 == 0xfe) { m("rgb") += 1; off += 4 }
        else if (b0 == 0xff) { m("rgba") += 1; off += 5 }
        else (b0 >> 6) match {
          case 0 => m("index") += 1; off += 1
          case 1 => m("diff") += 1; off += 1
          case 2 => m("luma") += 1; off += 2
          case _ => m("run") += 1; off += 1
        }
      }
      m.toMap.withDefaultValue(0)
    }
    // ascending triples "AAABBBCCC...": every step is (+1,+1,+1) -> OP_DIFF
    val diffPayload = Multimodal.qoiBytes((0 until 40).flatMap(p => Seq.fill(3)(('A' + p).toChar)).mkString, 120)
    assert(census(diffPayload)("diff") === 39, "ascending-triple image must be 39 DIFF ops")
    val drow = graft.plans.GraftHashOps.qoiPixelStats(diffPayload)
    assert(drow.getBoolean(0) && drow.getLong(4) === (0 until 40).map(p => ('A' + p).toLong).sum)
    // single-char text: every pixel is (97,97,97) -> one literal,
    // then a 39-pixel run; decode must agree exactly
    val runPayload = Multimodal.qoiBytes("a", 120)
    assert(census(runPayload)("run") > 0, "single-char image must emit OP_RUN")
    val rrow = graft.plans.GraftHashOps.qoiPixelStats(runPayload)
    assert(rrow.getBoolean(0) && rrow.getLong(4) === 97L * 40 && rrow.getInt(7) === 97)
  }

  test("qoi decode: hand-built vector exercises OP_RGBA and the alpha-keyed hash cache") {
    // 2x2 RGBA image: RGB(10,20,30) -> RGBA(10,20,30,128) ->
    // INDEX(slot of the FIRST pixel, alpha 255) -> LUMA delta.
    // hash(10,20,30,255) = (30+100+210+2805) & 63 = 9
    // hash(10,20,30,128) = (30+100+210+1408) & 63 = 20
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("qoif".getBytes("US-ASCII"), 0, 4)
    Seq(0, 0, 0, 2, 0, 0, 0, 2).foreach(bos.write) // 2x2 BE dims
    bos.write(4); bos.write(0)                     // RGBA, sRGB
    Seq(0xfe, 10, 20, 30).foreach(bos.write)       // OP_RGB
    Seq(0xff, 10, 20, 30, 128).foreach(bos.write)  // OP_RGBA (alpha change)
    bos.write(9)                                   // OP_INDEX -> (10,20,30,255)
    bos.write(0x80 | (5 + 32)); bos.write(((2 + 8) << 4) | (7 + 8)) // LUMA dg=5 dr=7 db=12
    (0 until 7).foreach(_ => bos.write(0)); bos.write(1)
    val row = graft.plans.GraftHashOps.qoiPixelStats(bos.toByteArray)
    assert(row.getBoolean(0), "rejected a spec-valid RGBA stream")
    assert(row.getInt(1) === 2 && row.getInt(2) === 2)
    // pixels: (10,20,30) x3, then (17,25,42)
    assert(row.getLong(4) === 10L * 3 + 17)
    assert(row.getLong(5) === 20L * 3 + 25)
    assert(row.getLong(6) === 30L * 3 + 42)
    assert(row.getInt(7) === 42)
  }

  test("qoi decode: malformed payloads report valid=false, never throw or lie") {
    val ok = Multimodal.qoiBytes("hello world qoi fixture text", 120)
    assert(graft.plans.GraftHashOps.qoiPixelStats(ok).getBoolean(0))
    def tiny(ops: Seq[Int], w: Int = 2, h: Int = 2, marker: Boolean = true): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("qoif".getBytes("US-ASCII"), 0, 4)
      Seq(0, 0, 0, w, 0, 0, 0, h).foreach(bos.write)
      bos.write(3); bos.write(0)
      ops.foreach(bos.write)
      if (marker) { (0 until 7).foreach(_ => bos.write(0)); bos.write(1) }
      bos.toByteArray
    }
    val cases = Seq[Array[Byte]](
      Array.empty,
      ok.take(13),                                      // truncated header
      { val b = ok.clone(); b(0) = 'X'.toByte; b },     // wrong magic
      { val b = ok.clone(); b(12) = 2; b },             // channels=2
      { val b = ok.clone(); b(b.length - 1) = 2; b },   // wrong end marker
      ok ++ Array(0.toByte),                            // trailing byte
      tiny(Seq(0xc0 | 61)),                             // run 62 overflows 4 px
      tiny(Seq(0xfe, 1, 2)),                            // truncated RGB chunk
      tiny(Seq(0xfe, 1, 2, 3)),                         // stream ends at 1 of 4 px
      tiny(Seq(0xfe, 1, 2, 3, 0xc0 | 3)))               // 5 px for a 4 px image
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.qoiPixelStats(p).getBoolean(0), s"accepted ${p.length} bytes")
    }
    // a zero dimension is malformed even with an empty stream
    assert(!graft.plans.GraftHashOps.qoiPixelStats(tiny(Seq.empty, w = 0, h = 2)).getBoolean(0))
  }

  test("g711 decode: expansion tables hit the published ITU anchor values") {
    import graft.plans.GraftHashOps.{alawToLinear, mulawToLinear}
    // µ-law: 0x00 is max negative, 0x80 max positive, 0x7F/0xFF both zero
    assert(mulawToLinear(0x00) === -32124)
    assert(mulawToLinear(0x80) === 32124)
    assert(mulawToLinear(0x7f) === 0)
    assert(mulawToLinear(0xff) === 0)
    // A-law: 0x55 is -8 (smallest magnitude), 0x2A max negative 32256
    assert(alawToLinear(0x55) === -8)
    assert(alawToLinear(0xd5) === 8)
    assert(alawToLinear(0x2a) === -32256)
    assert(alawToLinear(0xaa) === 32256)
    // both expansions are odd-symmetric under their sign-bit flip
    (0 until 128).foreach { i =>
      assert(mulawToLinear(i) === -mulawToLinear(i | 0x80), s"mu $i")
      assert(alawToLinear(i | 0x80) === -alawToLinear(i), s"a $i")
    }
  }

  test("g711 decode: the JDK's own ULAW/ALAW converters agree with WavG711Stats") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(20)
    Seq("mulaw" -> 7, "alaw" -> 6).foreach { case (law, tag) =>
      val recs = Multimodal.g711FromDocuments(docs, law).collect()
      assert(recs.nonEmpty)
      recs.foreach { rec =>
        val in  = new java.io.ByteArrayInputStream(rec.payload)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(in)
        val fmt = ais.getFormat
        val expEnc =
          if (law == "mulaw") javax.sound.sampled.AudioFormat.Encoding.ULAW
          else javax.sound.sampled.AudioFormat.Encoding.ALAW
        assert(fmt.getEncoding === expEnc, s"media ${rec.media_id}")
        assert(fmt.getSampleRate === 8000f && fmt.getChannels === 1 && fmt.getSampleSizeInBits === 8)
        // JDK-converted linear PCM must match our expansion exactly
        val pcmFmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, ais)
        val buf = pcm.readAllBytes()
        val jdk = (0 until buf.length / 2).map { i =>
          ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
        }
        val row = graft.plans.GraftHashOps.g711Stats(rec.payload)
        assert(row.getBoolean(0), s"parser rejected a JDK-valid $law WAV")
        assert(row.getInt(1) === tag)
        assert(row.getLong(3) === jdk.length.toLong)
        if (jdk.nonEmpty) {
          assert(row.getInt(4) === jdk.map(math.abs).max, s"$law peak disagrees with the JDK codec")
          assert(row.getLong(5) === jdk.map(_.toLong).sum, s"$law sum disagrees with the JDK codec")
          assert(row.getLong(6) === jdk.map(s => s.toLong * s).sum, s"$law sumsq disagrees")
        }
      }
    }
  }

  test("g711 decode: malformed payloads report valid=false, never throw or lie") {
    val ok = Multimodal.g711Bytes("hello world g711 fixture", 96, 7)
    assert(graft.plans.GraftHashOps.g711Stats(ok).getBoolean(0))
    val cases = Seq[Array[Byte]](
      Array.empty,
      ok.take(57),                                      // truncated header
      { val b = ok.clone(); b(0) = 'X'.toByte; b },     // wrong RIFF magic
      { val b = ok.clone(); b(20) = 1; b },             // PCM tag in the non-PCM layout
      { val b = ok.clone(); b(34) = 16; b },            // 16-bit (G.711 is 8)
      { val b = ok.clone(); b(22) = 2; b },             // stereo
      { val b = ok.clone(); b(46) = (b(46) + 1).toByte; b }, // fact count != data size
      { val b = ok.clone(); b(54) = (b(54) + 64).toByte; b }) // dataSize past payload
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.g711Stats(p).getBoolean(0), s"accepted ${p.length} bytes")
    }
    // a PCM16 WAV is not a G.711 WAV and vice versa
    assert(!graft.plans.GraftHashOps.g711Stats(Multimodal.wavBytes("hello", 96)).getBoolean(0))
    assert(!graft.plans.GraftHashOps.wavPcmStats(ok).getBoolean(0))
  }

  test("binary chunkDedupStats: counts bounded by payload size, exact dups share every chunk") {
    import spark.implicits._
    val docs  = Tables.documents(spark, sf)
    val media = Multimodal.mediaFromDocuments(docs).toDF()
    val stats = Multimodal.chunkDedupStats(media, chunkBytes = 64)
    assert(stats.count() === docs.count())
    val sized = stats.join(docs.select($"doc_id".as("media_id"), octet_length($"text").as("nb")), "media_id")
    assert(sized.filter($"n_chunks" =!= ceil($"nb" / lit(64.0)).cast("long")).count() === 0,
      "chunk count != ceil(bytes/64)")
    assert(sized.filter($"distinct_chunks" > $"n_chunks" || $"shared_chunks" > $"n_chunks").count() === 0)
    // a byte-identical duplicate pair must report every chunk shared
    val dupPair = docs.groupBy($"text").agg(collect_list($"doc_id").as("ids"), count(lit(1)).as("c"))
      .filter($"c" >= 2).select(explode($"ids").as("media_id")).limit(2)
    if (dupPair.count() == 2)
      assert(stats.join(dupPair, "media_id").filter($"shared_chunks" =!= $"n_chunks").count() === 0,
        "byte-identical duplicates must share all chunks")
  }

  test("binary near-dup: identical payloads at distance 0, fixture pairs banded-exact") {
    import spark.implicits._
    // two byte-identical payloads + one unrelated: exactly the (1,2)
    // pair at hamming distance 0
    val a = ("abcdefgh" * 20).getBytes("UTF-8")
    val c = (0 until 160).map(i => ((i * 37 + 11) % 96 + 32).toChar).mkString.getBytes("UTF-8")
    val media = Seq((1L, a), (2L, a), (3L, c)).toDF("media_id", "payload")
    val got = Multimodal.binaryNearDup(media).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq === Seq((1L, 2L, 0L)))
    // fixture: pairs exist (the corpus has near-dup docs) and every
    // distance respects the cut
    val fx = Multimodal.binaryNearDup(
      Multimodal.mediaFromDocuments(Tables.documents(spark, sf)).toDF())
    assert(fx.count() > 0)
    assert(fx.filter($"dist" > 4).count() === 0)
  }

  test("format sniffing reads real magic bytes: every magic detected, unknowns untouched") {
    import spark.implicits._
    // synthetic payloads: one per magic, plus a magic-free payload
    val rows = Multimodal.Magics.zipWithIndex.map { case ((name, magic), i) =>
      (i.toLong, magic ++ s"body-$name".getBytes("UTF-8"), name, magic.length)
    } :+ ((99L, "plain text payload".getBytes("UTF-8"), "unknown", 0))
    val df  = rows.map { case (id, p, _, _) => (id, p) }.toDF("media_id", "payload")
    val got = Multimodal.sniffFormat(df).collect().map(r =>
      r.getAs[Long]("media_id") -> ((r.getAs[String]("fmt"), r.getAs[Long]("n_bytes"), r.getAs[Long]("body_bytes")))).toMap
    rows.foreach { case (id, p, wantFmt, hdr) =>
      val (fmt, nb, bb) = got(id)
      assert(fmt === wantFmt, s"media $id detected $fmt, want $wantFmt")
      assert(nb === p.length.toLong && bb === (p.length - hdr).toLong, s"media $id sizes")
    }
    // the header-injected feed roundtrips: every payload detected,
    // none unknown, and body accounting matches the raw text bytes
    val docs = Tables.documents(spark, sf)
    val sn   = Multimodal.sniffFormat(Multimodal.mediaWithHeaders(docs))
    assert(sn.count() === docs.count())
    assert(sn.filter($"fmt" === "unknown").count() === 0)
    val sized = sn.join(docs.select($"doc_id".as("media_id"), octet_length($"text").as("nb")), "media_id")
    assert(sized.filter($"body_bytes" =!= $"nb").count() === 0,
      "stripped body size must equal the original text bytes")
  }

  test("multimodal resize and frame sampling are deterministic with expected shapes") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val small = Multimodal.resize(media, 128)
    assert(small.filter(r => r.payload.length > 128).count() === 0)
    assert(small.count() === media.count())
    // determinism: same input -> same resized bytes
    val h1 = Multimodal.extractFeatures(small).select($"feat_hash").orderBy($"feat_hash").collect()
    val h2 = Multimodal.extractFeatures(Multimodal.resize(media, 128))
      .select($"feat_hash").orderBy($"feat_hash").collect()
    assert(h1.toSeq === h2.toSeq)
    // frame sampling: every 4th 256-byte frame
    val frames = Multimodal.sampleFrames(media, 256, 4)
    val wantPerDoc = media.collect().map { r =>
      r.media_id -> (0 until (r.payload.length + 255) / 256).count(_ % 4 == 0).toLong
    }.toMap
    val gotPerDoc = frames.groupBy($"media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotPerDoc === wantPerDoc)
    assert(frames.filter($"frame_no" % 4 =!= 0).count() === 0)
  }

  test("instrument-metadata enrichment broadcasts the dim and keeps every fact row") {
    import spark.implicits._
    val syms = Seq("AAA", "BBB", "CCC")
    val bars = Feeds.SyntheticFeed.fetch(spark, syms, "2024-01-01", "2024-01-15")
    val meta = Feeds.syntheticInstrumentMeta(spark, syms :+ "UNUSED")
    val enriched = graft.operators.Relational.enrichWithMeta(bars, meta)
    assert(enriched.count() === bars.count(), "left join must preserve the fact side")
    assert(enriched.filter($"expense_ratio".isNull || $"category".isNull).count() === 0)
    // metadata is deterministic across fetches
    val again = Feeds.syntheticInstrumentMeta(spark, syms :+ "UNUSED")
    assert(meta.collect().toSet === again.collect().toSet)
    // the dim must broadcast: the fact side never reshuffles for it
    val plan = enriched.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("synthetic feed is deterministic and respects the date range") {
    import spark.implicits._
    val a = Feeds.SyntheticFeed.fetch(spark, Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-11")
    val b = Feeds.SyntheticFeed.fetch(spark, Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-11")
    assert(a.exceptAll(b).count() === 0 && a.count() === 20)
    assert(a.filter($"low" > $"high" || $"open" <= 0).count() === 0)
  }

  test("file feed roundtrips through csv with schema enforcement") {
    val dir = java.nio.file.Files.createTempDirectory("graft_feed").toString
    val src = Feeds.SyntheticFeed.fetch(spark, Seq("AAPL"), "2024-01-01", "2024-01-06")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = new Feeds.FileFeed(dir, "csv").fetch(spark, Seq("AAPL"), "2024-01-01", "2024-01-06")
    assert(back.count() === 5)
    assert(back.schema.fieldNames.toSeq === Feeds.BarSchema.fieldNames.toSeq)
  }

  test("synthetic document feed: deterministic, ranged, unique ids, feeds text analysis") {
    import spark.implicits._
    val a = Feeds.SyntheticDocFeed.fetch(spark, Seq("reuters", "ap"), "2024-01-01", "2024-01-03")
    val b = Feeds.SyntheticDocFeed.fetch(spark, Seq("reuters", "ap"), "2024-01-01", "2024-01-03")
    assert(a.exceptAll(b).count() === 0)
    assert(a.count() === 16) // 2 days x 4 slots x 2 sources
    assert(a.select($"doc_id").distinct().count() === 16)
    assert(a.schema.fieldNames.toSeq === Feeds.DocSchema.fieldNames.toSeq)
    // the adapter output drives the sentiment operator end-to-end
    val pol = graft.operators.TextAnalysis.sentiment(Feeds.docsAsCorpus(a))
    assert(pol.count() === 16 && pol.filter($"polarity".isNull).count() === 0)
  }

  test("file document feed roundtrips through csv with source/time pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docfeed").toString
    val src = Feeds.SyntheticDocFeed.fetch(spark, Seq("reuters", "ap"), "2024-01-01", "2024-01-03")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = new Feeds.FileDocFeed(dir, "csv")
      .fetch(spark, Seq("reuters"), "2024-01-01", "2024-01-02")
    assert(back.count() === 4) // 1 day x 4 slots x 1 source
    assert(back.schema.fieldNames.toSeq === Feeds.DocSchema.fieldNames.toSeq)
  }

  test("streaming doc-feed sentiment matches the batch equivalent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docstream").toString
    val docs = Feeds.SyntheticDocFeed.fetch(spark, Seq("reuters", "ap"), "2024-01-01", "2024-01-04")
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val got = Streams.runToMemory(
      spark, Streams.docSentimentStream(stream), "doc_sent_test", OutputMode.Complete())
    val want = Streams.docSentimentBatch(docs)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("file feed roundtrips through orc") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = Feeds.SyntheticFeed.fetch(spark, Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-06")
    src.write.mode("overwrite").orc(dir)
    val back = new Feeds.FileFeed(dir, "orc").fetch(spark, Seq("MSFT"), "2024-01-01", "2024-01-06")
    assert(back.count() === 5)
    assert(back.schema.fieldNames.toSeq === Feeds.BarSchema.fieldNames.toSeq)
  }

  test("jdbc sink roundtrips through embedded derby") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val src = Feeds.SyntheticFeed.fetch(spark, Seq("AAPL"), "2024-01-01", "2024-01-06")
    Feeds.writeJdbc(src, url, "bars")
    val back = Feeds.readJdbc(spark, url, "bars")
    assert(back.count() === 5)
    assert(back.select($"symbol", $"bar_date", $"close").exceptAll(
      src.select($"symbol", $"bar_date", $"close")).count() === 0)
  }

  test("bucketed tables join without a shuffle and match the plain join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val orders   = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    Feeds.writeBucketed(orders, "b_orders", s"$dir/o", 8, "o_custkey")
    Feeds.writeBucketed(customer, "b_customer", s"$dir/c", 8, "c_custkey")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc  = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      val want = orders.join(customer, $"o_custkey" === $"c_custkey").count()
      assert(joined.count() === want)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("bloom dedup stream: no duplicate ever emitted, fixed state, declared FP drops") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def at(m: Int) = java.time.Instant.parse(f"2024-01-01T10:$m%02d:00Z")
    val mem = MemoryStream[Streams.KeyedEv]
    val out = Streams.bloomDedupStream(mem.toDS(), mBits = 1 << 16, k = 3, nBuckets = 8)
    val q = out.writeStream.format("memory").queryName("bloom_dedup_test").outputMode("append").start()
    try {
      // within-batch duplicate: first by (ts, key) wins
      mem.addData(
        Streams.KeyedEv("a", at(0), 1.0), Streams.KeyedEv("b", at(1), 2.0),
        Streams.KeyedEv("a", at(2), 99.0))
      q.processAllAvailable()
      val b1 = spark.table("bloom_dedup_test").as[Streams.BloomDedupOut].collect()
      assert(b1.map(_.key).sorted.toSeq === Seq("a", "b"))
      assert(b1.find(_.key == "a").get.value === 1.0)
      // cross-batch duplicate: the bitset state remembers forever —
      // no watermark horizon after which a dup could leak back in
      mem.addData(Streams.KeyedEv("b", at(3), 3.0), Streams.KeyedEv("c", at(4), 4.0))
      q.processAllAvailable()
      val b2 = spark.table("bloom_dedup_test").as[Streams.BloomDedupOut].collect()
      assert(b2.map(_.key).sorted.toSeq === Seq("a", "b", "c"))
      // state is one row per TOUCHED BUCKET, not per key: bounded by
      // nBuckets regardless of how many keys have flowed through
      val stateRows = Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      assert(stateRows > 0 && stateRows <= 8)
    } finally q.stop()
    // fixture-scale single batch: with ample bits the emitted set is
    // exactly the distinct key set (deterministic given the data)
    val docs = Tables.documents(spark, sf)
      .select(concat(lit("k"), ($"doc_id" % 200)).as("key"),
        to_timestamp(lit("2024-01-01 10:00:00")).cast("timestamp").as("ts"),
        $"doc_id".cast("double").as("value"))
    val mem2 = MemoryStream[Streams.KeyedEv]
    mem2.addData(docs.as[Streams.KeyedEv].collect().toIndexedSeq)
    val q2 = Streams.bloomDedupStream(mem2.toDS(), mBits = 1 << 16, k = 3, nBuckets = 8)
      .writeStream.format("memory").queryName("bloom_dedup_fix").outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.table("bloom_dedup_fix").select($"key").as[String].collect().toSet
    val want = docs.select($"key").as[String].collect().toSet
    assert(got === want)
    // starved bitset (64 bits, 200 keys): uniques get FP-dropped —
    // the declared trade — but the no-duplicate and subset contracts
    // still hold exactly
    val mem3 = MemoryStream[Streams.KeyedEv]
    mem3.addData(docs.as[Streams.KeyedEv].collect().toIndexedSeq)
    val q3 = Streams.bloomDedupStream(mem3.toDS(), mBits = 64, k = 3, nBuckets = 8)
      .writeStream.format("memory").queryName("bloom_dedup_tiny").outputMode("append").start()
    try q3.processAllAvailable() finally q3.stop()
    val tiny = spark.table("bloom_dedup_tiny").select($"key").as[String].collect().toSeq
    assert(tiny.distinct.size === tiny.size, "a duplicate key was emitted twice")
    assert(tiny.toSet.subsetOf(want))
    assert(tiny.size < want.size, "64-bit buckets cannot hold 200 keys without FP drops")
  }

  test("streaming CMS sketch is bit-identical to the batch sketch, state bounded at d*w") {
    import spark.implicits._
    val dir  = java.nio.file.Files.createTempDirectory("graft_cms_stream").toString
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
    toks.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(toks.schema).parquet(dir)
    val got  = Streams.runToMemory(
      spark, Streams.cmsStream(stream, "tok"), "cms_stream_test", OutputMode.Complete())
    val want = graft.operators.Stats.cmsSketch(toks, "tok")
    assert(got.count() > 0 && got.count() <= 3 * 16,
      "state cardinality must be bounded by the d*w matrix")
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0,
      "stream counters must equal the batch sketch exactly")
    // merged with a second batch's sketch, estimates stay one-sided:
    // the streaming state IS a mergeable CMS
    val more   = toks.limit(500)
    val merged = graft.operators.Stats.cmsMerge(got.unionByName(graft.operators.Stats.cmsSketch(more, "tok")))
    val cnt2   = toks.unionByName(more).groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val est2   = graft.operators.Stats.cmsEstimate(merged, cnt2, "tok")
    assert(cnt2.join(est2, "tok").filter($"cms_est" < $"cnt").count() === 0)
  }

  test("transitions stream equals the batch lag-window edges; late data never splices") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // batch-mode execution of the stateful fold over the fixture:
    // one pass per user == the lag window's adjacency multiset
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").as[Streams.TEv]
    val got = Streams.transitionsStream(ev).toDF()
      .groupBy($"prev_type", $"next_type").agg(count(lit(1)).as("n_transitions"))
    val want = graft.operators.EventAnalytics.topTransitions(Tables.events(spark, sf), 1000000)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    // multi-batch: adjacency continues across batches from O(1)
    // state; an event behind the fold point is dropped, not spliced
    val mem = MemoryStream[Streams.TEv]
    val out = Streams.transitionsStream(mem.toDS(), watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("trans_stream_test").outputMode("append").start()
    def at(m: Int) = java.time.Instant.parse(f"2024-01-01T10:$m%02d:00Z")
    try {
      mem.addData(Streams.TEv(1L, at(0), 1L, "view"), Streams.TEv(1L, at(1), 2L, "click"))
      q.processAllAvailable()
      mem.addData(Streams.TEv(1L, at(2), 3L, "purchase"), Streams.TEv(1L, at(0), 0L, "error"))
      q.processAllAvailable()
      val edges = spark.table("trans_stream_test").as[Streams.TransOut].collect()
        .map(e => (e.prev_type, e.next_type)).sorted.toSeq
      assert(edges === Seq(("click", "purchase"), ("view", "click")))
    } finally q.stop()
  }

  test("funnel stream reproduces the batch ordered-funnel conversions, stage state O(stages)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // batch-mode execution over the fixture: per-stage distinct
    // converters must equal the batch funnel's n_users column
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").as[Streams.TEv]
    val got = Streams.funnelStream(ev).toDF()
      .groupBy($"stage").agg(countDistinct($"user_id").as("n_users"))
    val want = graft.operators.EventAnalytics.funnel(Tables.events(spark, sf))
      .select($"stage", $"n_users")
    assert(got.count() === 3)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    // multi-batch: conversion state persists across batches; a click
    // BEFORE the first view never converts; an equal-ts tie does (>=)
    val mem = MemoryStream[Streams.TEv]
    val out = Streams.funnelStream(mem.toDS(), watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("funnel_stream_test").outputMode("append").start()
    def at(m: Int) = java.time.Instant.parse(f"2024-01-01T10:$m%02d:00Z")
    try {
      mem.addData(
        Streams.TEv(1L, at(0), 1L, "view"), Streams.TEv(1L, at(1), 2L, "click"),
        Streams.TEv(2L, at(0), 3L, "click"), Streams.TEv(2L, at(1), 4L, "view"),
        Streams.TEv(3L, at(2), 5L, "view"), Streams.TEv(3L, at(2), 6L, "click"))
      q.processAllAvailable()
      val b1 = spark.table("funnel_stream_test").as[Streams.FunnelConv].collect()
        .map(c => (c.user_id, c.stage)).sorted.toSeq
      // u2's early click must NOT convert stage 2 (order semantics);
      // u3's same-instant click MUST (the >= tie boundary)
      assert(b1 === Seq((1L, 1), (1L, 2), (2L, 1), (3L, 1), (3L, 2)))
      mem.addData(
        Streams.TEv(1L, at(3), 7L, "purchase"), Streams.TEv(2L, at(3), 8L, "click"))
      q.processAllAvailable()
      val all = spark.table("funnel_stream_test").as[Streams.FunnelConv].collect()
        .map(c => (c.user_id, c.stage)).sorted.toSeq
      assert(all === Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2), (3L, 1), (3L, 2)))
      // state: one array row per user ever seen — O(users·stages)
      val stateRows = Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      assert(stateRows === 3L)
    } finally q.stop()
  }

  test("heavy-hitter stream: MG deficit bound holds, dominant item survives eviction, fixed state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def at(m: Int) = java.time.Instant.parse(f"2024-01-01T10:$m%02d:00Z")
    def ev(i: Int, t: String) = Streams.TEv(1L, at(i % 60), i.toLong, t)
    // single shard, k=2: 'a' dominates (freq > n/(k+1)) and must
    // survive the decrement-all evictions the tail items force
    val items = Seq.fill(5)("a") ++ Seq("b", "c", "b", "d", "a", "e")
    val mem = MemoryStream[Streams.TEv]
    val out = Streams.heavyHittersStream(mem.toDS(), k = 2, nShards = 1)
    val q = out.writeStream.format("memory").queryName("mg_stream_test").outputMode("update").start()
    try {
      val (b1, b2) = items.zipWithIndex.splitAt(7)
      mem.addData(b1.map { case (t, i) => ev(i, t) }: _*)
      q.processAllAvailable()
      mem.addData(b2.map { case (t, i) => ev(i, t) }: _*)
      q.processAllAvailable()
      // latest batch's summary per item
      val last = spark.table("mg_stream_test").as[Streams.MgOut].collect()
        .groupBy(_.item).map { case (it, rows) => rows.maxBy(_.est) }
      val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val reported = last.map(o => o.item -> o.est).toMap
      assert(reported.contains("a"), s"dominant item evicted: $reported")
      reported.foreach { case (it, est) =>
        assert(est <= trueCounts(it), s"$it overestimated: $est > ${trueCounts(it)}")
        assert(trueCounts(it) - est <= n / (2 + 1) + 1, s"$it deficit too large: $reported")
      }
      // state: ONE record per touched shard, never per distinct item
      val stateRows = Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      assert(stateRows === 1L)
    } finally q.stop()
  }

  test("anomaly stream: prequential z-flags match a local fold; spike flagged across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // batch-mode execution over the fixture vs a local sequential fold
    val ev = Tables.events(spark, sf).select($"user_id", $"ts", $"value").as[Streams.SEv]
    val got = Streams.anomalyStream(ev, threshold = 2.5, minN = 10).collect()
      .map(a => (a.user_id, a.ts_us)).toSet
    val want = scala.collection.mutable.Set.empty[(Long, Long)]
    ev.collect().groupBy(_.user_id).foreach { case (uid, es) =>
      var (n, mean, m2) = (0L, 0.0, 0.0)
      es.sortBy(e => (e.ts.getEpochSecond * 1000000L + e.ts.getNano / 1000, e.value)).foreach { e =>
        val us = e.ts.getEpochSecond * 1000000L + e.ts.getNano / 1000
        if (n >= 10) {
          val std = math.sqrt(m2 / (n - 1))
          if (std > 0 && math.abs((e.value - mean) / std) > 2.5) want += ((uid, us))
        }
        n += 1; val d = e.value - mean; mean += d / n; m2 += d * (e.value - mean)
      }
    }
    assert(got === want.toSet)
    assert(got.nonEmpty, "fixture should produce at least one 2.5-sigma flag")
    // multi-batch: warmup in batch 1, spike flagged in batch 2 from persisted state
    val mem = MemoryStream[Streams.SEv]
    val out = Streams.anomalyStream(mem.toDS(), threshold = 4.0, minN = 10, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("anom_stream_test").outputMode("append").start()
    def at(m: Int) = java.time.Instant.parse(f"2024-01-01T10:$m%02d:00Z")
    try {
      mem.addData((0 until 12).map(i =>
        Streams.SEv(1L, at(i), 10.0 + 0.1 * (i % 3))): _*)
      q.processAllAvailable()
      assert(spark.table("anom_stream_test").count() === 0, "stable warmup must not flag")
      mem.addData(Streams.SEv(1L, at(12), 100.0), Streams.SEv(1L, at(13), 10.1))
      q.processAllAvailable()
      val flags = spark.table("anom_stream_test").as[Streams.AnomOut].collect()
      assert(flags.map(f => (f.user_id, f.value)).toSeq === Seq((1L, 100.0)))
      assert(math.abs(flags.head.z) > 4.0)
      // the post-spike normal value is NOT flagged: the spike folded
      // into the state and widened the variance, but 10.1 sits at the
      // old mean — prequential scoring keeps it clean
      val stateRows = Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      assert(stateRows === 1L, "one O(1) record for the single key")
    } finally q.stop()
  }

  test("partitioned write produces prunable layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val src = Feeds.SyntheticFeed.fetch(spark, Seq("AAPL", "MSFT"), "2024-01-01", "2024-01-06")
    Feeds.writePartitioned(src, dir, Seq("symbol"))
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("symbol=")))
    val aapl = spark.read.parquet(dir).filter(col("symbol") === "AAPL")
    assert(aapl.count() === 5)
  }

  test("dau stream finalizes per-day distinct counts equal to the batch DAU") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def at(day: Int, h: Int) = java.time.Instant.parse(f"2024-01-0${day}T$h%02d:00:00Z")
    val mem = MemoryStream[Streams.SEv]
    val out = Streams.dauStream(mem.toDS().toDF(), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("dau_stream_test").outputMode("append").start()
    try {
      // day 1: user 1 twice (must count once) + user 2; day 2: users 1, 3
      mem.addData(
        Streams.SEv(1L, at(1, 0), 1.0), Streams.SEv(1L, at(1, 5), 2.0),
        Streams.SEv(2L, at(1, 9), 3.0),
        Streams.SEv(1L, at(2, 1), 4.0), Streams.SEv(3L, at(2, 2), 5.0))
      q.processAllAvailable()
      // day-3 event pushes the watermark past both day windows
      mem.addData(Streams.SEv(9L, at(3, 12), 6.0))
      q.processAllAvailable()
      val got = spark.table("dau_stream_test")
        .select(date_format($"day", "yyyy-MM-dd").as("d"), $"dau")
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      assert(got.toSeq === Seq(("2024-01-01", 2L), ("2024-01-02", 2L)))
      // state: one row per in-horizon (user, day) + open windows —
      // bounded by activity, never event history
      val stateRows = Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      assert(stateRows >= 0 && stateRows <= 16)
    } finally q.stop()
  }
}
