package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Events

/** Structured-Streaming faces of the D-block: the same transforms run
  * as streams (MemoryStream micro-batches + memory sink) and must agree
  * with their batch results.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("dedupWithinWatermark: duplicates dropped within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val streamDf = mem.toDF().toDF("event_ts", "user_id", "event_type")
    val q = Events.dedupWithinWatermark(streamDf, Seq("user_id", "event_type"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    // batch 1: a same-batch duplicate; batch 2: a cross-batch duplicate
    // arriving within the 10-minute horizon plus one genuinely new key
    mem.addData((ts(0), 1L, "click"), (ts(1), 1L, "click"), (ts(2), 2L, "view"))
    q.processAllAvailable()
    mem.addData((ts(3), 1L, "click"), (ts(4), 3L, "click"))
    q.processAllAvailable()
    val out = spark.table("dedup_out").select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    q.stop()
    assert(out == Seq((1L, "click"), (2L, "view"), (3L, "click")))

    // batch face: same keys, exact dedup
    val batch = Events.dedupWithinWatermark(
      Seq((ts(0), 1L, "click"), (ts(1), 1L, "click"), (ts(2), 2L, "view"))
        .toDF("event_ts", "user_id", "event_type"),
      Seq("user_id", "event_type"))
    assert(batch.count() == 2)
  }

  test("stream-stream interval join: purchase matches clicks in the preceding hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("click_ts", "c_user")
      .withWatermark("click_ts", "2 hours")
    val p = purchases.toDF().toDF("purchase_ts", "p_user")
      .withWatermark("purchase_ts", "2 hours")
    // the event-time range bounds BOTH the match window and the join
    // state retention (clicks older than the watermark horizon drop)
    val joined = p.join(c, expr(
      """c_user = p_user AND
        |click_ts >= purchase_ts - interval 1 hour AND
        |click_ts <= purchase_ts""".stripMargin))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").start()
    clicks.addData((ts(0), 1L), (ts(30), 2L))
    q.processAllAvailable()
    // user 1: purchase 40 min after its click (matches);
    // user 2: purchase 70 min after its click (outside the hour)
    purchases.addData((ts(40), 1L), (ts(100), 2L))
    q.processAllAvailable()
    val out = spark.table("ssj_out").select("p_user").collect()
      .map(_.getLong(0)).toSeq
    q.stop()
    assert(out == Seq(1L))
  }

  test("hourlyAgg: streaming (watermark, complete mode) equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts(0), "click", 1.0), (ts(10), "click", 2.0), (ts(20), "view", 3.0),
      (ts(70), "click", 4.0), (ts(80), "view", 5.0), (ts(130), "view", 6.0))

    val batch = Events.hourlyAgg(
      rows.toDF("event_ts", "event_type", "value"))
      .orderBy("hour_start", "event_type").collect()

    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("event_ts", "event_type", "value")
      .withWatermark("event_ts", "10 minutes")
    val q = Events.hourlyAgg(streamDf).writeStream
      .outputMode("complete").format("memory").queryName("hourly_out").start()
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*)
    q.processAllAvailable()
    val streamed = spark.table("hourly_out")
      .orderBy("hour_start", "event_type").collect()
    q.stop()

    assert(streamed.toSeq == batch.toSeq)
  }

  test("slidingAgg: streaming (watermark, complete mode) equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts(0), "click", 1.0), (ts(10), "click", 2.0), (ts(20), "view", 3.0),
      (ts(70), "click", 4.0), (ts(80), "view", 5.0), (ts(130), "view", 6.0))

    val batch = Events.slidingAgg(
      rows.toDF("event_ts", "event_type", "value"))
      .orderBy("win_start_us", "event_type").collect()
    // each event lands in exactly 4 sliding windows
    assert(batch.map(_.getLong(2)).sum == rows.length * 4L)

    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("event_ts", "event_type", "value")
      .withWatermark("event_ts", "10 minutes")
    val q = Events.slidingAgg(streamDf).writeStream
      .outputMode("complete").format("memory").queryName("sliding_out").start()
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*)
    q.processAllAvailable()
    val streamed = spark.table("sliding_out")
      .orderBy("win_start_us", "event_type").collect()
    q.stop()

    assert(streamed.toSeq == batch.toSeq)
  }

  test("sessionizeStateful: state carries open sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // offset from epoch 0: the stateful operator's late-row filter
    // drops event_ts <= watermark, and the initial watermark is 0 —
    // an event AT epoch zero is degenerate "late" data by definition
    val us = (min: Int) => (min + 60) * 60L * 1000000L
    val gap = 30 * 60L * 1000000L
    val mem = MemoryStream[Events.Ev]
    val q = Events.sessionizeStateful(mem.toDS(), gapUs = gap).writeStream
      .outputMode("append").format("memory").queryName("sess_out").start()

    // batch 1: user 1 events at t=0,10 (one open session)
    mem.addData(Events.Ev(1, us(0), 1.0), Events.Ev(1, us(10), 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // still open

    // batch 2: t=100 closes the first session and opens a second
    mem.addData(Events.Ev(1, us(100), 5.0))
    q.processAllAvailable()
    val closed = spark.table("sess_out").as[Events.SessionOut].collect()
    q.stop()

    assert(closed.toSeq == Seq(Events.SessionOut(1, us(0), 2, 3.0)))
  }

  test("RocksDB state store: stateful pipeline output is provider-invariant") {
    // The 100 TB state story: default (HDFS-backed) state stores hold
    // state on the JVM heap — terabytes of aggregate session/join state
    // OOM by construction. RocksDBStateStoreProvider (bundled with
    // Spark) spills state off-heap/on-disk per partition. The provider
    // is swapped by CONF ONLY; this pins that the same stateful
    // pipeline lands on identical output under both providers, so the
    // scale deployment is a config choice, not a code fork.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val us = (min: Int) => (min + 60) * 60L * 1000000L
    val gap = 30 * 60L * 1000000L
    def runArm(provider: Option[String]): Seq[Events.SessionOut] = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val old = spark.conf.getOption(key)
      provider.foreach(spark.conf.set(key, _))
      try {
        val mem = MemoryStream[Events.Ev]
        val name = s"rocks_arm_${provider.isDefined}"
        val q = Events.sessionizeStateful(mem.toDS(), gapUs = gap).writeStream
          .outputMode("append").format("memory").queryName(name).start()
        try {
          mem.addData(Events.Ev(1, us(0), 1.0), Events.Ev(1, us(10), 2.0),
            Events.Ev(2, us(5), 4.0))
          q.processAllAvailable()
          mem.addData(Events.Ev(1, us(100), 5.0), Events.Ev(2, us(110), 1.0))
          q.processAllAvailable()
          spark.table(name).as[Events.SessionOut].collect().toSeq
            .sortBy(s => (s.user_id, s.session_start_us))
        } finally q.stop()
      } finally old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val default = runArm(None)
    val rocks = runArm(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    assert(default.nonEmpty, "pipeline emitted nothing")
    assert(rocks == default,
      s"RocksDB arm diverged: $rocks vs $default")
  }

  test("sessionizeStateful: watermark timeout closes an idle user's session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // offset from epoch 0: the stateful operator's late-row filter
    // drops event_ts <= watermark, and the initial watermark is 0 —
    // an event AT epoch zero is degenerate "late" data by definition
    val us = (min: Int) => (min + 60) * 60L * 1000000L
    val gap = 30 * 60L * 1000000L
    val mem = MemoryStream[Events.Ev]
    val q = Events.sessionizeStateful(mem.toDS(), gapUs = gap).writeStream
      .outputMode("append").format("memory").queryName("sess_idle_out").start()

    // user 1 goes idle after t=10; user 1 never sends another event
    mem.addData(Events.Ev(1, us(0), 1.0), Events.Ev(1, us(10), 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_idle_out").count() == 0) // watermark still at 10

    // another USER's event pushes the watermark past 10+30 — the
    // event-time timeout must now close user 1's session (under
    // NoTimeout it would have stayed open forever)
    mem.addData(Events.Ev(2, us(200), 9.0))
    q.processAllAvailable()
    val closed = spark.table("sess_idle_out").as[Events.SessionOut].collect()
    q.stop()

    assert(closed.toSeq == Seq(Events.SessionOut(1, us(0), 2, 3.0)))
  }

  test("file-source streaming: readStream over events parquet equals batch hourly agg") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file streaming sources watch a directory
    val streamDir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(schema).parquet(streamDir.toString))
      .withColumn("event_ts", graft.functions.Fns.nsToTimestamp(col("ts")))
      .withWatermark("event_ts", "1 hour")
    val q = Events.hourlyAgg(stream).writeStream
      .outputMode("complete").format("memory").queryName("file_hourly").start()
    q.processAllAvailable()
    val streamed = spark.table("file_hourly")
      .orderBy("hour_start", "event_type").collect()
    q.stop()
    val batch = Events.qHourlyEvents(spark, dir)
      .orderBy("hour_start", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("Trigger.AvailableNow: bounded catch-up run terminates and equals batch") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val streamDir = java.nio.file.Files.createTempDirectory("evcatchup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(schema).parquet(streamDir.toString))
      .withColumn("event_ts", graft.functions.Fns.nsToTimestamp(col("ts")))
      .withWatermark("event_ts", "1 hour")
    // AvailableNow = the incremental-batch trigger: process everything
    // present, then STOP — the shape a scheduled catch-up job runs
    val q = Events.hourlyAgg(stream).writeStream
      .outputMode("complete").format("memory").queryName("catchup_hourly")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    val streamed = spark.table("catchup_hourly")
      .orderBy("hour_start", "event_type").collect()
    val batch = Events.qHourlyEvents(spark, dir)
      .orderBy("hour_start", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming sink: windowed agg lands in parquet with checkpointing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("sink").toString
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = Events.hourlyAgg(
      mem.toDF().toDF("event_ts", "event_type", "value")
        .withWatermark("event_ts", "10 minutes"))
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .start()
    mem.addData((ts(0), "click", 1.0), (ts(30), "click", 2.0))
    q.processAllAvailable()
    // advance the watermark far enough to close the first hour's window
    mem.addData((ts(180), "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(s"$outDir/data")
    assert(rows.count() >= 1)
    assert(rows.filter(col("n_events") === 2 && col("total_value") === 3.0).count() == 1)
  }

  test("sessionizeStateful in batch mode agrees with session_window counts") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val evs = graft.sources.Tables(spark, dir).events
      .select(col("user_id").cast("long").as("user_id"),
        graft.functions.Fns.nsToUs(col("ts")).as("ts_us"),
        col("value"))
      .as[Events.Ev]
    val stateful = Events.sessionizeStateful(evs).collect()
    val native = Events.qSessionize(spark, dir).collect()
    // batch closure is COMPLETE (end-of-input closes trailing sessions),
    // so the stateful result must equal session_window's, not just be a
    // subset. (Values compared on the session key/count triple — the
    // two paths accumulate value totals in different numeric types.)
    val nativeSet = native.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val statefulSet = stateful.map(s =>
      (s.user_id, s.session_start_us, s.n_events)).toSet
    assert(stateful.nonEmpty)
    assert(statefulSet == nativeSet)
  }

  test("qStreamCdc: multi-batch foreachBatch merge equals batch CDC apply") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Events.qStreamCdc(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val batch = graft.operators.Extras.cdcApply(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(streamed.nonEmpty)
    // batch-split invariance: the per-micro-batch latest-wins fold over
    // 4 files lands on exactly the single-pass batch merge
    assert(streamed == batch)
  }

  test("q_stream_restart: crash/resume pipeline equals batch CDC apply") {
    val dir = "/root/testdata/sf0.001"
    val restarted = graft.streaming.Events.qStreamRestart(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val batch = graft.operators.Extras.cdcApply(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(restarted.nonEmpty)
    // recovery is only correct if it is output-invisible
    assert(restarted == batch)
  }

  test("qStreamCdc pipeline: checkpoint restart resumes offsets, never re-reads, state converges") {
    // The one streaming story r8 left unexercised (VERDICT item #6):
    // kill a checkpointed query mid-feed, resume from sink + checkpoint,
    // and land on exactly the uninterrupted run's output.
    import java.nio.file.Files
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // stage the 4-part feed; reveal it in two halves around the "kill"
    val staged = Files.createTempDirectory("graft_restart_staged")
    spark.read.parquet(s"$dir/events.parquet").repartition(4)
      .write.mode("overwrite").parquet(staged.toString)
    val parts = staged.toFile.listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(parts.length == 4)
    val feed = Files.createTempDirectory("graft_restart_feed")
    val ckpt = Files.createTempDirectory("graft_restart_ckpt").toString
    val state = Files.createTempDirectory("graft_restart_state")
    parts.take(2).foreach(f => Files.copy(f.toPath, feed.resolve(f.getName)))
    // run 1 consumes the visible half, then the job "dies" (query gone;
    // checkpoint offsets and v* state snapshots survive on disk)
    val run1 = graft.streaming.Events.cdcPass(
      spark, schema, feed.toString, state, Some(ckpt))
    assert(run1 == Seq(0L, 1L), s"run1 processed $run1")
    // the rest of the feed lands while the job is down
    parts.drop(2).foreach(f => Files.copy(f.toPath, feed.resolve(f.getName)))
    // run 2 resumes from the SAME checkpoint: batch ids continue and
    // ONLY the two new files are consumed — committed input is never
    // re-read (exactly-once source consumption)
    val run2 = graft.streaming.Events.cdcPass(
      spark, schema, feed.toString, state, Some(ckpt))
    assert(run2 == Seq(2L, 3L), s"run2 processed $run2 — offsets did not resume")
    // the restarted pipeline's final state equals one uninterrupted
    // streaming run over the full feed (batch-split invariance of the
    // latest-wins fold); qStreamCdc's own spec ties that to the batch
    // E45 oracle, closing restart == batch transitively
    val soloState = Files.createTempDirectory("graft_restart_solo")
    graft.streaming.Events.cdcPass(
      spark, schema, feed.toString, soloState, None)
    def finalState(root: java.nio.file.Path) = spark.read.parquet(
      root.resolve(s"v${graft.streaming.Events.latestStateVersion(root)}").toString)
    val a = finalState(state)
    val b = finalState(soloState)
    assert(a.count() > 0)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "restarted state diverged from the uninterrupted run")
    // a further resume with nothing new must not touch committed ids
    // (an empty catch-up batch, if any, may fold v-latest over itself)
    val run3 = graft.streaming.Events.cdcPass(
      spark, schema, feed.toString, state, Some(ckpt))
    assert(run3.forall(_ >= 4L), s"run3 reprocessed $run3")
    val a2 = finalState(state)
    assert(a2.exceptAll(b).count() == 0 && b.exceptAll(a2).count() == 0,
      "idle resume changed the state")
  }

  test("qStreamUniques: HLL state over the stream lands within the claimed 5%") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.streaming.Events.qStreamUniques(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    // the in-plan error claim the oracle states as TRUE must hold here too
    rows.foreach { case (et, n, ok) => assert(ok, s"$et: approx off >5% of $n") }
    // exact companion really is the batch COUNT(DISTINCT)
    val exact = graft.sources.Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (et, n, _) => assert(exact(et) == n) }
  }

  test("qStreamSliding: streaming overlapping windows equal the batch sliding agg") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Events.qStreamSliding(spark, dir)
    val batch = graft.streaming.Events.qSlidingWindow(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("slidingAgg in update mode: watermark EVICTS closed windows from the state store") {
    // r7 VERDICT item #8: qStreamSliding's docstring claims a production
    // deployment switches to update mode, where the 1 h watermark
    // actually bounds state — prove it: state-store row count must DROP
    // once the horizon passes the early windows.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("event_ts", "event_type", "value")
      .withWatermark("event_ts", "1 hour")
    val q = Events.slidingAgg(streamDf)
      .writeStream.outputMode("update").format("memory")
      .queryName("sliding_update_out").start()
    def stateRows(): Long = q.lastProgress.stateOperators.head.numRowsTotal
    // batch 1: three early events -> 6 distinct (window, type) states
    // (1 h windows sliding by 15 min, epoch-aligned starts; events 20
    // minutes apart open 4 + 1 + 1 windows)
    mem.addData((ts(0), "click", 1.0), (ts(10), "click", 1.0), (ts(20), "click", 1.0))
    q.processAllAvailable()
    val s1 = stateRows()
    assert(s1 >= 5, s"expected >=5 open windows, state has $s1")
    // batch 2: jump 10 h ahead — the new max event time sets the NEXT
    // batch's watermark to t0+9h, far past every early window's end
    mem.addData((ts(600), "click", 1.0))
    q.processAllAvailable()
    // batch 3: one more event; its batch runs under the advanced
    // watermark, so the early windows are evicted now
    mem.addData((ts(605), "click", 1.0))
    q.processAllAvailable()
    val s3 = stateRows()
    q.stop()
    assert(s3 < s1, s"watermark did not evict: state $s1 -> $s3")
    // only the two late events' windows may remain (5 minutes apart:
    // at most 5 distinct epoch-aligned sliding windows)
    assert(s3 <= 5, s"expected <=5 surviving windows, state has $s3")
    // and update mode emitted every window version, none lost: the sink
    // saw at least one row per distinct window ever opened
    val sunk = spark.table("sliding_update_out")
      .select("win_start_us").distinct().count()
    assert(sunk >= 9, s"update stream emitted only $sunk distinct windows")
  }

  test("qStreamLeftJoin: watermark-emitted nulls equal the batch left join at the horizon") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Events.qStreamLeftJoin(spark, dir).cache()
    // the left-outer face must surface clickless purchases as n_clicks=0
    // rows — the whole point of the mode vs D11's inner join
    assert(streamed.filter(col("n_clicks") === 0).count() > 0,
      "no null-extended purchases emitted — left-outer semantics lost")
    // batch restatement: LEFT join at the same closed horizon
    val ev = graft.sources.Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.functions.Fns.nsToUs(col("ts")).as("t"))
    val mx = ev.agg(
      max(when(col("event_type") === "purchase", col("t"))),
      max(when(col("event_type") === "click", col("t")))).head
    val horizon = math.min(mx.getLong(0), mx.getLong(1)) - 3L * 3600L * 1000000L
    val p = ev.filter(col("event_type") === "purchase" && col("t") <= horizon)
      .select(col("user_id"), col("event_id").as("purchase_event_id"), col("t").as("pt"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("ce"), col("t").as("ct"))
    val batch = p.join(c,
        col("user_id") === col("cu") &&
          col("ct") >= col("pt") - 3600000000L && col("ct") <= col("pt"), "left")
      .groupBy(col("user_id"), col("purchase_event_id"))
      .agg(count(col("ce")).as("n_clicks"))
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("q_stream_late: append-mode emission equals the batch drop-rule restatement") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Events.qStreamLate(spark, dir).cache()
    // batch restatement of the pinned semantics: watermark (ms clock)
    // from the ON-TIME wave only; a late row survives iff its
    // hour-window END strictly clears that watermark
    val ev = graft.sources.Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value"),
        graft.functions.Fns.nsToUs(col("ts")).as("t_us"))
    val wmMs = ev.filter(col("event_id") % 7 =!= 0)
      .agg(max(expr("t_us div 1000"))).head.getLong(0) - 7200000L
    val kept = ev.filter(col("event_id") % 7 =!= 0 ||
      expr(s"(t_us - (t_us % 3600000000) + 3600000000) div 1000") > wmMs)
    val batch = kept
      .groupBy(timestamp_micros(expr("t_us - (t_us % 3600000000)"))
        .as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Fns.decSum(col("value")).as("total_value"))
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    // the audit is non-vacuous: some late rows were genuinely dropped
    val dropped = ev.filter(col("event_id") % 7 === 0 &&
      expr(s"(t_us - (t_us % 3600000000) + 3600000000) div 1000") <= wmMs).count()
    assert(dropped > 0, "late wave contained no droppable rows — audit is vacuous")
    assert(streamed.agg(sum("n_events")).head.getLong(0) ==
      ev.count() - dropped)
    streamed.unpersist()
  }
}
