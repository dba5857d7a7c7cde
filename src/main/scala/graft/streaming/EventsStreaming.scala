package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Structured-streaming forms of the event operators (SURVEY.md §2.I5 and
  * the reference's daily micro-batch cadence, `Final_app.py:17`).
  *
  * The reference is an incremental daily append; its Spark-native shape is
  * a file-source micro-batch stream processed with Trigger.AvailableNow —
  * the same logical plan as the batch form, executed incrementally with
  * checkpointable state. These helpers run the stream to completion over
  * the finite testdata and hand back the result table, so the batch
  * oracle checks the streaming path too.
  */
object EventsStreaming {

  private val nameCounter = new AtomicInteger()

  private[streaming] def nextName(): Int = nameCounter.incrementAndGet()

  /** Write `df` as ONE parquet data file at exactly `target` (the file
    * stream source wants stable, individually-named landing files whose
    * mod-times order the micro-batches).
    */
  private[streaming] def stageSingleFile(df: DataFrame,
      dir: java.nio.file.Path, target: java.nio.file.Path): Unit = {
    val tmp = dir.resolve(s"_build_${target.getFileName}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = graft.FsUtil.singleParquetPart(tmp)
    java.nio.file.Files.move(part, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
  // unique per JVM so a stale checkpoint/sink from an earlier process
  // (possibly older code) can never replay into this run's output
  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)

  /** Per-run StreamingQueryProgress trail, keyed by stream name — the
    * observability hook: state-store size, memory, and EVICTION counts
    * per trigger, so "watermark-bounded state" is measured, not argued
    * (StreamingStateSpec asserts on these).
    */
  private val progressLog =
    new scala.collection.concurrent.TrieMap[String, Array[org.apache.spark.sql.streaming.StreamingQueryProgress]]()

  /** Latest recorded progress trail for a stream-name prefix (names
    * carry a per-JVM counter suffix; highest counter wins).
    */
  private[graft] def lastProgressFor(prefix: String): Array[org.apache.spark.sql.streaming.StreamingQueryProgress] =
    progressLog.toSeq.filter(_._1.startsWith(prefix))
      .sortBy { case (k, _) => k.stripPrefix(prefix).toIntOption.getOrElse(-1) }
      .lastOption.map(_._2).getOrElse(Array.empty)

  /** Distributed streaming terminal: run the query through a
    * `foreachBatch` parquet sink and hand back the readback. Unlike a
    * `format("memory")` sink — which materializes every emitted row in
    * driver memory, the moral equivalent of `.collect()` for a
    * row-per-match stream — each micro-batch is written executor-side
    * straight to files, so the terminal scales with the cluster, not the
    * driver heap. Append-mode streams append per trigger (each row is
    * emitted exactly once); complete-mode aggregates overwrite per
    * trigger (the final trigger holds the full result). This is the same
    * terminal shape `TwseStreaming.flagshipStream` uses for the flagship
    * pipeline (reference `Final_app.py:109`'s append-only INSERT).
    */
  private[streaming] def runToParquet(spark: SparkSession, result: DataFrame,
      name: String, mode: OutputMode = OutputMode.Append): DataFrame = {
    val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_stream_sink_${jvmTag}_$name")
    val sink = base.resolve("out").toString
    val checkpoint = base.resolve("checkpoint").toString
    val saveMode = if (mode == OutputMode.Complete()) "overwrite" else "append"
    val q = result.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode(saveMode).parquet(sink)
      }
      .start()
    q.awaitTermination()
    progressLog.put(name, q.recentProgress)
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(sink)))
      spark.read.schema(result.schema).parquet(sink)
    else // zero triggers fired (empty source): typed empty result
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], result.schema)
  }

  /** Raw events schema as stored (ns timestamps as long — see
    * Tables.events).
    */
  private[streaming] val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stage the single-file testdata table into a per-sf temp dir (the
    * file stream source wants a *directory*; in production: the
    * daily-append landing dir). With `withEos`, additionally stage a
    * second file holding one far-future sentinel event per user — it
    * arrives as its own micro-batch (maxFilesPerTrigger=1) and closes
    * every still-open session, the finite-stream stand-in for an
    * event-time-timeout flush.
    */
  private def stagedDir(spark: SparkSession, sfDir: String, withEos: Boolean): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val suffix = if (withEos) "_eos_v4" else "_v2"
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_stream_src_$safe$suffix")
    val target = dir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(target)) {
      java.nio.file.Files.createDirectories(dir)
      // Re-stage through the encoding-adaptive reader (NOT a raw file
      // copy): the landing file always carries the Long-nanos `ts`
      // convention rawSchema pins, whatever the fixture's encoding.
      stageSingleFile(Tables.eventsRawNanos(spark, sfDir), dir, target)
      if (withEos) {
        val ev = spark.read.schema(rawSchema).parquet(target.toString)
        val maxTsNs = ev.agg(max(col("ts"))).head.getLong(0)
        // First sentinel batch: one flush marker per user, two days past
        // the last event — beyond the session gap (closes every open
        // session) and beyond any ≤1-day watermark lag past the final
        // window boundary. Second sentinel batch: a single marker two
        // days further out, because append-mode windows emit against the
        // watermark of the PREVIOUS batch — the extra data batch is what
        // finalizes the windows the first sentinel advanced past
        // (AvailableNow runs no watermark-only empty batch).
        def writeSentinel(df: DataFrame, fileName: String, mtimeOffsetMs: Long): Unit = {
          val tmp = dir.resolve(s"_build_$fileName")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = graft.FsUtil.singleParquetPart(tmp)
          val f = dir.resolve(fileName)
          java.nio.file.Files.move(part, f)
          // the source orders batches by mod time: events strictly first
          java.nio.file.Files.setLastModifiedTime(f,
            java.nio.file.attribute.FileTime.fromMillis(
              java.nio.file.Files.getLastModifiedTime(target).toMillis + mtimeOffsetMs))
        }
        val day = 86400L * 1000000000L
        writeSentinel(ev.select(col("user_id")).distinct()
          .select(lit(-1L).as("event_id"), lit(maxTsNs + 2 * day).as("ts"),
            col("user_id"), lit("eos").as("event_type"),
            lit(0.0).as("value"), lit(null).cast("string").as("props")),
          "zz_eos1.parquet", 60000)
        writeSentinel(ev.limit(1)
          .select(lit(-2L).as("event_id"), lit(maxTsNs + 4 * day).as("ts"),
            col("user_id"), lit("eos").as("event_type"),
            lit(0.0).as("value"), lit(null).cast("string").as("props")),
          "zz_eos2.parquet", 120000)
      }
    }
    dir.toString
  }

  private[streaming] def eventsStream(spark: SparkSession, sfDir: String): DataFrame =
    streamSource(spark, sfDir)

  private def streamSource(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedDir(spark, sfDir, withEos = false)
    spark.readStream.schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Stage events split into `shards` files so `maxFilesPerTrigger=1`
    * yields that many micro-batches — the multi-ingest shape the rollup
    * maintenance loop exists for. Hash-sharded on event_id so content is
    * deterministic; gated on _SUCCESS so a crashed half-write rebuilds.
    */
  private def stagedShardedDir(spark: SparkSession, sfDir: String, shards: Int): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_stream_src_sharded${shards}_${safe}_v2")
    if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS")))
      Tables.eventsRawNanos(spark, sfDir)
        .repartition(shards, col("event_id"))
        .write.mode("overwrite").parquet(dir.toString)
    dir.toString
  }

  /** Materialized incremental rollup — the maintained daily-partials
    * table that `Analytics.mergePartialAggs`'s algebra exists for, as
    * running code. Each micro-batch's per-(day, event_type) PARTIAL sums
    * (exact integer cents + row count) are upserted into a
    * day-partitioned parquet table via DYNAMIC partition overwrite:
    * only the day partitions the batch touched are rewritten (old
    * partial merged with batch partial by algebraic re-aggregation),
    * history is never rescanned — per-ingest cost is O(batch + touched
    * days), the only shape that survives a years-deep table at 100 TB.
    * Because partials are exact integers, the maintained table is
    * bit-identical to a from-scratch aggregate over all history — which
    * is exactly what the oracle computes. This is the table the
    * production forms of anomalyZscore / retention read instead of raw
    * events.
    */
  def dailyRollupMaintained(spark: SparkSession, sfDir: String): DataFrame =
    withStreamPartitions(spark, 8) {
      val name = s"graft_stream_rollup_${nameCounter.incrementAndGet()}"
      val srcDir = stagedShardedDir(spark, sfDir, shards = 3)
      val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_rollup_${jvmTag}_$name")
      val tableDir = base.resolve("table").toString
      val q = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .writeStream
        .option("checkpointLocation", base.resolve("checkpoint").toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          upsertDailyPartials(batch, tableDir, batchId)
        }
        .start()
      q.awaitTermination()
      // the final rollup is a plain read of the MAINTAINED table
      spark.read.parquet(tableDir)
        .select(col("day").cast("string").as("day"), col("event_type"),
          col("p_n").as("n"),
          (col("p_cents").cast("double") / 100.0).as("total_value"))
    }

  /** One maintenance upsert: merge a batch's daily partials into the
    * partitioned table, rewriting ONLY the touched day partitions. A
    * per-batch applied marker makes checkpoint REPLAY idempotent — a
    * re-delivered batch must not double-merge (the foreachBatch
    * exactly-once pattern, same idea as JdbcStreamSink's batchId
    * ledger). Table existence is detected from partition directories,
    * NOT a _SUCCESS marker: the dynamic-partition-overwrite commit
    * protocol doesn't write one at the table root.
    */
  private def upsertDailyPartials(batch: DataFrame, tableDir: String,
      batchId: Long): Unit = {
    val root = new java.io.File(tableDir)
    val appliedMarker = new java.io.File(root, s"_applied_$batchId")
    if (appliedMarker.exists()) return // replayed batch: already merged
    val spark = batch.sparkSession
    val partials = batch
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("p_cents"),
        count(lit(1)).as("p_n"))
    val hasPartitions = Option(root.listFiles())
      .exists(_.exists(_.getName.startsWith("day=")))
    val merged =
      if (hasPartitions) {
        // touched days only — a handful of partition values, never rows
        val days = partials.select(col("day")).distinct()
          .collect().map(_.getString(0)).toSeq
        val existing = spark.read.parquet(tableDir)
          .select(col("day").cast("string").as("day"), col("event_type"),
            col("p_cents"), col("p_n"))
          .filter(col("day").isin(days: _*))
        existing.unionByName(partials)
          .groupBy(col("day"), col("event_type"))
          .agg(sum(col("p_cents")).as("p_cents"), sum(col("p_n")).as("p_n"))
      } else partials
    // localCheckpoint breaks the file lineage: we overwrite the very
    // partitions we just read (read-then-rewrite is the upsert contract)
    merged.localCheckpoint()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(tableDir)
    appliedMarker.createNewFile()
  }

  /** Run `body` with a bounded shuffle-partition count: streaming state
    * stores are created per shuffle partition at query start, and 32
    * stores for a handful of groups is pure fixed cost (store init +
    * checkpoint IO dominated the streaming queries' bench time). The
    * conf is restored after the query has fully executed — batch queries
    * plan at their own execution time, so they never see the override.
    *
    * Suite-wide state-store default: RocksDB. Heap
    * (HDFSBackedStateStoreProvider) keeps every store's full contents as
    * JVM objects and dies first at scale — per-user state over 10⁸ keys
    * is exactly the shape that OOMs an executor; RocksDB keeps state
    * off-heap with changelog checkpointing and is the provider a 100 TB
    * deployment would run. The graft-level `graft.streaming.stateProvider`
    * session conf selects the mode: `rocksdb` (the default), `heap`
    * (comparison runs), or `session` (leave whatever provider the session
    * pinned — the provider-invariance spec's escape hatch).
    */
  private[streaming] val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private[streaming] val HeapProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  private[streaming] def withStreamPartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    // Each query names its DESIGNED state-partition count `n` (the
    // sf0.1 shape, where 8 keeps per-partition state files small and
    // the fixed per-partition provider overhead off the critical
    // path). State must shard WIDER with data — a 100 M-key dedup in 8
    // RocksDB instances is 12.5 M keys per store, all compaction — so
    // big-sf runs override it via `graft.streaming.statePartitions`
    // (Bench: SPARK_GRAFT_STREAM_SHUFFLE), the streaming twin of the
    // SPARK_GRAFT_SHUFFLE spill-sizing discipline. NOTE unlike batch
    // shuffle partitions this is a STATEFUL choice: the checkpoint pins
    // it at first run, so the override only applies to fresh streams —
    // exactly how a production resharding works (new checkpoint).
    // validated like stateProvider below: a malformed or non-positive
    // override must fail naming the key BEFORE any conf is mutated, not
    // as an opaque NumberFormatException inside the first streaming query
    val eff = spark.conf.getOption("graft.streaming.statePartitions")
      .map { v =>
        v.toIntOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
          s"graft.streaming.statePartitions must be a positive integer, got '$v'"))
      }.getOrElse(n)
    val key = "spark.sql.shuffle.partitions"
    val pKey = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.get(key)
    val oldProvider = spark.conf.get(pKey) // effective value (default = heap)
    // validate BEFORE the first conf.set: an invalid mode must throw
    // without leaking the shuffle-partition override into the session
    val desired = spark.conf.getOption("graft.streaming.stateProvider")
        .getOrElse("rocksdb") match {
      case "rocksdb" => Some(RocksDbProvider)
      case "heap"    => Some(HeapProvider)
      case "session" => None
      case other => throw new IllegalArgumentException(
        s"graft.streaming.stateProvider must be rocksdb|heap|session, got '$other'")
    }
    // RocksDB changelog checkpointing (default ON, graft-level off
    // switch for comparison runs): without it every micro-batch commit
    // uploads a full RocksDB snapshot per state-store partition; with
    // it the commit writes only that batch's changelog and snapshots
    // move to the background maintenance thread. This is the documented
    // production mode for low-latency stateful streaming and is
    // restart-compatible (recovery replays changelogs onto the last
    // snapshot) — the result contract is unchanged at any scale, only
    // per-commit checkpoint bytes shrink.
    val clKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val changelog = spark.conf.getOption("graft.streaming.rocksdbChangelog")
        .getOrElse("true") match {
      case "true" | "1"  => true
      case "false" | "0" => false
      case other => throw new IllegalArgumentException(
        s"graft.streaming.rocksdbChangelog must be true|false, got '$other'")
    }
    val oldChangelog = spark.conf.getOption(clKey)
    spark.conf.set(key, eff.toString)
    desired.foreach(spark.conf.set(pKey, _))
    if (changelog) spark.conf.set(clKey, "true")
    try body finally {
      spark.conf.set(key, old)
      if (desired.nonEmpty) spark.conf.set(pKey, oldProvider)
      if (changelog) oldChangelog.fold(spark.conf.unset(clKey))(
        spark.conf.set(clKey, _))
    }
  }

  /** Streaming daily window aggregation — identical result contract to
    * the batch `Analytics.eventsDaily`; complete-mode foreachBatch
    * parquet terminal (full result overwritten per trigger). In
    * production: append mode + watermark (see `dailyCountsAppend`).
    */
  def dailyCounts(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_daily_${nameCounter.incrementAndGet()}"
    val agg = streamSource(spark, sfDir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("total_value"))
    runToParquet(spark, agg, name, OutputMode.Complete)
  }

  /** Streaming distinct-cardinality via the HLL sketch, self-audited —
    * the streaming form of q_approx_distinct: exact COUNT(DISTINCT) is
    * unavailable in a streaming aggregation (unbounded per-group state),
    * so production counts uniques with approx_count_distinct, whose
    * constant-size mergeable HLL buffer is exactly what the state store
    * wants. The streamed estimates are then audited against the exact
    * batch recount per (day, type) and the contract carries only the
    * exact count and the tolerance verdict — the estimate itself is
    * engine sketch state, kept out of the oracle like the batch audit.
    */
  def dailyApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_approx_distinct_${nameCounter.incrementAndGet()}"
    val agg = streamSource(spark, sfDir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.05).as("n_approx"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_approx"))
    val streamed = runToParquet(spark, agg, name, OutputMode.Complete)
    val exact = graft.sources.Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    streamed.join(exact, Seq("day", "event_type"))
      .select(col("day"), col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <= col("n_exact") * lit(0.15))
          .as("within_tol"))
  }

  /** The custom quantile-sketch aggregate as STREAMING state — the MRL
    * compactor ladder ([[graft.functions.QuantileSketchAgg]]) lives in
    * the state store per event_type: each of the 3 sharded micro-batches
    * folds its rows into partial ladders, which merge with the
    * DESERIALIZED prior state (the TypedImperativeAggregate
    * serialize/merge contract doing double duty as checkpointed stream
    * state). The complete-mode snapshot after the final trigger is a
    * sketch over ALL history, audited by the same exact-rank tail as the
    * batch form — the sketch's any-merge-order guarantee is exactly what
    * makes the incremental stream answer as good as the one-pass batch
    * answer. At scale this is how you keep live percentile dashboards
    * without re-scanning history per refresh.
    */
  def streamingQuantileSketch(spark: SparkSession, sfDir: String): DataFrame =
    withStreamPartitions(spark, 8) {
      val name = s"graft_stream_quantile_${nameCounter.incrementAndGet()}"
      val srcDir = stagedShardedDir(spark, sfDir, shards = 3)
      val cents = (col("value").cast("decimal(12,2)") * 100).cast("long")
      val agg = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
        .select(col("event_type"), cents.as("c"))
        .groupBy(col("event_type"))
        .agg(graft.functions.QuantileSketch.quantile_sketch(col("c")).as("est"))
        .select(col("event_type"), col("est")(0).as("e25"),
          col("est")(1).as("e50"), col("est")(2).as("e75"))
      val streamed = runToParquet(spark, agg, name, OutputMode.Complete)
      val ev = Tables.events(spark, sfDir)
        .select(col("event_type"), cents.as("c"))
      graft.operators.Analytics.quantileRankAudit(ev, streamed)
    }

  /** The production-shaped form of the daily window: APPEND mode with a
    * one-hour watermark — each window row is emitted exactly once, when
    * the watermark passes its end, instead of re-emitting the whole
    * result per trigger (complete mode's memory-bound anti-pattern at
    * scale). The finite-stream flush comes from the staged far-future
    * sentinel batch: its event time advances the watermark past every
    * real window; sentinel rows themselves are filtered out before the
    * aggregation (the filter sits after watermark assignment, so they
    * still advance it).
    */
  def dailyCountsAppend(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_daily_append_${nameCounter.incrementAndGet()}"
    val dir = stagedDir(spark, sfDir, withEos = true)
    val agg = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      // The disjunct referencing ts is vacuous (ts is never null) but
      // load-bearing: predicates that mention the event-time column are
      // NOT pushed below the EventTimeWatermark node, so sentinel rows
      // still advance the watermark before dying here. A plain
      // event_type filter would be pushed into the parquet scan —
      // beneath the watermark collector — and the stream would never
      // finalize its last windows.
      .filter(col("event_type") =!= "eos" || col("ts").isNull)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("total_value"))
    runToParquet(spark, agg, name)
  }

  /** Stream-stream interval join: purchases matched to the views they
    * followed within one hour, per user — both sides watermarked so the
    * join state is bounded (a view older than watermark − 1 h can never
    * match again and is evicted). Inner-join matches emit as soon as
    * both sides arrive; the batch oracle is the identical interval join
    * in SQL. The scale story is the state bound: without the time
    * constraint the join would buffer both streams forever.
    */
  def viewPurchaseJoin(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_vpjoin_${nameCounter.incrementAndGet()}"
    def side(t: String, idAs: String, tsAs: String): DataFrame =
      streamSource(spark, sfDir)
        .filter(col("event_type") === t)
        .select(col("user_id").as(s"${t}_user"), col("event_id").as(idAs),
          col("ts").as(tsAs))
        .withWatermark(tsAs, "1 hour")
    val views = side("view", "view_id", "view_ts")
    val purchases = side("purchase", "purchase_id", "purchase_ts")
    val joined = views.join(purchases,
        col("view_user") === col("purchase_user")
          && col("purchase_ts") >= col("view_ts")
          && col("purchase_ts") <= col("view_ts") + expr("interval 1 hour"))
      .select(col("view_user").as("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("gap_us"))
    runToParquet(spark, joined, name)
  }

  /** Streaming dead-letter fan-out — the DLQ pattern: ONE pass over
    * each micro-batch routes clean rows to the main sink and
    * unparseable rows to a quarantine sink, inside the same
    * `foreachBatch` transaction scope (the batch is persisted once,
    * both filters read the cached rows, no double scan of the source).
    * Corruption is the q_parse_quarantine injection (event_id % 7 →
    * truncated JSON); the result readback summarizes both sinks, so the
    * oracle is the same disposition arithmetic. At scale this is how a
    * pipeline keeps poison records from stalling ingest while never
    * silently dropping them.
    */
  def quarantineStream(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_dlq_${nameCounter.incrementAndGet()}"
    val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_stream_sink_${jvmTag}_$name")
    val okDir = base.resolve("ok").toString
    val dlqDir = base.resolve("dlq").toString
    val checkpoint = base.resolve("checkpoint").toString
    val propsSchema = StructType(Seq(StructField("k", IntegerType)))
    val parsed = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stagedDir(spark, sfDir, withEos = false))
      .select(col("event_id"),
        when(col("event_id") % 7 === 0, substring(col("props"), 1, 4))
          .otherwise(col("props")).as("raw"))
      .withColumn("k", from_json(col("raw"), propsSchema).getField("k"))
    val q = parsed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          batch.filter(col("k").isNotNull)
            .write.mode("append").parquet(okDir)
          batch.filter(col("k").isNull)
            .write.mode("append").parquet(dlqDir)
        } finally { batch.unpersist(); () }
      }
      .start()
    q.awaitTermination()
    val ok = spark.read.parquet(okDir)
      .select(lit("ok").as("disposition"), col("k"))
    val dlq = spark.read.parquet(dlqDir)
      .select(lit("quarantined").as("disposition"), col("k"))
    ok.unionByName(dlq)
      .groupBy(col("disposition"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("bigint").as("sum_k"))
  }

  /** NATIVE streaming sessionization — `session_window` under a
    * watermark in append mode, the engine-managed counterpart of the
    * `flatMapGroupsWithState` form (`sessionize`): the state store
    * merges session intervals per user, and a session emits exactly
    * once when the watermark passes its close. Same result contract as
    * the batch `sessionWindowNative`, so they share an oracle; the EOS
    * sentinels (filtered past the watermark collector, as everywhere)
    * close the final open sessions.
    */
  def sessionWindowStream(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_swnative_${nameCounter.incrementAndGet()}"
    val dir = stagedDir(spark, sfDir, withEos = true)
    val agg = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .filter(col("event_type") =!= "eos" || col("ts").isNull)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("session_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("session_value"))
    runToParquet(spark, agg, name)
  }

  /** Bounded-state streaming dedup — `dropDuplicatesWithinWatermark`:
    * duplicate event_ids arriving within the watermark window are
    * dropped, and each key's state is EVICTED once the watermark passes
    * its event time. This is the scale-correct online dedup: state is
    * bounded by the dedup horizon, where plain `dropDuplicates` (the
    * q_stream_dedup form, fine for a finite corpus) holds every key
    * seen forever. The staged source appends a duplicate file (every
    * 10th event re-sent verbatim, arriving in a later micro-batch) so
    * the operator provably drops real cross-batch duplicates; the
    * oracle is the original duplicate-free table.
    */
  def dedupWithinWatermark(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_dedup_wm_${nameCounter.incrementAndGet()}"
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_stream_dupsrc_${safe}_v2")
    val target = dir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(target)) {
      java.nio.file.Files.createDirectories(dir)
      stageSingleFile(Tables.eventsRawNanos(spark, sfDir), dir, target)
      val dups = spark.read.schema(rawSchema).parquet(target.toString)
        .filter(col("event_id") % 10 === 0)
      val f = dir.resolve("zz_dups.parquet")
      stageSingleFile(dups, dir, f)
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(
          java.nio.file.Files.getLastModifiedTime(target).toMillis + 60000))
    }
    val deduped = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("event_type"))
    runToParquet(spark, deduped, name)
  }

  /** Stage events + duplicate re-sends + EOS sentinel batches: the
    * composite source for the chained-stateful query — duplicates prove
    * the dedup stage drops real cross-batch re-sends, sentinels drive
    * the watermark past the last window so append mode finalizes.
    */
  private def stagedDupEosDir(spark: SparkSession, sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_stream_dupeos_${safe}_v1")
    val target = dir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(target)) {
      java.nio.file.Files.createDirectories(dir)
      stageSingleFile(Tables.eventsRawNanos(spark, sfDir), dir, target)
      val ev = spark.read.schema(rawSchema).parquet(target.toString)
      val maxTsNs = ev.agg(max(col("ts"))).head.getLong(0)
      val day = 86400L * 1000000000L
      def mtime(f: java.nio.file.Path, off: Long): Unit =
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(
            java.nio.file.Files.getLastModifiedTime(target).toMillis + off))
      val dups = dir.resolve("zz_dups.parquet")
      stageSingleFile(ev.filter(col("event_id") % 10 === 0), dir, dups)
      mtime(dups, 60000)
      Seq((2L, "zz_eos1.parquet", 120000L), (4L, "zz_eos2.parquet", 180000L))
        .foreach { case (days, fileName, off) =>
          val f = dir.resolve(fileName)
          stageSingleFile(ev.select(col("user_id")).distinct()
            .select(lit(-days).as("event_id"),
              lit(maxTsNs + days * day).as("ts"), col("user_id"),
              lit("eos").as("event_type"), lit(0.0).as("value"),
              lit(null).cast("string").as("props")), dir, f)
          mtime(f, off)
        }
    }
    dir.toString
  }

  /** CHAINED STATEFUL OPERATORS in one streaming query — watermarked
    * dedup state feeding append-mode window state: re-sent events die in
    * `dropDuplicatesWithinWatermark` (bounded, watermark-evicted state),
    * and the SURVIVORS aggregate into daily windows that finalize
    * exactly once — so the downstream count is exactly-once EVEN WHEN
    * the upstream delivers at-least-once, which is the production
    * ingest contract (replayed Kafka offsets, retried uploads). Spark
    * runs both stateful stages in one query off one shared watermark;
    * before multi-stateful-operator support this took two jobs with an
    * intermediate landing table. Oracle: the batch distinct→window
    * aggregate over the duplicate-free table.
    */
  def dedupThenWindow(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_dedup_agg_${nameCounter.incrementAndGet()}"
    val dir = stagedDupEosDir(spark, sfDir)
    val agg = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      // vacuous ts disjunct: keep the sentinel filter ABOVE the
      // watermark collector (see dailyCountsAppend)
      .filter(col("event_type") =!= "eos" || col("ts").isNull)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"))
    runToParquet(spark, agg, name)
  }

  /** LEFT OUTER stream-stream interval join — the semantically hard
    * streaming shape: matched (view, purchase) pairs emit like the
    * inner join, and a view with NO purchase within its hour emits
    * exactly once WITH NULLs, only after the watermark proves no future
    * purchase can still match (view_ts + 1 h interval + 1 h watermark
    * lag). The EOS sentinel batches drive the watermark past every
    * view's expiry so the AvailableNow run flushes all unmatched rows
    * — same mechanism that finalizes append-mode windows. Sentinels
    * must pass the watermark collector but not the join, hence the
    * post-watermark filter with the vacuous event-time disjunct (see
    * dailyCountsAppend).
    */
  def viewPurchaseLeftJoin(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_vpleft_${nameCounter.incrementAndGet()}"
    val dir = stagedDir(spark, sfDir, withEos = true)
    def side(t: String, idAs: String, tsAs: String): DataFrame =
      spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .select(col("user_id").as(s"${t}_user"), col("event_id").as(idAs),
          col("ts").as(tsAs), col("event_type"))
        .withWatermark(tsAs, "1 hour")
        .filter(col("event_type") === t || col(tsAs).isNull)
        .drop("event_type")
    val views = side("view", "view_id", "view_ts")
    val purchases = side("purchase", "purchase_id", "purchase_ts")
    val joined = views.join(purchases,
        col("view_user") === col("purchase_user")
          && col("purchase_ts") >= col("view_ts")
          && col("purchase_ts") <= col("view_ts") + expr("interval 1 hour"),
        "leftOuter")
      .select(col("view_user").as("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("gap_us"))
    runToParquet(spark, joined, name)
  }

  /** FULL OUTER stream-stream interval join — both unmatched directions
    * at once: matched pairs emit like the inner join; a view with no
    * purchase in its hour emits once with NULL purchase columns after
    * the watermark proves no match can arrive (the left-join case); and
    * a purchase no view preceded ALSO emits once with NULL view columns
    * once the watermark passes its interval's other end. State eviction
    * is symmetric — each side's buffer is bounded by interval + lag, so
    * at 100 TB/day the store holds a two-hour band per side, never
    * history. Same EOS-sentinel flush discipline as the left join.
    */
  def viewPurchaseFullJoin(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_vpfull_${nameCounter.incrementAndGet()}"
    val dir = stagedDir(spark, sfDir, withEos = true)
    def side(t: String, idAs: String, tsAs: String): DataFrame =
      spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .select(col("user_id").as(s"${t}_user"), col("event_id").as(idAs),
          col("ts").as(tsAs), col("event_type"))
        .withWatermark(tsAs, "1 hour")
        .filter(col("event_type") === t || col(tsAs).isNull)
        .drop("event_type")
    val views = side("view", "view_id", "view_ts")
    val purchases = side("purchase", "purchase_id", "purchase_ts")
    val joined = views.join(purchases,
        col("view_user") === col("purchase_user")
          && col("purchase_ts") >= col("view_ts")
          && col("purchase_ts") <= col("view_ts") + expr("interval 1 hour"),
        "fullOuter")
      .select(
        coalesce(col("view_user"), col("purchase_user")).as("user_id"),
        col("view_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("gap_us"))
    runToParquet(spark, joined, name)
  }

  /** Stream-static join: the event stream enriched with a BATCH-computed
    * dimension (each user's first-seen cohort day) and aggregated per
    * (cohort, event_type). The static side is planned once and
    * broadcast into every micro-batch — no state store for the join, no
    * watermark needed on the dimension; this is the canonical shape for
    * joining a stream against reference data at scale (dims refresh by
    * restarting the query or via a slowly-refreshed broadcast).
    */
  def cohortEnrichedCounts(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_cohort_${nameCounter.incrementAndGet()}"
    val cohorts = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(date_format(min(col("ts")), "yyyy-MM-dd").as("cohort"))
    val agg = streamSource(spark, sfDir)
      .join(broadcast(cohorts), "user_id") // stream-static equi join
      .groupBy(col("cohort"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    runToParquet(spark, agg, name, OutputMode.Complete)
  }

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  case class Ev(event_id: Long, user_id: Long, ts_us: Long, value: Double)
  case class SessionAgg(user_id: Long, session_id: Int, n_events: Long,
      session_start_us: Long, session_value: Double)

  /** Per-user streaming state: the id of the currently-open session and
    * its full running aggregate (nEvents == 0 ⇔ no open session). Carrying
    * the aggregate — not just the last timestamp — is what lets a session
    * span micro-batches: the next batch keeps accumulating instead of
    * re-emitting or crashing on a continuation event.
    */
  case class UserSessionState(sessionId: Int, lastTsUs: Long,
      nEvents: Long, startUs: Long, value: Double)

  private val gapUs = 30L * 60 * 1000000

  /** Custom streaming state: per-user 30-minute-gap sessionization via
    * flatMapGroupsWithState. Events are sorted within each micro-batch;
    * a session is emitted ONLY when a later event closes it (gap
    * exceeded), so output is append-correct across any number of
    * micro-batches. The staged sentinel batch (see `stagedDir`) closes
    * the trailing open sessions; sentinel sessions themselves are never
    * emitted. The batch gaps-and-islands form
    * (`Analytics.eventsSessionized`) is the oracle — a spec asserts both
    * agree, and a two-file spec asserts sessions survive a mid-session
    * batch boundary.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedDir(spark, sfDir, withEos = true)
    sessionizeDir(spark, dir)
  }

  /** The streaming plan over an already-staged source directory; each
    * file arrives as its own micro-batch (maxFilesPerTrigger=1).
    */
  def sessionizeDir(spark: SparkSession, srcDir: String): DataFrame = withStreamPartitions(spark, 8) {
    import spark.implicits._
    val name = s"graft_stream_sessions_${nameCounter.incrementAndGet()}"

    val events: Dataset[Ev] = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Ev]

    def fn(userId: Long, it: Iterator[Ev],
        state: GroupState[UserSessionState]): Iterator[SessionAgg] = {
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var st = state.getOption.getOrElse(UserSessionState(0, Long.MinValue, 0, 0, 0.0))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
      sorted.foreach { e =>
        if (e.event_id < 0) { // flush marker: close the open session, open none
          if (st.nEvents > 0) {
            out += SessionAgg(userId, st.sessionId, st.nEvents, st.startUs, st.value)
            st = UserSessionState(st.sessionId, e.ts_us, 0, 0, 0.0)
          }
        } else if (st.nEvents == 0) { // first event: open the next session
          st = UserSessionState(st.sessionId + 1, e.ts_us, 1, e.ts_us, e.value)
        } else if (e.ts_us - st.lastTsUs > gapUs) { // close + reopen
          out += SessionAgg(userId, st.sessionId, st.nEvents, st.startUs, st.value)
          st = UserSessionState(st.sessionId + 1, e.ts_us, 1, e.ts_us, e.value)
        } else { // continuation — possibly from a previous micro-batch
          st = UserSessionState(st.sessionId, e.ts_us,
            st.nEvents + 1, st.startUs, st.value + e.value)
        }
      }
      state.update(st)
      out.iterator
    }

    val sessions = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
    runToParquet(spark, sessions.toDF(), name)
  }
}
