package graft

import graft.streaming.EventsStreaming

/** RocksDB state store — the state-bigger-than-heap scale path.
  *
  * The default HDFS-backed state store keeps every key's state in
  * executor heap; at 100 TB a stream-stream join or a wide session
  * window holds state far past heap limits. Spark ships a RocksDB
  * provider (off-heap, spillable to local SSD, incremental-checkpoint)
  * exactly for that — flipping
  * `spark.sql.streaming.stateStore.providerClass` must change WHERE
  * state lives and nothing about WHAT the query answers.
  *
  * This spec pins both halves of that contract on a real stateful
  * query (native session windows with watermark eviction):
  *   1. results under RocksDB are row-identical to the default
  *      provider's (and both to the committed oracle semantics);
  *   2. the provider genuinely engaged — the progress metrics carry
  *      rocksdb-specific counters, not the HDFS provider's.
  */
class RocksDbStateSpec extends SparkTestBase {

  test("session-window results are provider-invariant and RocksDB engages") {
    // RocksDB is now the SUITE-WIDE default (withStreamPartitions); the
    // heap baseline must be pinned explicitly through the graft mode key.
    val modeKey = "graft.streaming.stateProvider"
    spark.conf.set(modeKey, "heap")
    val heapRows =
      try canon(EventsStreaming.sessionWindowStream(spark, sf()))
      finally spark.conf.unset(modeKey)
    assert(heapRows.nonEmpty)

    // default mode — nothing set: the wrapper must choose RocksDB
    val rocksRows = canon(EventsStreaming.sessionWindowStream(spark, sf()))
    assert(rocksRows == heapRows,
      "RocksDB state store changed query RESULTS — providers must only change state placement")

    val progresses = EventsStreaming.lastProgressFor("graft_stream_swnative_")
    val metrics = progresses.flatMap(_.stateOperators)
      .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
    assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
      s"no rocksdb metrics in state-operator progress — the default-mode run did not engage RocksDB (saw: ${metrics.distinct.take(5).mkString(",")})")
  }

  test("statePartitions override reshards state without changing results") {
    // Each query names its designed sf0.1 state-partition count; at
    // big sf the probe protocol overrides it (state must shard wider
    // with data). The override must change ONLY state placement.
    val base = canon(EventsStreaming.sessionWindowStream(spark, sf()))
    val pKey = "graft.streaming.statePartitions"
    spark.conf.set(pKey, "3")
    val sharded =
      try canon(EventsStreaming.sessionWindowStream(spark, sf()))
      finally spark.conf.unset(pKey)
    assert(sharded == base,
      "resharding state partitions changed query RESULTS")
    val parts = EventsStreaming.lastProgressFor("graft_stream_swnative_")
      .flatMap(_.stateOperators).map(_.numShufflePartitions)
    assert(parts.contains(3L),
      s"override did not reach the state operator (saw partitions: ${parts.distinct.mkString(",")})")
  }
}
