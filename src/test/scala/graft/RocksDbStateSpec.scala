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
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val defaultRows = canon(EventsStreaming.sessionWindowStream(spark, sf()))
    assert(defaultRows.nonEmpty)

    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocksRows = canon(EventsStreaming.sessionWindowStream(spark, sf()))
      assert(rocksRows == defaultRows,
        "RocksDB state store changed query RESULTS — providers must only change state placement")

      val progresses = EventsStreaming.lastProgressFor("graft_stream_swnative_")
      val metrics = progresses.flatMap(_.stateOperators)
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb metrics in state-operator progress — provider never engaged (saw: ${metrics.distinct.take(5).mkString(",")})")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
