package graft

import graft.streaming.EventsStreaming

/** State-store observability: the streaming operators CLAIM their state
  * is watermark-bounded — these specs measure it via
  * StreamingQueryProgress.stateOperators (rows held, memory, EVICTIONS)
  * instead of arguing it from the plan. If a watermark stops evicting
  * (a filter pushed below the watermark collector, a lost sentinel
  * batch), state grows without bound at scale; here that shows up as
  * numRowsRemoved == 0 and turns red.
  */
class StreamingStateSpec extends SparkTestBase {

  private def stateTrail(prefix: String) = {
    val progresses = EventsStreaming.lastProgressFor(prefix)
    assert(progresses.nonEmpty, s"no progress recorded for $prefix")
    val stateOps = progresses.flatMap(_.stateOperators)
    assert(stateOps.nonEmpty, "no stateful operator reported progress")
    (progresses, stateOps)
  }

  test("left-join state is bounded: watermark evicts buffered rows") {
    EventsStreaming.viewPurchaseLeftJoin(spark, sf())
    val (progresses, stateOps) = stateTrail("graft_stream_vpleft_")
    // evictions DID happen as the watermark advanced past view expiry
    val removed = stateOps.map(_.numRowsRemoved).sum
    assert(removed > 0, "watermark never evicted any join state")
    // state is measured, non-trivial, and ends far below total input:
    // the buffer holds a watermark-wide band, not the whole stream
    assert(stateOps.map(_.memoryUsedBytes).max > 0)
    val lastState = progresses.filter(_.stateOperators.nonEmpty)
      .last.stateOperators.map(_.numRowsTotal).sum
    val totalInput = progresses.map(_.numInputRows).sum
    assert(lastState < totalInput,
      s"final state $lastState not below input $totalInput — nothing was ever released")
  }

  test("session-window state evicts closed sessions") {
    EventsStreaming.sessionWindowStream(spark, sf())
    val (progresses, stateOps) = stateTrail("graft_stream_swnative_")
    val removed = stateOps.map(_.numRowsRemoved).sum
    assert(removed > 0, "no session state was ever evicted — sessions never finalize")
    val lastState = progresses.filter(_.stateOperators.nonEmpty)
      .last.stateOperators.map(_.numRowsTotal).sum
    val totalInput = progresses.map(_.numInputRows).sum
    assert(lastState < totalInput)
  }
}
