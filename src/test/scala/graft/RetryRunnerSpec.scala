package graft

import graft.streaming.{RetryRunner, TwseStreaming}

/** G3 app-level scheduling semantics: retries=2 with a fixed delay,
  * around a whole micro-batch unit (reference `Final_app.py:18-19`).
  */
class RetryRunnerSpec extends SparkTestBase {

  test("a transient failure is retried on the reference schedule (2 retries, fixed delay)") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val attempts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = RetryRunner.withRetries(retries = 2, delayMs = 300000L,
      sleep = slept += _) { attempt =>
      attempts += attempt
      if (attempt < 2) throw new RuntimeException(s"transient #$attempt")
      "ok"
    }
    assert(out === "ok")
    assert(attempts.toSeq === Seq(0, 1, 2)) // initial + 2 retries
    assert(slept.toSeq === Seq(300000L, 300000L)) // 5-minute delay between
  }

  test("exhausted retries rethrow the last failure") {
    val e = intercept[RuntimeException] {
      RetryRunner.withRetries(retries = 2, delayMs = 1L, sleep = _ => ()) {
        attempt => throw new RuntimeException(s"permanent #$attempt")
      }
    }
    assert(e.getMessage === "permanent #2")
  }

  test("the flagship micro-batch recovers through the retry loop after an injected failure") {
    val back = RetryRunner.withRetries(retries = 2, delayMs = 1L, sleep = _ => ()) {
      attempt =>
        if (attempt == 0) throw new RuntimeException("injected pre-run failure")
        TwseStreaming.flagshipStream(spark)
    }
    assert(back.count() === 1) // the golden flagship row arrived exactly once
  }
}
