package graft

import graft.streaming.StreamingOps

/** Structured Streaming forms must agree with their batch equivalents when
  * the stream is a bounded parquet directory (no late data). */
class StreamingSpec extends SparkTestBase {

  test("streaming tumbling window agg matches the batch q24 result") {
    // complete mode: append would (correctly) hold back windows newer than
    // the final watermark; for a bounded input we want full equality
    val stream = StreamingOps.eventsStream(spark, sfDir)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.tumblingCounts(stream), "tumbling_test", "complete")
    val want = operators.EventOps.q24Tumbling(spark, sfDir)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming dedup emits each (user_id, event_id) once") {
    val stream = StreamingOps.eventsStream(spark, sfDir)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.dedupStream(stream), "dedup_test")
    val n = Tables.events(spark, sfDir)
      .select("user_id", "event_id").distinct().count()
    assert(got.count() == n)
  }
}
