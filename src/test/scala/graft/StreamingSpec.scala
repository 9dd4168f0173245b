package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Structured Streaming twin must converge to the batch answer when
  * fed the same files (format("memory") + processAllAvailable drives
  * the whole backlog synchronously).
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestBase._

  test("streaming hourly rollup == batch hourly rollup") {
    val q = EventStream
      .hourlyRollupStream(spark, Sf0001)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_stream")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("hourly_stream")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val batch = graft.operators.EventOps
        .hourlyRollup(spark, Sf0001)
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(4)))
        .toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
