package graft

import graft.flow.{FlowSink, FlowSource}
import graft.gen.TranscriptGen
import graft.model.Turn
import graft.sink.ExactlyOnceParquetSink
import graft.sources.TranscriptTable

/** Fan-out (the reference's multi-child `send_to`, `worker.py:87-91`):
  * one stream, multiple exactly-once sinks, each receiving the full copy. */
class FanOutSpec extends SparkSpec {

  test("fan-out delivers the identical stream to every sink exactly once") {
    import spark.implicits._
    val cfg = TranscriptGen.Config(nConvs = 10L, seed = 3L)
    val in = tmpDir("fan_in"); val ck = tmpDir("fan_ck")
    TranscriptTable.writeTimeSliced(TranscriptGen.dataset(spark, cfg), in,
      sliceMinutes = 240)
    val sinks = Map(
      "a" -> new ExactlyOnceParquetSink(tmpDir("fan_a")),
      "b" -> new ExactlyOnceParquetSink(tmpDir("fan_b")))
    val q = FlowSink.fanOut(FlowSource.stream(spark, in, None), ck, sinks)
    q.awaitTermination()
    val a = sinks("a").readCommitted(spark).as[Turn].collect().toSet
    val b = sinks("b").readCommitted(spark).as[Turn].collect().toSet
    val want = (0L until cfg.nConvs).flatMap(TranscriptGen.turnsFor(_, cfg)).toSet
    assert(a == want && b == want)
  }
}
