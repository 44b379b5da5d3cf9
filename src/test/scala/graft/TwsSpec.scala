package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.flow.{FlowSink, FlowSource}
import graft.gen.TranscriptGen
import graft.model.{LabeledTurn, Turn}
import graft.sources.TranscriptTable
import graft.state.{AutomatonRunner, Handlers}

/** transformWithState runtime: must be row-for-row identical to the
  * flatMapGroupsWithState runtime (both call the same stepKey/flushKey
  * core) and to the batch oracle — same ordering, dedup, idle-eviction and
  * drain semantics. Runs on the RocksDB provider (a TWS requirement; the
  * shared test session already uses it). */
class TwsSpec extends SparkSpec {

  import AutomatonRunner.SentinelConvId
  private val cfg = TranscriptGen.Config(nConvs = 25L, seed = 42L)

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)
  private def turn(c: String, i: Int, min: Long, temp: Double): Turn =
    Turn(c, i, "user",
      s"x temp=${String.format(java.util.Locale.ROOT, "%.1f", Double.box(temp))}",
      "", ts(min))
  private def eos(min: Long): Turn =
    Turn(SentinelConvId, 0, "system", "eos", "", ts(min))

  test("tws automaton == batch automaton over a finite stream (drain via sentinel)") {
    import spark.implicits._
    val in = tmpDir("tws_in"); val out = tmpDir("tws_out"); val ck = tmpDir("tws_ck")
    TranscriptTable.writeTimeSliced(TranscriptGen.dataset(spark, cfg), in, sliceMinutes = 60)
    TranscriptQueries.appendSentinel(spark, in)
    val result = AutomatonRunner.runStreamingTws(
      FlowSource.stream(spark, in, maxFilesPerTrigger = Some(1)),
      Handlers.ChangeDetector, watermarkDelay = "90 minutes")
    val sink = FlowSink.runAvailableNow(result, out, ck)
    val got = sink.readCommitted(spark).as[LabeledTurn].collect()
    val want = AutomatonRunner.runBatch(TranscriptGen.dataset(spark, cfg),
      Handlers.ChangeDetector).collect().toSet
    assert(got.toSet == want)
    assert(got.length == want.size, "no duplicates")
  }

  test("tws re-orders out-of-order arrival and drops within-batch duplicates") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Turn]
    val result = AutomatonRunner.runStreamingTws(ms.toDS(), Handlers.ChangeDetector,
      watermarkDelay = "30 minutes")
    val q = result.writeStream.format("memory").queryName("tws_ooo")
      .outputMode("append").start()
    try {
      // turns 2,3 first (in-window), turn 2 duplicated within the batch
      ms.addData(turn("c1", 2, 120, 100.0), turn("c1", 3, 130, 100.5),
        turn("c1", 2, 120, 100.0))
      q.processAllAvailable()
      // the earlier turns arrive late but above watermark
      ms.addData(turn("c1", 0, 101, 98.0), turn("c1", 1, 110, 96.0))
      q.processAllAvailable()
      ms.addData(eos(10000)); q.processAllAvailable()
      ms.addData(eos(20000)); q.processAllAvailable()
      val got = spark.table("tws_ooo").as[LabeledTurn].collect().sortBy(_.turn_idx)
      assert(got.map(_.turn_idx).toSeq == Seq(0, 1, 2))
      assert(got.map(_.status).toSeq == Seq("NOMINAL", "COLD", "HOT"))
    } finally q.stop()
  }

  test("tws kill mid-stream + restart from checkpoint: output unchanged, exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val in = tmpDir("tws_in2"); val out = tmpDir("tws_out2"); val ck = tmpDir("tws_ck2")
    TranscriptTable.writeTimeSliced(TranscriptGen.dataset(spark, cfg), in, sliceMinutes = 60)
    TranscriptQueries.appendSentinel(spark, in)
    val sink = new graft.sink.ExactlyOnceParquetSink(out)
    def mkQuery(failAfter: Option[Int]) = {
      val result = AutomatonRunner.runStreamingTws(
        FlowSource.stream(spark, in, maxFilesPerTrigger = Some(1)),
        Handlers.ChangeDetector, watermarkDelay = "90 minutes")
      var n = 0
      result.writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[LabeledTurn], epoch: Long) =>
          sink.addBatch(df.toDF(), epoch)
          n += 1
          failAfter.foreach(k => if (n >= k) throw new RuntimeException("injected crash"))
        }
        .trigger(Trigger.AvailableNow()).start()
    }
    val q1 = mkQuery(Some(3))
    intercept[Exception] { q1.awaitTermination() }
    val q2 = mkQuery(None)
    q2.awaitTermination()
    val got = sink.readCommitted(spark).as[LabeledTurn].collect()
    val want = AutomatonRunner.runBatch(TranscriptGen.dataset(spark, cfg),
      Handlers.ChangeDetector).collect().toSet
    assert(got.toSet == want)
    assert(got.length == want.size, "no duplicates under redelivery")
  }

  test("tws idle-gap timer completes a conversation (onComplete fires once)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Turn]
    val result = AutomatonRunner.runStreamingTws(ms.toDS(), Handlers.Summarizer,
      watermarkDelay = "10 minutes", idleGapMs = 20 * 60 * 1000L)
    val q = result.writeStream.format("memory").queryName("tws_done")
      .outputMode("append").start()
    try {
      ms.addData(turn("s1", 0, 100, 98.0), turn("s1", 1, 105, 98.0))
      q.processAllAvailable()
      assert(spark.table("tws_done").count() == 0) // still active
      ms.addData(eos(10000)); q.processAllAvailable()
      ms.addData(eos(20000)); q.processAllAvailable()
      val got = spark.table("tws_done")
        .as[Handlers.ConvSummary].collect()
      assert(got.toSeq == Seq(Handlers.ConvSummary("s1", 2, 2, 0, 0, 1)))
    } finally q.stop()
  }
}
