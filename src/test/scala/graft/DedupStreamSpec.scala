package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.Turn
import graft.operators.StreamingDedup

/** Streaming exact-dedup semantics: redelivered events are invisible
  * downstream (reference delivery contract §2.3-2). */
class DedupStreamSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp((min + 60) * 60000L)
  private def t(c: String, i: Int, min: Long): Turn =
    Turn(c, i, "user", s"u$i", "", ts(min))

  test("duplicates within the watermark horizon are dropped across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Turn]
    val q = StreamingDedup.withEventTimeBound(ms.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      ms.addData(t("d1", 0, 0), t("d1", 1, 5), t("d1", 0, 0)) // dup in-batch
      q.processAllAvailable()
      ms.addData(t("d1", 1, 5), t("d1", 2, 10)) // redelivery across batches
      q.processAllAvailable()
      val got = spark.table("dedup").as[Turn].collect()
      assert(got.map(_.turn_idx).sorted.toSeq == Seq(0, 1, 2))
    } finally q.stop()
  }

  test("batch exact dedup keeps one row per (conv_id, turn_idx)") {
    import spark.implicits._
    val in = Seq(t("d2", 0, 0), t("d2", 0, 0), t("d2", 1, 5)).toDS()
    assert(StreamingDedup.exact(in).count() == 2)
  }
}
