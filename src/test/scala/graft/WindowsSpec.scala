package graft

import java.sql.Timestamp

import graft.model.Turn
import graft.windows.Windows

/** Window-semantics goldens (FIXTURES.md §4): hand-checked tumbling /
  * sliding / session window contents, including boundary-exact timestamps. */
class WindowsSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)
  private def turn(c: String, i: Int, min: Long, role: String = "user"): Turn =
    Turn(c, i, role, s"t$i", "", ts(min))

  // conversation A: turns at 0, 9, 10 (boundary), 25 min
  // conversation B: turns at 5, 41 min
  private lazy val fixture = {
    import spark.implicits._
    Seq(
      turn("A", 0, 0), turn("A", 1, 9), turn("A", 2, 10), turn("A", 3, 25),
      turn("B", 0, 5), turn("B", 1, 41)
    ).toDS()
  }

  test("tumbling 10-min windows: boundary turn falls in the NEXT window") {
    val got = Windows.tumbling(fixture, "10 minutes").collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("win").getTimestamp(0),
        r.getAs[String]("conv_id"), r.getAs[Long]("n_turns"))).toSet
    assert(got == Set(
      (ts(0), "A", 2L),   // turns at 0, 9
      (ts(10), "A", 1L),  // boundary turn at exactly 10:00
      (ts(20), "A", 1L),
      (ts(0), "B", 1L),
      (ts(40), "B", 1L)))
  }

  test("sliding 10/5-min windows: each turn appears in exactly 2 windows") {
    val got = Windows.sliding(fixture, "10 minutes", "5 minutes").collect()
    val perTurnWindows = got.map(_.getAs[Long]("n_turns")).sum
    assert(perTurnWindows == fixture.count() * 2)
    // turn A@9 belongs to windows starting 0 and 5
    val aWins = got.filter(_.getAs[String]("conv_id") == "A")
      .map(r => r.getAs[org.apache.spark.sql.Row]("win").getTimestamp(0)).toSet
    assert(aWins.contains(ts(5)) && aWins.contains(ts(0)))
  }

  test("session windows (gap 30): A is one session, B splits into two") {
    val got = Windows.session(fixture, "30 minutes").collect()
      .map(r => (r.getAs[String]("conv_id"),
        r.getAs[org.apache.spark.sql.Row]("win").getTimestamp(0),
        r.getAs[org.apache.spark.sql.Row]("win").getTimestamp(1),
        r.getAs[Long]("n_turns"))).toSet
    assert(got == Set(
      ("A", ts(0), ts(55), 4L),  // 0..25, end = last + gap = 55
      ("B", ts(5), ts(35), 1L),  // 5; next turn at 41 >= 5+30? 41 >= 35 -> new session
      ("B", ts(41), ts(71), 1L)))
  }

  test("streaming session window with watermark matches batch contents") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Turn]
    val agg = Windows.session(ms.toDS(), "30 minutes", watermark = Some("15 minutes"))
      .selectExpr("win.start as s", "win.end as e", "conv_id", "n_turns")
    val q = agg.writeStream.format("memory").queryName("wsess")
      .outputMode("append").start()
    try {
      ms.addData(turn("A", 0, 60), turn("A", 1, 69), turn("B", 0, 65))
      q.processAllAvailable()
      ms.addData(turn("A", 2, 85), turn("B", 1, 101)) // A merges; B splits
      q.processAllAvailable()
      ms.addData(turn("__eos__", 0, 10000))
      q.processAllAvailable()
      val got = spark.table("wsess").collect()
        .map(r => (r.getString(2), r.getTimestamp(0), r.getTimestamp(1), r.getLong(3)))
        .toSet
      assert(got == Set(
        ("A", ts(60), ts(115), 3L),   // 60,69,85 one session (gaps < 30)
        ("B", ts(65), ts(95), 1L),    // 65; next at 101 >= 95 -> new session
        ("B", ts(101), ts(131), 1L)))
    } finally q.stop()
  }

  test("streaming tumbling window with watermark matches batch contents") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Turn]
    val agg = Windows.tumbling(ms.toDS(), "10 minutes", watermark = Some("15 minutes"))
      .selectExpr("win.start as win_start", "conv_id", "n_turns")
    val q = agg.writeStream.format("memory").queryName("wtumb")
      .outputMode("append").start()
    try {
      ms.addData(turn("A", 0, 0), turn("A", 1, 9), turn("B", 0, 5))
      q.processAllAvailable()
      ms.addData(turn("A", 2, 10), turn("A", 3, 25), turn("B", 1, 41))
      q.processAllAvailable()
      ms.addData(turn("__eos__", 0, 10000)) // close all real windows
      q.processAllAvailable()
      val got = spark.table("wtumb")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      // the sentinel's own window stays open (watermark never passes it)
      assert(got == Set(
        (ts(0), "A", 2L), (ts(10), "A", 1L), (ts(20), "A", 1L),
        (ts(0), "B", 1L), (ts(40), "B", 1L)))
    } finally q.stop()
  }
}
