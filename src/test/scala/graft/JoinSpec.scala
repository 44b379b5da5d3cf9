package graft

import java.sql.Timestamp

import graft.join.StreamJoins
import graft.model.Turn

/** Stream-stream join + as-of join goldens (FIXTURES.md §4 join-pairs). */
class JoinSpec extends SparkSpec {

  // +60 min base: a row at exactly the initial watermark (epoch 0) is
  // late-filtered by stateful operators; real event times are never 1970
  private def ts(min: Long): Timestamp = new Timestamp((min + 60) * 60000L)
  private def t(c: String, i: Int, min: Long, role: String, tool: String = ""): Turn =
    Turn(c, i, role, s"$role$i", tool, ts(min))

  // conv X: user@0, tool@3 (match), tool@6 (outside 5min), user@10, tool@14 (match)
  // conv Y: tool@2 with no preceding user within window; user@20 with no tool
  private lazy val fixture = {
    import spark.implicits._
    Seq(
      t("X", 0, 0, "user"), t("X", 1, 3, "tool", "search"),
      t("X", 2, 6, "tool", "calc"), t("X", 3, 10, "user"),
      t("X", 4, 14, "tool", "browser"),
      t("Y", 0, 2, "tool", "db"), t("Y", 1, 20, "user")
    ).toDS()
  }

  test("batch user-tool range join emits exactly the in-window pairs") {
    val got = StreamJoins.userToolPairs(fixture, "5 minutes").collect()
      .map(p => (p.conv_id, p.user_turn_idx, p.tool_turn_idx, p.tool, p.lag_sec)).toSet
    assert(got == Set(
      ("X", 0, 1, "search", 180L),
      ("X", 3, 4, "browser", 240L)))
  }

  test("streaming user-tool join (watermarked both sides) equals batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Turn]
    val joined = StreamJoins.userToolPairs(ms.toDS(), "5 minutes",
      watermark = Some("10 minutes"))
    val q = joined.toDF().writeStream.format("memory").queryName("sj")
      .outputMode("append").start()
    try {
      ms.addData(t("X", 0, 0, "user"), t("X", 1, 3, "tool", "search"))
      q.processAllAvailable()
      ms.addData(t("X", 2, 6, "tool", "calc"), t("X", 3, 10, "user"),
        t("X", 4, 14, "tool", "browser"), t("Y", 0, 2, "tool", "db"))
      q.processAllAvailable()
      ms.addData(t("__eos__", 0, 9000, "user"), t("__eos__", 1, 9001, "tool", "x"))
      q.processAllAvailable()
      val got = spark.table("sj").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
      // sentinel pair joins too; filter it
      assert(got.filterNot(_._1 == "__eos__") == Set(
        ("X", 0, 1, "search"), ("X", 3, 4, "browser")))
    } finally q.stop()
  }

  test("stream-static enrichment joins a broadcast dimension with no stream state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq(("search", "web"), ("browser", "web"), ("db", "storage"))
      .toDF("tool", "category")
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Turn]
    val enriched = StreamJoins.enrichWithStatic(ms.toDS(), dim)
    val q = enriched.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      ms.addData(t("X", 1, 3, "tool", "search"), t("X", 3, 10, "user"))
      q.processAllAvailable()
      ms.addData(t("Y", 0, 2, "tool", "db"), t("X", 4, 14, "tool", "calc"))
      q.processAllAvailable()
      val got = spark.table("enrich")
        .select("conv_id", "turn_idx", "category").collect()
        .map(r => (r.getString(0), r.getInt(1), Option(r.getString(2)))).toSet
      assert(got == Set(
        ("X", 1, Some("web")),      // matched dimension row
        ("X", 3, None),             // non-tool turn: left join keeps it
        ("Y", 0, Some("storage")),
        ("X", 4, None)))            // unknown tool: kept, null category
      // no stateful operator: enrichment must not create streaming state
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("as-of join attaches the latest user turn at-or-before each tool turn") {
    val got = StreamJoins.asOfUserForTool(fixture).collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("tool_turn_idx"),
        r.getAs[Int]("user_turn_idx"), r.getAs[Long]("lag_sec"))).toSet
    assert(got == Set(
      ("X", 1, 0, 180L),
      ("X", 2, 0, 360L),   // as-of has no upper bound: tool@6 -> user@0
      ("X", 4, 3, 240L)))
    // Y's tool@2 has no preceding user -> excluded
  }
}
