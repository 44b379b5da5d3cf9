package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.flow.{Flow, FlowSink, FlowSource}
import graft.gen.TranscriptGen
import graft.join.StreamJoins
import graft.model.{LabeledTurn, Turn}
import graft.sources.TranscriptTable
import graft.state.{AutomatonRunner, Handlers}
import graft.windows.Windows

/** The engine's NATIVE operators over the contract transcripts table
  * (BASELINE.json input_hint). The table is synthesized deterministically
  * (TranscriptGen, seed 42) — the same generator at every parallelism
  * level yields bit-identical input, so these results are stable across
  * runs and machines. CEP/streaming semantics here are not expressible as
  * single ANSI-SQL statements over the driver's parquet tables, so these
  * register as rows-only checks; their row-for-row correctness is pinned
  * by the ScalaTest oracle suites (sbt -batch test) instead.
  */
object TranscriptQueries {

  val VerifyCfg: TranscriptGen.Config =
    TranscriptGen.Config(nConvs = 300L, seed = 42L, hotConvs = 1, hotLen = 800)

  def transcripts(spark: SparkSession): Dataset[Turn] =
    TranscriptGen.dataset(spark, VerifyCfg)

  private def labeledEnc(spark: SparkSession) = {
    import spark.implicits._
    implicitly[org.apache.spark.sql.Encoder[LabeledTurn]]
  }

  /** Flagship: classify -> change-detect over conversations, batch form.
    * The Flow DSL chain mirrors the reference's example flow
    * (`/root/reference/examples/temp_monitor_flow.py:132-138`:
    * source -> categorize -> change_detector -> sink). */
  def changeDetectBatch(spark: SparkSession): DataFrame = {
    implicit val enc = labeledEnc(spark)
    Flow.stateful(Handlers.ChangeDetector).apply(transcripts(spark))
      .toDF().select("conv_id", "turn_idx", "status", "temp")
  }

  /** Flagship, streaming form: file-stream source -> watermark -> keyed
    * ordered automaton -> exactly-once epoch-idempotent sink -> read back.
    * Runs a real StreamingQuery (AvailableNow) inside the verify session;
    * a far-future sentinel row drains the stream (finite-job quiesce,
    * reference `cluster.py:51-89`). */
  def changeDetectStream(spark: SparkSession): DataFrame = {
    implicit val enc = labeledEnc(spark)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_t41_${System.nanoTime()}"
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    TranscriptTable.write(transcripts(spark), in, nBuckets = 8)
    appendSentinel(spark, in)
    val stream = FlowSource.stream(spark, in)
    val result = AutomatonRunner.runStreaming(stream, Handlers.ChangeDetector,
      watermarkDelay = "10 minutes")
    val sink = FlowSink.runAvailableNow(result, out, ckpt)
    sink.readCommitted(spark).select("conv_id", "turn_idx", "status", "temp")
  }

  /** Append one far-future sentinel turn so the final micro-batch's
    * watermark passes every real event (drains buffers + fires timeouts). */
  def appendSentinel(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val eos = Seq(Turn(AutomatonRunner.SentinelConvId, 0, "system", "eos", "",
      new Timestamp(4102444800000L))) // 2100-01-01
    eos.toDS().withColumn(TranscriptTable.BucketCol, lit(999))
      .write.mode("append").partitionBy(TranscriptTable.BucketCol).parquet(dir)
  }

  val all: Seq[Q] = Seq(
    Q("t40_cep_change_batch", (s, _) => changeDetectBatch(s), None),
    Q("t41_cep_change_stream", (s, _) => changeDetectStream(s), None),
    Q("t42_conv_tumbling",
      (s, _) => Windows.tumbling(transcripts(s), "10 minutes")
        .select(col("win")("start").as("win_start"), col("conv_id"),
          col("n_turns"), col("n_tool"), col("first_idx"), col("last_idx")),
      None),
    Q("t43_conv_sessions",
      (s, _) => Windows.session(transcripts(s), "30 minutes")
        .select(col("win")("start").as("session_start"),
          col("win")("end").as("session_end"), col("conv_id"), col("n_turns")),
      None),
    Q("t44_user_tool_join",
      (s, _) => StreamJoins.userToolPairs(transcripts(s), "5 minutes").toDF(),
      None),
    Q("t45_asof_user_tool",
      (s, _) => StreamJoins.asOfUserForTool(transcripts(s)),
      None),
    Q("t46_pattern_automaton",
      (s, _) => {
        import s.implicits._
        AutomatonRunner.runBatch(transcripts(s), Handlers.UserToolAssistantPattern).toDF()
      },
      None),
    Q("t47_conv_summaries",
      (s, _) => {
        import s.implicits._
        AutomatonRunner.runBatch(transcripts(s), Handlers.Summarizer).toDF()
      },
      None)
  )
}
