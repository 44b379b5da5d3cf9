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
    TranscriptTable.writeTimeSliced(transcripts(spark), in, sliceMinutes = 60)
    appendSentinel(spark, in)
    val stream = FlowSource.stream(spark, in, maxFilesPerTrigger = Some(4))
    val result = AutomatonRunner.runStreaming(stream, Handlers.ChangeDetector,
      watermarkDelay = "90 minutes")
    val sink = FlowSink.runAvailableNow(result, out, ckpt)
    sink.readCommitted(spark).select("conv_id", "turn_idx", "status", "temp")
  }

  /** Append TWO far-future sentinel files (separate appends -> separate
    * micro-batches) so the stream drains deterministically: the first
    * sentinel raises the max event time; the second is processed AFTER the
    * watermark has advanced past all real data, flushing every buffer and
    * firing all timeouts — without relying on a trailing no-data batch
    * (which a restarted AvailableNow query does not always run). This is the
    * finite-job quiesce of the reference (`cluster.py:51-89`). */
  def appendSentinel(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq(4102444800000L, 4102444860000L).zipWithIndex.foreach { case (ms, i) =>
      Seq(Turn(AutomatonRunner.SentinelConvId, i, "system", "eos", "",
        new Timestamp(ms))).toDS()
        .coalesce(1).write.mode("append").parquet(dir)
    }
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
      None),
    // columnar classify via the custom codegen'd ParseTemp expression —
    // the whole-stage-codegen twin of the typed automaton path
    Q("t48_classify_columnar",
      (s, _) => transcripts(s).toDF()
        .select(col("conv_id"), col("turn_idx"),
          graft.functions.ParseTemp.parse_temp(col("text")).as("temp"))
        .withColumn("status",
          // Spark SQL orders NaN above every double, so `temp > 99` would
          // classify a missing payload HOT; the typed twin (Handlers
          // .classify) yields NOMINAL for NaN — guard to keep them equal
          when(isnan(col("temp")), "NOMINAL")
            .when(col("temp") < 97.0, "COLD")
            .when(col("temp") > 99.0, "HOT").otherwise("NOMINAL")),
      None),
    // skew-safe per-conversation stats over a table with a hot conversation
    Q("t49_salted_conv_stats",
      (s, _) => graft.shuffle.Salting.convStatsSalted(transcripts(s).toDF()),
      None),
    // the custom Catalyst operator (LogicalPlan+Strategy+SparkPlan): sort-
    // based streaming fold — O(state) memory per key at any conversation
    // size (equality with the object path pinned in ConversationFoldSpec)
    Q("t51_native_fold",
      (s, _) => {
        import s.implicits._
        graft.plans.ConversationFold.run(transcripts(s), Handlers.ChangeDetector)
          .toDF().select("conv_id", "turn_idx", "status", "temp")
      },
      None),
    // exact dedup under redelivery: input with every turn duplicated must
    // come out single (the streaming twin is pinned in DedupStreamSpec)
    Q("t50_dedup_redelivery",
      (s, _) => {
        val t = transcripts(s)
        graft.operators.StreamingDedup.exact(t.union(t)).toDF()
      },
      None)
  )
}
