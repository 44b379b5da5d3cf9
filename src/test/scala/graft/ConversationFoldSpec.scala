package graft

import graft.gen.TranscriptGen
import graft.model.LabeledTurn
import graft.plans.ConversationFold
import graft.state.{AutomatonRunner, Handlers}

/** The custom Catalyst operator (ConversationFoldPlan/Exec) must equal the
  * object-path runner and therefore the sequential reference oracle, and
  * its physical plan must show exactly one shuffle + sort feeding the
  * streaming fold. */
class ConversationFoldSpec extends SparkSpec {

  private val cfg = TranscriptGen.Config(nConvs = 30L, seed = 42L, hotConvs = 1, hotLen = 300)

  test("native fold == groupByKey fold (ChangeDetector, Pattern, Summarizer)") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, cfg)
    val nativeCd = ConversationFold.run(turns, Handlers.ChangeDetector).collect()
    val objectCd = AutomatonRunner.runBatch(turns, Handlers.ChangeDetector).collect()
    assert(nativeCd.toSet == objectCd.toSet && nativeCd.length == objectCd.length)

    val nativeP = ConversationFold.run(turns, Handlers.UserToolAssistantPattern).collect()
    val objectP = AutomatonRunner.runBatch(turns, Handlers.UserToolAssistantPattern).collect()
    assert(nativeP.toSet == objectP.toSet && nativeP.length == objectP.length)

    // onComplete path (fires on key change + end of partition)
    val nativeS = ConversationFold.run(turns, Handlers.Summarizer).collect()
    assert(nativeS.length == cfg.nConvs)
  }

  test("physical plan: one exchange + one sort feeding ConversationFoldExec") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, cfg)
    val plan = ConversationFold.run(turns, Handlers.ChangeDetector)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("ConversationFold"), plan) // Exec suffix stripped in simpleString
    assert(plan.contains("Exchange hashpartitioning(conv_id"), plan)
    assert(plan.contains("Sort [conv_id"), plan)
  }

  test("per-key emission order is turn_idx order") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, cfg).repartition(7) // scramble
    val got = ConversationFold.run(turns, Handlers.ChangeDetector)
      .mapPartitions(it => Iterator(it.toArray))
      .collect()
    got.foreach { part: Array[LabeledTurn] =>
      part.groupBy(_.conv_id).foreach { case (_, rows) =>
        val idxs = rows.map(_.turn_idx).toSeq
        assert(idxs == idxs.sorted)
      }
    }
  }
}
