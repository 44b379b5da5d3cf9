package graft

import graft.gen.TranscriptGen
import graft.model.{LabeledTurn, Turn}
import graft.state.{AutomatonRunner, Handlers}

/** Handler-equivalence (FIXTURES.md §3): the distributed automaton runner
  * must equal a plain sequential Scala execution of the same handler per
  * conversation in turn_idx order — the oracle executes the reference
  * algorithm (`/root/reference/examples/temp_monitor_flow.py:77-103`)
  * exactly as the reference's single-worker event loop would.
  */
class HandlerEquivalenceSpec extends SparkSpec {

  private val cfg = TranscriptGen.Config(nConvs = 40L, seed = 42L, hotConvs = 1, hotLen = 400)
  private def allTurns: Seq[Turn] =
    (0L until cfg.nConvs).flatMap(TranscriptGen.turnsFor(_, cfg))

  /** Sequential oracle: per key, in order, the reference's
    * categorize_temp + ChangeDetector.filter_event logic. */
  private def oracleChangeDetect(turns: Seq[Turn]): Seq[LabeledTurn] =
    turns.groupBy(_.conv_id).toSeq.flatMap { case (_, ts) =>
      var prev: Option[String] = None
      ts.sortBy(_.turn_idx).flatMap { t =>
        val l = Handlers.classify(t).head
        if (prev.contains(l.status)) None
        else { prev = Some(l.status); Some(l) }
      }
    }

  test("batch ChangeDetector equals sequential reference oracle row-for-row") {
    import spark.implicits._
    val got = AutomatonRunner.runBatch(
      TranscriptGen.dataset(spark, cfg), Handlers.ChangeDetector).collect()
    val want = oracleChangeDetect(allTurns)
    assert(got.toSet == want.toSet)
    assert(got.length == want.length) // multiset equality (no dup rows)
    // per-key emission order == turn_idx order
    got.groupBy(_.conv_id).foreach { case (_, rows) =>
      assert(rows.map(_.turn_idx).toSeq == rows.map(_.turn_idx).sorted.toSeq)
    }
  }

  test("classify thresholds match reference semantics") {
    val mk = (temp: Double) => Turn("c", 0, "user", s"x temp=${String.format(java.util.Locale.ROOT, "%.1f", Double.box(temp))}", "",
      new java.sql.Timestamp(0L))
    assert(Handlers.classify(mk(96.9)).head.status == "COLD")
    assert(Handlers.classify(mk(97.0)).head.status == "NOMINAL")
    assert(Handlers.classify(mk(99.0)).head.status == "NOMINAL")
    assert(Handlers.classify(mk(99.1)).head.status == "HOT")
  }

  test("pattern automaton finds exactly the user->tool->assistant sequences") {
    import spark.implicits._
    val got = AutomatonRunner.runBatch(
      TranscriptGen.dataset(spark, cfg), Handlers.UserToolAssistantPattern).collect()
    // oracle: sequential scan per conversation
    val want = allTurns.groupBy(_.conv_id).toSeq.flatMap { case (_, ts) =>
      var st = Handlers.UserToolAssistantPattern.initial
      ts.sortBy(_.turn_idx).flatMap { t =>
        val (s2, out) = Handlers.UserToolAssistantPattern.onTurn(st, t)
        st = s2; out
      }
    }
    assert(got.toSet == want.toSet && got.length == want.length)
    assert(want.nonEmpty, "fixture must actually contain the pattern")
  }

  test("summarizer emits one onComplete row per conversation") {
    import spark.implicits._
    val got = AutomatonRunner.runBatch(
      TranscriptGen.dataset(spark, cfg), Handlers.Summarizer).collect()
    assert(got.length == cfg.nConvs)
    val hot = got.find(_.conv_id == TranscriptGen.convId(0L)).get
    assert(hot.n_turns == 400 && hot.first_idx == 0 && hot.last_idx == 399)
  }

  test("flatMap arity accounting: 0/1/N outputs are exact (reference in_out_buffer)") {
    import spark.implicits._
    // filter (1->0), map (1->1), split (1->3) depending on turn_idx % 3
    val f = flow.Flow.transform[Turn, String] { t =>
      t.turn_idx % 3 match {
        case 0 => Seq.empty
        case 1 => Seq(s"${t.conv_id}:${t.turn_idx}")
        case _ => Seq.tabulate(3)(i => s"${t.conv_id}:${t.turn_idx}:$i")
      }
    }
    val in = allTurns
    val got = f(TranscriptGen.dataset(spark, cfg)).collect()
    val want = in.flatMap { t =>
      t.turn_idx % 3 match {
        case 0 => Seq.empty
        case 1 => Seq(s"${t.conv_id}:${t.turn_idx}")
        case _ => Seq.tabulate(3)(i => s"${t.conv_id}:${t.turn_idx}:$i")
      }
    }
    assert(got.sorted.toSeq == want.sorted)
  }
}
