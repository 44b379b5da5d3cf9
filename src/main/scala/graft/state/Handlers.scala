package graft.state

import graft.model.{LabeledTurn, Turn}

/** The engine's built-in handler library: the reference's example event
  * handlers re-expressed over transcript turns, used by the
  * handler-equivalence tests (FIXTURES.md §3) and the flagship pipeline.
  */
object Handlers {

  /** Parse the deterministic numeric payload embedded in `text`
    * (`temp=XX.X`, written by TranscriptGen). Returns NaN when absent. */
  def parseTemp(text: String): Double = {
    val i = text.indexOf("temp=")
    if (i < 0) Double.NaN
    else {
      val s = text.substring(i + 5).takeWhile(c => c.isDigit || c == '.' || c == '-')
      try s.toDouble catch { case _: NumberFormatException => Double.NaN }
    }
  }

  /** Stateless classify — the reference's `categorize_temp`
    * (`/root/reference/examples/temp_monitor_flow.py:94-103`): COLD < 97,
    * HOT > 99, else NOMINAL. Arity 1 -> 1. */
  def classify(t: Turn): Seq[LabeledTurn] = {
    val temp = parseTemp(t.text)
    val status =
      if (temp < 97.0) "COLD"
      else if (temp > 99.0) "HOT"
      else "NOMINAL"
    Seq(LabeledTurn(t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts, temp, status))
  }

  /** Stateful suppress-unchanged — the reference's `ChangeDetector`
    * (`examples/temp_monitor_flow.py:77-92`): emit a turn only when its
    * classified status differs from the previous status of the same key;
    * the first turn of a key is always emitted. Arity 1 -> 0|1. */
  object ChangeDetector extends TurnAutomaton[Option[String], LabeledTurn] {
    override def initial: Option[String] = None
    override def onTurn(prev: Option[String], turn: Turn): (Option[String], Seq[LabeledTurn]) = {
      val labeled = Handlers.classify(turn).head
      prev match {
        case Some(p) if p == labeled.status => (prev, Seq.empty)
        case _ => (Some(labeled.status), Seq(labeled))
      }
    }
  }

  /** A CEP pattern automaton beyond the reference's examples: detect the
    * sequence user -> tool -> assistant within one conversation (an "agent
    * acted" pattern) and emit one match row per completed pattern. This is
    * the ReFlow handler-chain idea generalized to an explicit automaton. */
  final case class PatternMatch(conv_id: String, user_idx: Int, tool_idx: Int,
                                assistant_idx: Int, tool: String,
                                ts: java.sql.Timestamp)
  object UserToolAssistantPattern extends TurnAutomaton[(Int, Int, String), PatternMatch] {
    // state: (pending user idx or -1, pending tool idx or -1, tool name)
    override def initial: (Int, Int, String) = (-1, -1, "")
    override def onTurn(st: (Int, Int, String), t: Turn): ((Int, Int, String), Seq[PatternMatch]) =
      t.role match {
        case "user" => ((t.turn_idx, -1, ""), Seq.empty)
        case "tool" if st._1 >= 0 => ((st._1, t.turn_idx, t.tool), Seq.empty)
        case "assistant" if st._1 >= 0 && st._2 >= 0 =>
          (initial, Seq(PatternMatch(t.conv_id, st._1, st._2, t.turn_idx, st._3, t.ts)))
        case _ => (st, Seq.empty)
      }
  }

  /** Running per-conversation statistics emitted once at completion —
    * exercises onComplete (the reference's quiesce-time behavior). */
  final case class ConvSummary(conv_id: String, n_turns: Int, n_user: Int,
                               n_tool: Int, first_idx: Int, last_idx: Int)
  object Summarizer extends TurnAutomaton[ConvSummary, ConvSummary] {
    override def initial: ConvSummary = ConvSummary("", 0, 0, 0, Int.MaxValue, -1)
    override def onTurn(s: ConvSummary, t: Turn): (ConvSummary, Seq[ConvSummary]) =
      (ConvSummary(t.conv_id, s.n_turns + 1,
        s.n_user + (if (t.role == "user") 1 else 0),
        s.n_tool + (if (t.role == "tool") 1 else 0),
        math.min(s.first_idx, t.turn_idx), math.max(s.last_idx, t.turn_idx)), Seq.empty)
    override def onComplete(s: ConvSummary): Seq[ConvSummary] =
      if (s.n_turns == 0) Seq.empty else Seq(s)
  }
}
