package graft.state

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Turn

/** Randomized property over the shared stepKey/flushKey core (the single
  * walk both streaming runtimes execute) — pure JVM, no Spark session.
  *
  * Model: turns of one conversation delivered across micro-batches in a
  * RANDOM order with RANDOM duplication; the watermark advances exactly as
  * Spark's does (max event time seen so far minus the delay) and rows at
  * or below the watermark are dropped before the operator, exactly as
  * Spark's stateful-operator late filter does. Invariant: the
  * concatenated emissions equal one pass over the SURVIVING turns in
  * strictly increasing turn_idx order, each exactly once, with
  * onComplete exactly once at the end — for ANY schedule. */
class AutomatonCoreSpec extends AnyFunSuite {

  /** Emits its turn_idx; emits -1 from onComplete. */
  private object Echo extends TurnAutomaton[Int, Int] {
    def initial: Int = 0
    def onTurn(s: Int, t: Turn): (Int, Seq[Int]) = (s + 1, Seq(t.turn_idx))
    override def onComplete(s: Int): Seq[Int] = Seq(-1)
  }

  private val DelayMs = 10 * 60 * 1000L

  private def scenario(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val n = 1 + rnd.nextInt(40)
    var tsMs = 3600_000L
    val turns = (0 until n).map { i =>
      tsMs += 5000L + rnd.nextInt(120) * 1000L
      Turn("c", i, "user", s"t$i", "", new Timestamp(tsMs))
    }
    // random delivery order, ~20% duplicated, split into 1..6 batches
    val deliver = rnd.shuffle(turns.toList).flatMap(t =>
      if (rnd.nextDouble() < 0.2) List(t, t) else List(t))
    val nBatches = 1 + rnd.nextInt(6)
    val batches = deliver.zipWithIndex
      .groupBy(_._2 % nBatches).toSeq.sortBy(_._1).map(_._2.map(_._1))

    var wm = Long.MinValue
    var st = AutomatonRunner.EmptyStateRow
    val out = Vector.newBuilder[Int]
    val survivedIdx = scala.collection.mutable.Set.empty[Int]
    batches.foreach { b =>
      val survivors = b.filter(_.ts.getTime > wm) // Spark's late filter
      survivors.foreach(t => survivedIdx += t.turn_idx)
      val (s0, buffered) = AutomatonRunner.decodeState(Echo, st)
      val (st1, os) = AutomatonRunner.stepKey(Echo, st, s0, buffered,
        survivors.iterator, wm)
      st = st1; out ++= os
      val maxTs = b.map(_.ts.getTime).max
      wm = math.max(wm, maxTs - DelayMs)
    }
    val (s0, buffered) = AutomatonRunner.decodeState(Echo, st)
    out ++= AutomatonRunner.flushKey(Echo, st, s0, buffered)

    val got = out.result()
    val want = survivedIdx.toSeq.sorted :+ -1
    assert(got == want,
      s"seed=$seed n=$n batches=$nBatches\n got=$got\nwant=$want")
  }

  (1 to 40).foreach { seed =>
    test(s"any delivery schedule processes each surviving turn exactly once, in order (seed $seed)") {
      scenario(seed)
    }
  }
}
