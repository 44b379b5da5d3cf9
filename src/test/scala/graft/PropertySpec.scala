package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.Turn
import graft.state.{AutomatonRunner, Handlers}

/** Property-based invariants (FIXTURES.md §5) over random conversation
  * interleavings: (a) per-conv_id output order equals turn_idx order,
  * (b) multiset-exact equivalence with the sequential oracle, (c) window
  * assignment — under arbitrary shuffling of arrival order. Uses ScalaCheck
  * generators with fixed seeds (deterministic, no scalatestplus bridge). */
class PropertySpec extends SparkSpec {

  private val genConvs: Gen[Seq[Turn]] = for {
    nConvs <- Gen.choose(1, 6)
    lens <- Gen.listOfN(nConvs, Gen.choose(1, 30))
    temps <- Gen.listOfN(lens.sum, Gen.choose(90.0, 106.0))
  } yield {
    var k = 0
    lens.zipWithIndex.flatMap { case (len, c) =>
      (0 until len).map { i =>
        val temp = math.round(temps(k) * 10) / 10.0; k += 1
        Turn(s"pc$c", i, "user", s"x temp=${String.format(java.util.Locale.ROOT, "%.1f", Double.box(temp))}", "",
          new Timestamp((c * 100000L + i * 61L) * 1000L))
      }
    }
  }

  private def samples(n: Int): Seq[(Seq[Turn], Long)] =
    (1 to n).map { i =>
      val s = genConvs(Gen.Parameters.default.withSize(40), Seed(i.toLong * 7919))
        .getOrElse(Seq.empty)
      (s, i.toLong * 104729)
    }.filter(_._1.nonEmpty)

  test("property: distributed automaton == sequential oracle for any interleaving") {
    import spark.implicits._
    samples(8).foreach { case (turns, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(turns)
      val got = AutomatonRunner.runBatch(
        spark.createDataset(shuffled), Handlers.ChangeDetector).collect()
      val want = turns.groupBy(_.conv_id).toSeq.flatMap { case (_, ts) =>
        var prev: Option[String] = None
        ts.sortBy(_.turn_idx).flatMap { t =>
          val l = Handlers.classify(t).head
          if (prev.contains(l.status)) None
          else { prev = Some(l.status); Some(l) }
        }
      }
      assert(got.toSet == want.toSet && got.length == want.length,
        s"seed=$seed")
      got.groupBy(_.conv_id).foreach { case (_, rows) =>
        val idxs = rows.map(_.turn_idx).toSeq
        assert(idxs == idxs.sorted, s"per-key order violated, seed=$seed")
      }
    }
  }

  test("property: every turn lands in exactly width/slide sliding windows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    samples(5).foreach { case (turns, _) =>
      val n = graft.windows.Windows.sliding(spark.createDataset(turns),
        "10 minutes", "5 minutes")
        .agg(sum("n_turns")).collect()(0).getLong(0)
      assert(n == turns.size * 2L)
    }
  }

  test("property: exactly-once multiset invariance under sink redelivery") {
    import spark.implicits._
    samples(3).foreach { case (turns, _) =>
      val out = tmpDir("prop_sink")
      val sink = new graft.sink.ExactlyOnceParquetSink(out)
      val df = spark.createDataset(turns).toDF()
      sink.addBatch(df, 0)
      sink.addBatch(df, 0) // redelivery
      sink.addBatch(df.limit(0), 1)
      sink.addBatch(df, 1) // epoch 1 marker already set by empty write
      val got = sink.readCommitted(spark).count()
      assert(got == turns.size) // epoch 1 committed empty; redelivery dropped
    }
  }
}
