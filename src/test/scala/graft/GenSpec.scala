package graft

import graft.gen.TranscriptGen

class GenSpec extends SparkSpec {
  private val cfg = TranscriptGen.Config(nConvs = 50L, seed = 42L)

  test("generator is deterministic and pure per conversation") {
    val a = TranscriptGen.turnsFor(7L, cfg)
    val b = TranscriptGen.turnsFor(7L, cfg)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("distributed generation is identical at different parallelism") {
    import spark.implicits._
    val p1 = TranscriptGen.dataset(spark, cfg).repartition(1).collect().toSet
    val p8 = TranscriptGen.dataset(spark, cfg).repartition(8).collect().toSet
    assert(p1 == p8)
  }

  test("per-conversation invariants: ts strictly increasing in turn_idx, roles valid") {
    val roles = Set("user", "assistant", "tool", "system")
    (0L until cfg.nConvs).foreach { c =>
      val ts = TranscriptGen.turnsFor(c, cfg)
      assert(ts.map(_.turn_idx) == ts.indices.toSeq)
      assert(ts.sliding(2).forall {
        case Seq(x, y) => x.ts.getTime < y.ts.getTime; case _ => true
      })
      assert(ts.forall(t => roles.contains(t.role)))
      assert(ts.forall(t => (t.role == "tool") == t.tool.nonEmpty))
    }
  }

  test("every generated turn parses identically under the oracle regex and parseTemp") {
    // The t40/t41/t41b/t48/t51 oracles compute temp via
    // regexp_extract(text, 'temp=(-?[0-9][0-9.]*)') + CAST, while the
    // engine side uses Handlers.parseTemp (NaN on a missing/malformed
    // payload, where SQL would yield NULL). Their equivalence rests on the
    // generator grammar ALWAYS emitting a well-formed trailing payload —
    // this test makes a grammar change fail loudly instead of silently
    // diverging at the hash gate (round-2 ADVICE).
    val re = "temp=(-?[0-9][0-9.]*)".r
    val cfgs = Seq(
      TranscriptQueries.VerifyCfg,
      TranscriptGen.Config(nConvs = 200L, seed = 42L, meanLen = 100,
        maxLen = 400, hotConvs = 3, hotLen = 1000))
    cfgs.foreach { c =>
      (0L until c.nConvs).foreach { i =>
        TranscriptGen.turnsFor(i, c).foreach { t =>
          val m = re.findFirstMatchIn(t.text)
          assert(m.isDefined, s"turn without temp= payload: ${t.text}")
          val viaRegex = m.get.group(1).toDouble
          val viaParser = graft.state.Handlers.parseTemp(t.text)
          assert(viaParser == viaRegex,
            s"parseTemp=$viaParser regex=$viaRegex for: ${t.text}")
        }
      }
    }
  }

  test("hot conversation skew knob works") {
    val hot = TranscriptGen.Config(nConvs = 10L, hotConvs = 1, hotLen = 500)
    assert(TranscriptGen.turnsFor(0L, hot).size == 500)
    assert(TranscriptGen.turnsFor(1L, hot).size < 300)
  }
}
