package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingOps

/** Pins int8 symmetric quantization (q49): range, saturation, zero-vector
  * safety, and the reconstruction-error bound that makes the 4× shrink
  * usable (|x − q·scale/127| ≤ scale/254 per element). */
class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def quantOf(vecs: (Long, Seq[Float])*) =
    EmbeddingOps.quantizeInt8(vecs.toSeq.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getString(3)))).toMap

  test("quantizeInt8: crafted vectors — scale, clamp, saturation, zeros") {
    val m = quantOf(
      1L -> Seq(1.0f, -1.0f, 0.5f, 0.0f),
      2L -> Seq(0.0f, 0.0f, 0.0f, 0.0f),
      3L -> Seq(-2.0f, 1.0f, 0.25f, -0.25f))

    val (s1, sat1, q1) = m(1L)
    assert(s1 == 1.0)
    // +1 -> floor(127.5) = 127; -1 -> floor(-126.5) = -127
    assert(q1 == "127,-127,64,0") // 0.5*127 = 63.5 -> floor(64.0) = 64
    assert(sat1 == 2L)

    val (s2, sat2, q2) = m(2L)
    assert(s2 == 1e-300 && sat2 == 0L && q2 == "0,0,0,0")

    val (s3, sat3, q3) = m(3L)
    assert(s3 == 2.0)
    // -2 -> -127; 1 -> 63.5+0.5 = 64; 0.25 -> 15.875+0.5 -> 16; -0.25 -> -16
    assert(q3 == "-127,64,16,-16")
    assert(sat3 == 1L)
  }

  test("quantizeInt8: round trip on real embeddings stays within the " +
    "per-element error bound") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = EmbeddingOps.quantizeInt8(emb)
      .join(emb, "vec_id")
      .select(col("vec_id"), col("scale"), col("q_csv"), col("embedding"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val q = r.getString(2).split(",").map(_.toInt)
      val x = r.getSeq[Float](3).map(_.toDouble)
      assert(q.length == x.length)
      assert(q.forall(v => v >= -127 && v <= 127))
      q.zip(x).foreach { case (qi, xi) =>
        assert(math.abs(xi - qi * scale / 127.0) <= scale / 254.0 + 1e-12,
          s"vec ${r.getLong(0)}: $xi vs $qi at scale $scale")
      }
    }
  }
}
