package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column library (similarity search / near-dup). Pure
  * codegen'd higher-order functions over `array<float>` columns — no UDF,
  * no driver-side math — so a 100 TB cross-bucket similarity scan stays in
  * whole-stage codegen. Float elements are cast to double BEFORE any
  * arithmetic so accumulation order and precision are well-defined and
  * reproducible across engines.
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Random-hyperplane LSH bucket: sign bits of `nBits` deterministic
    * pseudo-random projections. Two vectors share a bucket with probability
    * rising in their cosine — the scale path for ANN: group by bucket, then
    * brute-force only within buckets (candidate set shrinks ~2^nBits-fold).
    * The projection "matrix" is generated from splitmix64(seed, bit, dim) so
    * executors need no broadcast side-channel and any cluster size computes
    * identical buckets. */
  def lshBucket(v: Column, dim: Int, nBits: Int = 8, seed: Long = 42L): Column = {
    def proj(bit: Int): Column = {
      val terms = (0 until dim).map { d =>
        val h = graft.gen.TranscriptGen.hash(seed, bit.toLong, d.toLong)
        // uniform in [-1, 1)
        val w = graft.gen.TranscriptGen.double01(h) * 2.0 - 1.0
        element_at(v, d + 1).cast("double") * lit(w)
      }
      terms.reduce(_ + _)
    }
    (0 until nBits).map(b => when(proj(b) >= 0, 1L << b).otherwise(0L))
      .reduce(_ + _)
  }
}
