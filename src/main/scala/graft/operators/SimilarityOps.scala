package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`embeddings(vec_id,
  * embedding: array<float>, label)`).
  *
  *  - bruteForceTopK: exact cosine top-k of every query against the corpus.
  *    The query side is broadcast (it is small by construction); the corpus
  *    side streams through codegen'd cosine — no shuffle of the corpus at
  *    all, so it scales linearly with corpus size.
  *  - lshTopK: the scale path — random-hyperplane LSH buckets both sides,
  *    joins on bucket, and ranks within candidates only. Recall < 1 by
  *    design; the bench reports both so the tradeoff is measurable.
  */
object SimilarityOps {

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("q_emb"), col("c_emb")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "cand_id", "cos", "rk")
  }

  /** LSH-bucketed ANN: candidates share a hyperplane-sign bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int = 5,
              nBits: Int = 8): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      lshBucket(col("embedding"), dim, nBits).as("bucket"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
      lshBucket(col("embedding"), dim, nBits).as("c_bucket"))
    val scored = c.join(broadcast(q), col("bucket") === col("c_bucket") &&
        col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("q_emb"), col("c_emb")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "cand_id", "cos", "rk")
  }

  /** Embedding-cosine near-duplicate pairs, EXACT all-pairs form
    * (vec_a < vec_b, cos >= tau). O(n^2) — this is the verify-scale oracle
    * twin and recall reference; the production path at corpus scale is
    * `cosineNearDupPairsBucketed` below. */
  def cosineNearDupPairs(emb: DataFrame, tau: Double = 0.95): DataFrame = {
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("e_a"), col("e_b")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Embedding-cosine near-duplicate pairs, LSH-BUCKETED — the 100 TB
    * shape: each side projects its bucket (O(dim x nBits) codegen'd mults
    * per row), the join is a hash shuffle on the bucket key (never a
    * nested-loop over all pairs), and the exact cosine is verified on
    * in-bucket candidates only. Same two-phase candidates-then-verify
    * pattern as MinHash+Jaccard for text. Recall < 1 by design (pairs in
    * different buckets are missed); bucket assignment is md5-derived so a
    * SQL oracle replays it exactly. */
  def cosineNearDupPairsBucketed(emb: DataFrame, tau: Double = 0.95,
                                 dim: Int = 64, nBits: Int = 4): DataFrame = {
    val withB = emb.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), dim, nBits).as("bucket"))
    val a = withB.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"),
      col("bucket"))
    val b = withB.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"),
      col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("e_a"), col("e_b")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }
}
