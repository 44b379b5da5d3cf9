package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Embedding-column storage transforms for the training pipeline.
  *
  * Symmetric int8 quantization is the standard 4× shrink applied before
  * shipping an embedding corpus to an ANN index or a training job: per
  * vector, scale = max |x_i|, q_i = round(x_i · 127 / scale) ∈ [−127, 127].
  *
  * Determinism notes (the reason for the exact arithmetic shape):
  *  - rounding is floor(y + 0.5) — "half toward +∞" — because floor is
  *    IEEE-exact and identical in Spark and DuckDB, while round() on
  *    doubles is HALF_UP in Spark but half-away-from-zero in DuckDB;
  *  - the max-abs element yields exactly floor(127.5) = 127 (and the
  *    negative extreme −127), so values stay in int8 range analytically;
  *    the least(·, 127) clamp is a defensive guard only — two IEEE
  *    roundings cannot inflate x·127/scale past 127.5;
  *  - scale is guarded with greatest(·, 1e-300) so an all-zero vector
  *    quantizes to zeros instead of NULL/NaN (0/1e-300 = 0 in both
  *    engines).
  * Everything is a row-local codegen'd projection — no shuffle; at 100 TB
  * this runs at scan speed and the output parquet is ~4× smaller.
  */
object EmbeddingOps {

  /** vec_id, scale (double), n_sat (elements at ±127), q_csv (the int8
    * vector, comma-joined — the driver gate cannot hash array columns, the
    * same finding as q38b/q38d; the array-typed form is pinned in
    * EmbeddingOpsSpec). */
  def quantizeInt8(emb: DataFrame): DataFrame =
    Spread(emb).select(col("vec_id"),
      TextFunctions.bound(VectorFunctions.toDouble(col("embedding"))) { v =>
        TextFunctions.bound(
          greatest(array_max(transform(v, x => abs(x))), lit(1e-300))) { s =>
          TextFunctions.bound(
            transform(v, x => least(floor(x * lit(127.0) / s + lit(0.5)), lit(127.0)))) { q =>
            struct(
              s.as("scale"),
              size(filter(q, x => abs(x) >= 127)).cast("long").as("n_sat"),
              array_join(transform(q, x => x.cast("long").cast("string")), ",")
                .as("q_csv"))
          }
        }
      }.as("m"))
      .select(col("vec_id"), col("m.scale").as("scale"),
        col("m.n_sat").as("n_sat"), col("m.q_csv").as("q_csv"))
}
