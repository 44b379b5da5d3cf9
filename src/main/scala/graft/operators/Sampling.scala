package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic dataset splitting / sampling for training pipelines.
  *
  * rand(seed) is partition-order-dependent (a repartition or cluster-size
  * change reassigns rows) — useless for a stable train/held-out split of a
  * growing corpus. An md5 bucket of the row KEY is a pure function of the
  * data: the same document lands in the same split on any cluster, any
  * day, any engine (the arithmetic is ANSI-SQL-replayable, same trick as
  * TextFunctions.tokenHash16), and sampling composes with incremental
  * ingest for free.
  */
object Sampling {

  /** Bucket in [0, buckets) from the 16-bit md5 hash of the key. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    TextFunctions.tokenHash16(key.cast("string")) % buckets

  /** Held-out fraction: pct buckets of 100 (~pct% of rows, exact per key). */
  def heldOut(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key) < pct)

  def train(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key) >= pct)

  /** Exact stratified sample: from every stratum keep exactly
    * ceil(n · num/den) rows, chosen by md5 rank of the key (so membership
    * is a pure function of the data — same rows on any cluster, any day).
    * The rank tie-breaks on the key itself (total order, Queries.scala
    * convention). The fraction is a rational num/den and the threshold is
    * computed in integer arithmetic — ceil(n · 0.2) in floating point is
    * engine-divergent (35 · 0.2 = 7.000…001 as a double but exactly 7.0 in
    * DuckDB's decimal literal math), while (n·num + den − 1) div den is
    * bit-exact everywhere.
    *
    * One shuffle on the stratum key; per-stratum work is a sort — at 100 TB
    * prefer strata much smaller than an executor's spill budget, or fall
    * back to the approximate `heldOut` split which needs no window. The
    * output keeps `rn` (1-based md5 rank within the stratum) so downstream
    * sub-sampling can slice the same order without re-ranking. */
  def stratifiedExact(df: DataFrame, strata: Column, key: Column,
      num: Int, den: Int): DataFrame = {
    val h = TextFunctions.tokenHash16(key.cast("string"))
    val w = Window.partitionBy(strata).orderBy(h, key)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(strata)))
      .filter(col("rn") <=
        ((col("__n") * num + (den - 1)) / den).cast("long"))
      .drop("__n")
  }
}
