package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
