package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the zero-shuffle repeated-join strategy at
  * 100 TB: write both sides bucketBy on the join key once, and every
  * subsequent equi-join on that key plans as a sort-merge join with NO
  * Exchange on either side — the network shuffle (the cost that matters)
  * is paid once at write time. A per-partition Sort remains: since Spark
  * 3.0 the bucketed scan no longer advertises sortBy ordering (it is only
  * sound with exactly one file per bucket, so it moved behind
  * spark.sql.legacy.bucketedTableScan.outputOrdering); the sort is local,
  * spillable, and shuffle-free. Pinned at the plan level. */
class BucketedJoinSpec extends SparkSpec {

  test("equi-join of two bucketed tables plans as SMJ with no Exchange " +
    "on either side") {
    val dir = tmpDir("graft_bucketed")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick SMJ (the strategy the
      // bucketing exists to serve)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // one writer task => one file per bucket (tidy layout; the scan's
      // hash-partitioning guarantee is what elides the Exchange)
      docs.select("doc_id", "text").repartition(1).write
        .bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", s"$dir/t_text").saveAsTable("b_text")
      docs.select("doc_id", "lang", "n_chars").repartition(1).write
        .bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", s"$dir/t_meta").saveAsTable("b_meta")

      val joined = spark.table("b_text").join(spark.table("b_meta"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(2000)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      assert(joined.count() == docs.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_text")
      spark.sql("DROP TABLE IF EXISTS b_meta")
    }
  }
}
