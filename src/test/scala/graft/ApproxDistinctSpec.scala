package graft

/** q19b (approx_count_distinct, rsd = 0.01) cannot be hash-gated against a
  * DuckDB oracle — HLL sketches are engine-specific — so this spec is its
  * verification: the per-group estimate must sit within 3x the requested
  * relative standard deviation of the EXACT distinct count (q19's gated
  * answer), i.e. a >=99.7%-confidence error bound. */
class ApproxDistinctSpec extends SparkSpec {

  test("q19b estimate within 3*rsd of q19's exact distinct count per event_type") {
    val d = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q19_agg_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q19b_agg_approx_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet, "group sets must agree")
    assert(exact.nonEmpty)
    val rsd = 0.01
    exact.foreach { case (group, e) =>
      val a = approx(group)
      assert(math.abs(a - e) <= math.max(3 * rsd * e, 1.0),
        s"$group: approx $a vs exact $e exceeds 3*rsd")
    }
  }

  // q50's exact percentile buffers every value of a group; at 100 TB the
  // operator of record is percentile_approx (bounded-memory sketch). Pin
  // the sketch against q50's gated exact twin: with accuracy=10000 the
  // rank error is <= n/10000, which for l_quantity (integers 1..50,
  // ~uniform) bounds the VALUE error well inside +-1.
  test("percentile_approx tracks q50's exact percentiles within the " +
    "accuracy-implied value bound") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q50_percentiles")(spark, d)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_quantity"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(10000)).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.keySet == exact.keySet && exact.nonEmpty)
    exact.foreach { case (group, es) =>
      es.zip(approx(group)).foreach { case (e, a) =>
        assert(math.abs(a - e) <= 1.0,
          s"$group: approx percentile $a vs exact $e drifts past the bound")
      }
    }
  }
}
