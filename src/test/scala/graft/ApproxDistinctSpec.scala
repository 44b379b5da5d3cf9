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
}
