package graft

/** Plan hygiene: the declarative operators must actually get the Catalyst
  * treatment the 100 TB story depends on — filters and projections pushed
  * into the parquet scan, broadcast joins where hinted, whole-stage
  * codegen spans in the hot paths. This pins the PLAN, not just results. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString()

  /** The row-local operators may carry ONE round-robin repartition — the
    * guarded input-parallelism fix (operators.Spread) for a small/
    * unsplittable scan — but never a KEYED exchange (hash/range), which
    * would mean a data-dependent shuffle regression. */
  private def assertNoKeyedExchange(plan: String, what: String): Unit = {
    val keyed = plan.linesIterator.filter(_.contains("Exchange"))
      .filterNot(_.contains("RoundRobinPartitioning")).toSeq
    assert(keyed.isEmpty,
      s"$what must not shuffle by key, found: ${keyed.mkString("; ")}\n${plan.take(2000)}")
  }

  test("filter + projection are pushed down to the parquet scan (q02)") {
    val plan = planOf("q02_filter_project")
    assert(plan.contains("PushedFilters:") &&
      (plan.contains("GreaterThanOrEqual(l_quantity,45.0)") ||
       plan.contains("GreaterThanOrEqual(l_quantity")),
      s"pushdown missing in:\n$plan")
    // column pruning: scan must not read all 11 lineitem columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate") || readSchema.count(_ == ',') < 8,
      s"scan reads too many columns: $readSchema")
  }

  test("broadcast hint produces a BroadcastHashJoin (q03)") {
    assert(planOf("q03_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("semi/anti joins plan as join strategies, not subquery re-scans") {
    assert(planOf("q05_semi_join").contains("LeftSemi"))
    assert(planOf("q06_anti_join").contains("LeftAnti"))
  }

  test("aggregations get map-side partial aggregation (q01)") {
    val plan = planOf("q01_agg_pricing")
    assert(plan.contains("HashAggregate"))
    // partial + final pair => two HashAggregate nodes around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }

  // '*(N)' prefixes in executedPlan.toString mark whole-stage-codegen stages
  test("whole-stage codegen covers the scan->filter->project hot path (q02)") {
    val plan = planOf("q02_filter_project")
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"),
      s"no codegen span in:\n$plan")
  }

  test("custom parse_temp expression participates in codegen (q40)") {
    val plan = planOf("q40_custom_expression")
    assert(plan.contains("*(1) Project"), s"no codegen span in:\n$plan")
    assert(plan.contains("parse_temp"), s"expression missing in:\n$plan")
  }

  // Regression pins for round-2 perf fixes — the shapes below each cost
  // 10x+ when they regress (see BASELINE.md round-2 notes).

  test("minhash LSH pairs scan the corpus exactly ONCE (no signature self-join)") {
    val plan = planOf("q32_minhash_lsh")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 corpus scan, found $scans in:\n${plan.take(3000)}")
  }

  test("q41 global-scalar plan has no Window and no whole-table single-partition funnel") {
    val plan = planOf("q41_scalar_subquery")
    assert(!plan.contains("Window"), s"empty-key Window regressed:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastExchange"), s"scalar must broadcast:\n${plan.take(2000)}")
  }

  test("simhash is row-local: no keyed shuffle, no explode (q34)") {
    val plan = planOf("q34_simhash")
    assertNoKeyedExchange(plan, "simhash (explode+groupBy regression)")
    assert("Scan parquet".r.findAllIn(plan).size == 1)
  }

  test("pivot with explicit values scans the table once (no distinct pre-query)") {
    val plan = planOf("q43_pivot")
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan.take(2000))
  }

  test("PII redaction is a keyed-shuffle-free codegen projection (q47)") {
    val plan = planOf("q47_pii_redact")
    assertNoKeyedExchange(plan, "q47")
    assert("Scan parquet".r.findAllIn(plan).size == 1)
  }

  test("int8 quantization is row-local: no keyed shuffle, one scan (q49)") {
    val plan = planOf("q49_embed_quantize")
    assertNoKeyedExchange(plan, "q49")
    assert("Scan parquet".r.findAllIn(plan).size == 1)
  }

  test("repetition stats scan the corpus once and partial-aggregate (q46)") {
    val plan = planOf("q46_repetition_stats")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"row-local fractions must ride the gram aggregate, not re-scan:\n${plan.take(2000)}")
    assert("HashAggregate".r.findAllIn(plan).size >= 4, // partial+final × 2 keys
      s"expected partial aggregation on both groupBys:\n${plan.take(2000)}")
  }
}
