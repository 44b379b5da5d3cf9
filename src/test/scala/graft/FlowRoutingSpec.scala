package graft

import graft.flow.Flow
import graft.gen.TranscriptGen
import graft.model.Turn

/** Routing stages of the Flow DSL: the load-balancing router must spread
  * rows evenly regardless of key skew (reference LoadBalancingEdgeRouter,
  * edge_router.py:76-99), and the per-stage parallelism cap must bound the
  * partition count without reshuffling rows away. */
class FlowRoutingSpec extends SparkSpec {

  private def skewed = {
    import spark.implicits._
    // one hot conversation holding ~2/3 of all rows
    TranscriptGen.dataset(spark,
      TranscriptGen.Config(nConvs = 40, seed = 7, hotConvs = 1, hotLen = 1200))
  }

  test("rebalance spreads a skewed key evenly round-robin") {
    val ds = skewed
    val n = 8
    val out = Flow.rebalance[Turn](n).apply(ds)
    val sizes = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.length == n)
    val total = sizes.sum
    // keyRoute would put the hot key's ~2/3 share in one partition; round
    // robin must keep every partition within a few percent of the mean
    assert(sizes.max - sizes.min <= math.max(2, total / 20),
      s"unbalanced: ${sizes.mkString(",")}")
    assert(out.count() == ds.count())
  }

  test("keyRoute co-locates all turns of a key in one partition") {
    import org.apache.spark.sql.functions.col
    val ds = skewed
    val routed = Flow.keyRoute(col("conv_id")).apply(ds)
    val multi = routed.rdd
      .mapPartitionsWithIndex((p, it) => it.map(t => (t.conv_id, p)))
      .distinct().countByKey().count(_._2 > 1)
    assert(multi == 0, s"$multi conversations split across partitions")
  }

  test("maxWorkers caps parallelism without dropping rows") {
    val ds = skewed.repartition(16)
    val capped = Flow.maxWorkers[Turn](3).apply(ds)
    assert(capped.rdd.getNumPartitions == 3)
    assert(capped.count() == ds.count())
  }
}
