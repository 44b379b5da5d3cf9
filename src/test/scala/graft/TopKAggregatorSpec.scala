package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.functions.{Scored, TopKAggregator}

/** Typed top-k Aggregator: bounded buffer, deterministic total order,
  * merge-associativity across partials. */
class TopKAggregatorSpec extends SparkSpec {

  test("reduce/merge keep the k best under (score desc, id asc)") {
    val a = new TopKAggregator(3)
    val items = Seq(Scored(1.0, 5), Scored(9.0, 2), Scored(9.0, 1),
      Scored(3.0, 7), Scored(9.0, 9), Scored(0.5, 4))
    val whole = items.foldLeft(a.zero)(a.reduce)
    assert(whole.items == Seq(Scored(9.0, 1), Scored(9.0, 2), Scored(9.0, 9)))
    // any split into partials merges to the same answer
    for (cut <- 0 to items.size) {
      val (l, r) = items.splitAt(cut)
      val merged = a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
      assert(merged == whole, s"cut=$cut")
    }
  }

  test("udaf form equals a window-rank top-k on a DataFrame") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", 5.0, 2L), ("a", 3.0, 3L), ("a", 5.0, 4L),
      ("b", 2.0, 5L)).toDF("g", "value", "id").repartition(4)
    val topk = udaf(new TopKAggregator(2), Encoders.product[Scored])
    val got = df.groupBy("g").agg(topk(col("value"), col("id")).as("tk"))
      .select(col("g"), explode(col("tk.items")).as("kv"))
      .select(col("g"), col("kv.score"), col("kv.id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == Set(("a", 5.0, 2L), ("a", 5.0, 4L), ("b", 2.0, 5L)))
  }
}
