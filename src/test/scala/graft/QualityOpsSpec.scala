package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityOps, Sampling}

/** Pins the corpus-curation extras: repetition statistics (q46), PII
  * detect/redact (q47), and the exact stratified sampler (q48). */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: crafted documents hit the exact fractions") {
    val docs = Seq(
      (1L, "a a a a"),   // 4 tokens, 1 distinct; 2-grams: [a a, a a, a a]
      (2L, "w x y z"),   // all distinct; 3 distinct 2-grams
      (3L, "q"),         // single token -> one tail shingle "q"
      (4L, "b c b c b")  // 5 tokens, 2 distinct; grams: bc cb bc cb
    ).toDF("doc_id", "text")

    val m = QualityOps.repetitionStats(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 4L)
    assert(m(1L).getDouble(2) == 0.75)       // 1 - 1/4
    assert(m(1L).getDouble(3) == 0.666667)   // 1 - 1/3
    assert(m(1L).getDouble(4) == 1.0)        // "a a" is every gram

    assert(m(2L).getDouble(2) == 0.0)
    assert(m(2L).getDouble(3) == 0.0)
    assert(m(2L).getDouble(4) == 0.333333)   // 1 of 3

    assert(m(3L).getLong(1) == 1L)
    assert(m(3L).getDouble(3) == 0.0)
    assert(m(3L).getDouble(4) == 1.0)

    assert(m(4L).getDouble(2) == 0.6)        // 1 - 2/5
    assert(m(4L).getDouble(3) == 0.5)        // 4 grams, 2 distinct
    assert(m(4L).getDouble(4) == 0.5)        // "b c" twice of 4
  }

  test("piiRedact: counts and redacts emails + phones, leaves clean text") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org thanks"),
      (2L, "call 555-867-5309 or 555-000-1111 now"),
      (3L, "both a@b.io and 123-456-7890"),
      (4L, "nothing to see here")
    ).toDF("doc_id", "text")

    val m = QualityOps.piiRedact(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 1L && m(1L).getLong(2) == 0L)
    assert(m(1L).getString(3) == "mail me at <EMAIL> thanks")
    assert(m(2L).getLong(2) == 2L)
    assert(m(2L).getString(3) == "call <PHONE> or <PHONE> now")
    assert(m(3L).getLong(1) == 1L && m(3L).getLong(2) == 1L)
    assert(m(3L).getString(3) == "both <EMAIL> and <PHONE>")
    assert(m(4L).getLong(1) == 0L && m(4L).getLong(2) == 0L)
    assert(m(4L).getString(3) == "nothing to see here")
  }

  test("stratifiedExact: per-stratum counts are exactly ceil(n/5) and " +
    "membership survives repartitioning") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")

    val sampled = Sampling.stratifiedExact(docs, col("lang"), col("doc_id"), 1, 5)
    val got = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> ((r.getLong(1) + 4) / 5)).toMap
    assert(got == want)

    // pure function of the data: same rows regardless of partitioning
    val a = sampled.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling
      .stratifiedExact(docs.repartition(13), col("lang"), col("doc_id"), 1, 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }
}
