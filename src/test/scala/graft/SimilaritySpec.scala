package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** LSH-bucketed similarity: the bucketed candidates-then-verify path must
  * be a strict subset of the exact all-pairs result (same cosine, same
  * threshold — LSH only ever MISSES pairs, never invents them), with
  * non-trivial recall, and its physical plan must be a hash join on the
  * bucket key — never a nested-loop over all pairs. */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("banded near-dup pairs are a subset of exact pairs, recall reported") {
    val exact = SimilarityOps.cosineNearDupPairs(emb, 0.25)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = SimilarityOps.cosineNearDupPairsBucketed(emb, 0.25,
      dim = 64, bands = 4, bitsPerBand = 8)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(exact),
      s"bucketed produced ${bucketed.diff(exact).size} pairs not in the exact result")
    val recall = bucketed.size.toDouble / exact.size
    info(f"recall at tau=0.25, 4 bands x 8 bits: $recall%.3f (${bucketed.size}/${exact.size})")
    // tau=0.25 is far below near-dup territory (p_bit ~0.58 at the
    // threshold -> band recall 1-(1-0.58^8)^4 ~ 0.05); the banded design
    // trades low-similarity recall for candidate-set size — the near-dup
    // test below pins the regime the operator is FOR
    assert(recall > 0.01)
  }

  test("recall is ~1 for true near-duplicates (high tau)") {
    // self-pairs via a perturbed copy: cos ~ 1 -> same signs in every band
    val shifted = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.0001f)).as("embedding"))
    val both = emb.select("vec_id", "embedding").union(shifted)
    val bucketed = SimilarityOps.cosineNearDupPairsBucketed(both, 0.999,
      dim = 64, bands = 4, bitsPerBand = 8)
      .filter(col("vec_b") === col("vec_a") + 1000000L)
    val n = emb.count()
    val hit = bucketed.count()
    info(s"near-identical pair recall: $hit/$n")
    assert(hit >= n * 0.95, s"expected ~all $n scaled twins in-bucket, got $hit")
  }

  test("banded plan has no nested loop and no bucket self-join") {
    val plan = SimilarityOps.cosineNearDupPairsBucketed(emb, 0.25, 64, 4, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("streaming near-dup gate vs static corpus: stateless, finds all twins") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val corpus = emb.select("vec_id", "embedding")
    // incoming: scaled twins of 20 corpus vectors (cos ~ 1, same band signs)
    val twins = corpus.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.0001f)).as("embedding"))
      .as[(Long, Seq[Float])].collect()
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val incoming = ms.toDS().toDF("vec_id", "embedding")
    val gated = SimilarityOps.nearDupAgainstCorpus(incoming, corpus, 0.999)
    val q = gated.writeStream.format("memory").queryName("gate")
      .outputMode("append").start()
    try {
      ms.addData(twins.take(10).toSeq: _*); q.processAllAvailable()
      ms.addData(twins.drop(10).toSeq: _*); q.processAllAvailable()
      val got = spark.table("gate")
        .select("in_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // every twin matches its original exactly once (first-band dedup)
      assert(got.toSet.intersect((0L until 20L).map(i => (i + 1000000L, i)).toSet).size == 20)
      assert(got.length == got.toSet.size, "multi-band duplicates must be suppressed")
      assert(q.lastProgress.stateOperators.isEmpty, "gate must be stateless")
    } finally q.stop()
  }

  test("lshTopK results rank within buckets deterministically") {
    val res = SimilarityOps.lshTopK(emb, emb.filter(col("vec_id") < 10),
      dim = 64, k = 5, nBits = 4).collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getInt(3) <= 5))
  }

  test("banded ANN: no cross-band duplicates, recall >= single table, broadcast-hash plan") {
    val queries = emb.filter(col("vec_id") < 10)
    val banded = SimilarityOps.lshTopKBanded(emb, queries,
      dim = 64, k = 5, bands = 4, bitsPerBand = 4)
    val rows = banded.collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.toSet.size,
      "a pair colliding in several bands must be ranked once")
    // recall against the exact top-k — banding ORs 4 independent tables,
    // so it can only widen the candidate union vs the single 4-bit table
    def topkSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topkSet(SimilarityOps.bruteForceTopK(emb, queries, 5))
    val single = topkSet(SimilarityOps.lshTopK(emb, queries, 64, 5, nBits = 4))
    val multi = topkSet(banded)
    def recall(s: Set[(Long, Long)]) = s.intersect(exact).size.toDouble / exact.size
    info(f"ANN recall vs exact top-5: single-table ${recall(single)}%.3f, banded ${recall(multi)}%.3f")
    assert(recall(multi) >= recall(single),
      "banded ANN must not lose recall vs its own single table")
    assert(recall(multi) >= 0.3, s"banded recall too low: ${recall(multi)}")
    val plan = banded.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("multi-probe ANN: candidates a bounded superset of banded, recall never lower") {
    val queries = emb.filter(col("vec_id") < 10)
    def candSet(multiProbe: Boolean) =
      SimilarityOps.lshBandedCandidates(emb, queries, dim = 64,
          multiProbe = multiProbe)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = candSet(multiProbe = false)
    val multi = candSet(multiProbe = true)
    assert(banded.subsetOf(multi),
      "every exact-bucket candidate must survive multi-probe")
    assert(multi.size <= 2 * banded.size + 1,
      s"weak-bit probing must stay within 2x candidates: ${banded.size} -> ${multi.size}")
    // and candidates are emitted exactly once (stateless cross-probe dedup)
    val rows = SimilarityOps.lshBandedCandidates(emb, queries, dim = 64,
        multiProbe = true)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size,
      "a pair matching several probes must be emitted once")
    def topkSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topkSet(SimilarityOps.bruteForceTopK(emb, queries, 5))
    def recall(s: Set[(Long, Long)]) = s.intersect(exact).size.toDouble / exact.size
    val rBanded = recall(topkSet(SimilarityOps.lshTopKBanded(emb, queries, 64, 5)))
    val rMulti = recall(topkSet(SimilarityOps.lshTopKBanded(emb, queries, 64, 5,
      multiProbe = true)))
    info(f"ANN recall vs exact top-5: banded $rBanded%.3f, multi-probe $rMulti%.3f " +
      f"(candidates ${banded.size} -> ${multi.size})")
    assert(rMulti >= rBanded,
      "a candidate superset cannot lose top-k recall")
  }

  test("IVF ANN: probing ALL lists degenerates to exact search; fewer probes trade recall") {
    val queries = emb.filter(col("vec_id") < 10)
    def topkSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topkSet(SimilarityOps.bruteForceTopK(emb, queries, 5))
    // nProbe = nCentroids scores every (query, candidate) pair once ->
    // the result must EQUAL brute force, pair for pair
    val full = topkSet(SimilarityOps.ivfTopK(emb, queries,
      k = 5, nCentroids = 16, nProbe = 16))
    assert(full == exact,
      s"all-list IVF must equal exact top-k (diff ${full.diff(exact).size}/${exact.diff(full).size})")
    // the gated configuration: 4 of 16 lists
    val pruned = SimilarityOps.ivfTopK(emb, queries,
      k = 5, nCentroids = 16, nProbe = 4)
    val rows = pruned.collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.toSet.size,
      "a candidate owns one inverted list — duplicates are impossible")
    assert(rows.forall(_.getInt(3) <= 5))
    val recall = topkSet(pruned).intersect(exact).size.toDouble / exact.size
    info(f"IVF recall vs exact top-5 at 4/16 probes: $recall%.3f")
    assert(recall >= 0.3, s"IVF recall too low: $recall")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("IVF ANN finds a planted near-identical twin at rank 1") {
    val queries = emb.filter(col("vec_id") < 10)
    val twins = queries.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.0001f)).as("embedding"))
    val spiked = emb.select("vec_id", "embedding").union(twins)
    // a scaled twin has (to fp rounding) the query's own cosine profile, so
    // it lands in the same inverted list the query probes first
    val hits = SimilarityOps.ivfTopK(spiked, queries,
        k = 5, nCentroids = 16, nProbe = 4)
      .filter(col("cand_id") === col("query_id") + 1000000L && col("rk") === 1)
      .count()
    assert(hits == 10, s"every query's twin must rank first, got $hits/10")
  }

  test("banded ANN finds a planted near-identical twin at rank 1") {
    val queries = emb.filter(col("vec_id") < 10)
    val twins = queries.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.0001f)).as("embedding"))
    val spiked = emb.select("vec_id", "embedding").union(twins)
    val hits = SimilarityOps.lshTopKBanded(spiked, queries,
        dim = 64, k = 5, bands = 4, bitsPerBand = 4)
      .filter(col("cand_id") === col("query_id") + 1000000L && col("rk") === 1)
      .count()
    assert(hits == 10, s"every query's twin must rank first, got $hits/10")
  }
}
