package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** Dev-only micro-profiler for the optimization round: times isolated
  * sub-stages of the heavy operators through the noop sink so per-stage
  * cost is attributable (guide §1.1/§1.4). Not part of the driver
  * contract.
  *
  *   sbt "runMain graft.ProfileOps [sfDir]"
  */
object ProfileOps {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val part = spark.read.parquet(s"$sfDir/part.parquet")

    // stage-level attribution (no UI in the sandbox): record every
    // completed stage's wall/executor-cpu time during the LAST pass
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Int, Long)]()
    val verboseStages = args.contains("-stages")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        if (verboseStages)
          System.err.println(f"[stageN] ${si.stageId}%5d wall=$wall%6dms " +
            f"run=${si.taskMetrics.executorRunTime}%6dms tasks=${si.numTasks}%3d " +
            si.name.take(80))
        stages.add((si.stageId, wall,
          si.taskMetrics.executorRunTime, si.numTasks,
          si.taskMetrics.executorCpuTime / 1000000L))
      }
    })

    def time(name: String)(df: => DataFrame): Unit = {
      def once: Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once
      val s1 = once
      stages.clear()
      val s2 = once
      val s = Seq(s1, s2)
      println(f"[prof] $name%-36s min=${s.min}%7.3f samples=" +
        s.map(x => f"$x%.3f").mkString(","))
      if (verboseStages) {
        Thread.sleep(200) // listener drain
        val rows = java.util.Arrays.asList(stages.toArray: _*)
        rows.forEach { case r: (Int, Long, Long, Int, Long) @unchecked =>
          println(f"[stage] ${r._1}%5d wall=${r._2}%6dms run=${r._3}%6dms " +
            f"cpu=${r._5}%6dms tasks=${r._4}%3d")
        }
      }
    }

    println("[prof] docs rows = " + docs.count())
    println("[prof] emb rows  = " + emb.count())
    println("[prof] total tokens = " +
      docs.select(sum(TF.tokenCount(col("text")))).collect()(0).getLong(0))

    // relational Spread A/B: does parallelizing the map side past a
    // 1-partition scan beat the extra round-robin exchange?
    def q01of(li: DataFrame) = li
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc"),
        count(lit(1)).as("n"))
    time("q01_plain")(q01of(lineitem))
    time("q01_spread")(q01of(graft.operators.Spread(lineitem)))
    def q03of(li: DataFrame) = li
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
    time("q03_plain")(q03of(lineitem))
    time("q03_spread")(q03of(graft.operators.Spread(lineitem)))
    def q04of(o: DataFrame) = o
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
    time("q04_plain")(q04of(orders))
    time("q04_spread")(q04of(graft.operators.Spread(orders)))

    // window-exchange pin A/B (q08/q09 shapes)
    locally {
      import org.apache.spark.sql.expressions.Window
      val w8 = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      def q08of(o: DataFrame) = o
        .withColumn("rk", row_number().over(w8)).filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      time("q08_plain")(q08of(orders))
      time("q08_pinned")(q08of(orders.repartition(32, col("o_custkey"))))
      val w9 = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def q09of(li: DataFrame) = li
        .withColumn("running_qty", sum("l_quantity").over(w9))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
      time("q09_plain")(q09of(lineitem))
      time("q09_pinned")(q09of(lineitem.repartition(32, col("l_suppkey"))))
    }

    time("docs_scan_text")(docs.select(col("doc_id"), col("text")))
    time("tokens_only")(docs.select(col("doc_id"), TF.tokens(col("text")).as("t")))
    time("shingles_only")(docs.select(col("doc_id"), TF.shingles(col("text"), 3).as("sh")))
    time("shingles_distinct")(docs.select(col("doc_id"),
      array_distinct(TF.shingles(col("text"), 3)).as("sh")))
    time("minhash_1seed")(docs.select(col("doc_id"),
      TF.minhash(col("text"), "s1").as("mh")))
    time("minhash_all8")(docs.select(col("doc_id"),
      TF.minhashAll(col("text"), graft.operators.DedupOps.MinhashSeeds).as("mhs")))
    time("minhash_signatures_exploded")(
      graft.operators.DedupOps.minhashSignatures(docs))
    time("q32_full_pairs")(graft.operators.DedupOps.minhashLshPairs(docs))
    time("simhash_tokenhash_only")(docs.select(col("doc_id"),
      TF.bound(TF.tokens(col("text")))(toks =>
        transform(toks, t => TF.tokenHash16(t))).as("hs")))
    time("q34_simhash_full")(graft.operators.DedupOps.simhash(docs))

    // skew-leg replica (Bench's dedup_spiked_sec methodology: count, not
    // noop — the frozen bench counts kept ids)
    {
      val nSpike = 5000L
      val docsST = docs.select("doc_id", "text")
      val spike = spark.range(nSpike).select(
        (col("id") + 10000000L).as("doc_id"),
        concat(lit("the quick brown fox jumps over the lazy dog tail "),
          col("id")).as("text"))
      val corpus = docsST.unionByName(spike)
      def onceSkew: Double = {
        val t0 = System.nanoTime()
        graft.operators.DedupOps.dedupCorpus(corpus, 0.7).count()
        (System.nanoTime() - t0) / 1e9
      }
      val s1 = onceSkew; val s2 = onceSkew
      println(f"[prof] skew_dedup_spiked min=${math.min(s1, s2)}%.3f " +
        f"samples=$s1%.3f,$s2%.3f")
    }

    // q45 decomposition
    {
      import graft.operators.{DedupOps, Spread}
      val canonIds = DedupOps.exact(docs).select(col("canonical_doc_id").as("doc_id"))
      val canonDocs = Spread(docs).join(canonIds, "doc_id")
      time("q45_exact_only")(DedupOps.exact(docs))
      time("q45_canon_docs")(canonDocs)
      time("q45_pairs_on_canon")(DedupOps.minhashLshPairs(canonDocs))
      time("q45_neardup_on_canon")(DedupOps.nearDupPairs(canonDocs, 0.7))
      time("q45_full")(DedupOps.dedupCorpus(docs, 0.7))
    }

    // q33 decomposition: isolate the Jaccard verify from pair generation
    val pairsLocal = graft.operators.DedupOps.minhashLshPairs(docs).collect()
    println("[prof] q32 pairs = " + pairsLocal.length)
    val pairsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(pairsLocal.toSeq, 4),
      new org.apache.spark.sql.types.StructType()
        .add("doc_a", "long").add("doc_b", "long"))
    time("q33_verify_only")(
      graft.operators.DedupOps.ngramJaccard(docs, pairsDf))
    time("q33_full")(graft.operators.DedupOps.ngramJaccard(docs,
      graft.operators.DedupOps.minhashLshPairs(docs)))
    if (args.contains("-finalplan")) {
      val df33 = graft.operators.DedupOps.ngramJaccard(docs,
        graft.operators.DedupOps.minhashLshPairs(docs))
      df33.write.format("noop").mode("overwrite").save()
      println("[finalplan q33]\n" + df33.queryExecution.executedPlan.toString)
    }

    // verify-join strategy A/B on the static pair set
    {
      import graft.functions.TextFunctions._
      def verifyWith(hint: String): DataFrame = {
        val sh0 = graft.operators.Spread(docs).select(col("doc_id"),
          array_distinct(shingles(col("text"), 3)).as("sh"))
          .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"))
        val sh = if (hint.isEmpty) sh0 else sh0.hint(hint)
        val jac = bound(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))(
          i => round(i / (col("na") + col("nb") - i), 6))
        pairsDf
          .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
            col("n_sh").as("na")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
            col("n_sh").as("nb")), "doc_b")
          .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
      }
      time("q33_verify_bcast")(verifyWith(""))
      time("q33_verify_shuffle_hash")(verifyWith("shuffle_hash"))
      time("q33_verify_merge")(verifyWith("merge"))
    }

    // q32 bucket-pair stage decomposition
    {
      import org.apache.spark.sql.expressions.Window
      val tagged = graft.operators.DedupOps.minhashSignatures(docs)
      val w = Window.partitionBy(col("seed"), col("mh")).orderBy(col("doc_id"))
      val limited = tagged.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 257).drop("__rn")
      time("q32_window_limited")(limited)
      val buckets = limited.groupBy(col("seed"), col("mh"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
      time("q32_buckets_agg")(buckets)
      val exploded = buckets.select(explode(
        graft.operators.DedupOps.sortedIdPairs(slice(col("ids"), 1, 256),
          "doc_a", "doc_b")).as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      time("q32_pairs_nodistinct")(exploded)
      time("q32_pairs_distinct")(exploded.distinct())
    }

    time("emb_scan")(emb.select(col("vec_id"), col("embedding")))
    time("lsh_bucket_1x8bit")(emb.select(col("vec_id"),
      VF.lshBucket(col("embedding"), 64, 8).as("b")))
    time("lsh_bucket_4x8bit")(emb.select(col("vec_id"),
      array((0 until 4).map(bd =>
        VF.lshBucket(col("embedding"), 64, 8, firstBit = bd * 8)): _*).as("bks")))
    time("cosine_candidates_q36b")(
      graft.operators.SimilarityOps.cosineCandidatesBucketed(emb))
    time("q36b_full")(
      graft.operators.SimilarityOps.cosineNearDupPairsBucketed(emb, 0.25))
    time("q36c_full")(graft.operators.SimilarityOps.nearDupAgainstCorpus(
      emb.filter(col("vec_id") < 50), emb, 0.25, dim = 64, bands = 4,
      bitsPerBand = 8))
    // A/B: the pre-flip join direction (corpus broadcast, incoming probe)
    locally {
      import graft.functions.VectorFunctions._
      import graft.operators.Spread
      def bucketArr = array((0 until 4).map(bd =>
        lshBucket(col("embedding"), 64, 8, firstBit = bd * 8)): _*)
      val in0 = Spread(emb.filter(col("vec_id") < 50))
        .select(col("vec_id").as("in_id"), col("embedding").as("e_i"),
          norm2(col("embedding")).as("n_i"), bucketArr.as("bks_i"))
        .select(col("in_id"), col("e_i"), col("n_i"), col("bks_i"),
          posexplode(col("bks_i")).as(Seq("band", "bucket")))
      val co0 = Spread(emb)
        .select(col("vec_id").as("corpus_id"), col("embedding").as("e_c"),
          norm2(col("embedding")).as("n_c"), bucketArr.as("bks_c"))
        .select(col("corpus_id"), col("e_c"), col("n_c"), col("bks_c"),
          posexplode(col("bks_c")).as(Seq("band_c", "bucket_c")))
      val firstBandOnly = !exists(
        sequence(lit(1), greatest(col("band"), lit(1))),
        j => element_at(col("bks_i"), j) === element_at(col("bks_c"), j))
      time("q36c_old_bcast_corpus")(in0.join(broadcast(co0),
          col("band") === col("band_c") && col("bucket") === col("bucket_c") &&
          col("in_id") =!= col("corpus_id"))
        .filter(when(col("band") === 0, lit(true)).otherwise(firstBandOnly))
        .select(col("in_id"), col("corpus_id"),
          round(dot(col("e_i"), col("e_c")) / (col("n_i") * col("n_c")), 6)
            .as("cos"))
        .filter(col("cos") >= 0.25))
    }
    time("q37b_full")(graft.operators.SimilarityOps.lshTopKBanded(
      emb, emb.filter(col("vec_id") < 10), dim = 64, k = 5, bands = 4,
      bitsPerBand = 4))
    time("q37b_candidates")(graft.operators.SimilarityOps.lshBandedCandidates(
      emb, emb.filter(col("vec_id") < 10), dim = 64, bands = 4,
      bitsPerBand = 4))
    spark.stop()
  }
}
