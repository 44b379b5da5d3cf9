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

  test("sourceStats: keep/drop verdicts from short-doc share and min-docs") {
    val docs = Seq(
      (1L, "a b c", "good.com", 200L), (2L, "d e", "good.com", 300L),
      (3L, "f", "good.com", 150L),
      (4L, "x y", "shorty.net", 50L), (5L, "z", "shorty.net", 40L),
      (6L, "q r", "shorty.net", 60L), (7L, "s", "shorty.net", 500L),
      (8L, "lone text", "tiny.org", 400L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val m = QualityOps.sourceStats(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("good.com").getString(4) == "keep")   // 3 docs, 0% short
    assert(m("shorty.net").getString(4) == "drop") // 3/4 short
    assert(m("shorty.net").getDouble(3) == 0.75)
    assert(m("tiny.org").getString(4) == "drop")   // below min_docs
    assert(m("good.com").getDouble(2) == 2.0)      // (3+2+1)/3 tokens
  }

  test("decontaminate: shared-3-gram counts against a broadcast eval set") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps"),  // shares 2 eval 3-grams
      (11L, "totally different words here"),
      (12L, "quick brown fox elsewhere")   // shares 1
    ).toDF("doc_id", "text")
    val eval = Seq((1L, "the quick brown fox runs")).toDF("doc_id", "text")
    // eval 3-grams: {the quick brown, quick brown fox, brown fox runs}
    val m = QualityOps.decontaminate(corpus, eval)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(10L -> 2L, 12L -> 1L)) // doc 11 clean -> absent
  }

  test("packSequences: running offsets and integer window bins") {
    val docs = Seq(
      (1L, "a b c", "en"), (2L, "d e f g", "en"), (3L, "h i", "en"),
      (4L, "x y z", "de")
    ).toDF("doc_id", "text", "lang")
    val m = QualityOps.packSequences(docs, 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // en: starts 0, 3, 7 -> bins 0, 0, 1 at window=5; de restarts at 0
    assert(m == Map(1L -> ((0L, 0L)), 2L -> ((3L, 0L)),
      3L -> ((7L, 1L)), 4L -> ((0L, 0L))))
  }

  test("chunkTokens: overlapping windows with a short tail; tiny docs " +
    "yield one chunk") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "x")).toDF("doc_id", "text")
    val rows = QualityOps.chunkTokens(docs, window = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1 (7 tokens): starts 1,3,5 -> chunks of 4,4,3 tokens
    assert(rows == Map((1L, 0L) -> 4L, (1L, 1L) -> 4L, (1L, 2L) -> 3L,
      (2L, 0L) -> 1L))
    val fps = QualityOps.chunkTokens(docs, 4, 2).select("chunk_fp")
      .collect().map(_.getString(0))
    assert(fps.distinct.length == 4) // every chunk distinct here
  }

  // The round-4 advice precedent (q38d NPE on NULL payload): every new
  // curation op must either pass NULLs through or drop the row — never
  // throw. The driver tables carry no NULLs, so this is the pin.
  test("curation ops are NULL-safe: no crash, deterministic presence") {
    val docs = Seq((1L, "some text", "en", "s1", 9L),
        (2L, null: String, "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    // shingle-path ops emit a degenerate row for NULL text (size(NULL) is
    // NULL and greatest() ignores NULLs, so the tail-shingle clamp yields
    // one empty gram) — metrics come out NULL, never an exception
    val rep = QualityOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rep(1L) == false && rep.getOrElse(2L, true) == true)
    val ch = QualityOps.chunkTokens(docs).collect()
    assert(ch.count(_.getLong(0) == 1L) == 1)
    // direct-explode ops drop the NULL row entirely
    assert(QualityOps.tfidfTopK(docs).collect().forall(_.getLong(0) == 1L))
    // projection-based op keeps the row with NULL outputs
    val pii = QualityOps.piiRedact(docs).collect()
      .map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(pii == Map(1L -> false, 2L -> true))
    // aggregation-based ops must not throw on NULL inputs
    QualityOps.sourceStats(docs).collect()
    QualityOps.packSequences(docs).collect()

    val emb = Seq((1L, Seq(0.5f, -1.0f)), (2L, null: Seq[Float]))
      .toDF("vec_id", "embedding")
    val q = graft.operators.EmbeddingOps.quantizeInt8(emb).collect()
      .map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(q == Map(1L -> false, 2L -> true))
  }

  test("dupPassages: an exact shared span surfaces once with its doc reach") {
    val docs = Seq(
      (1L, "p q r s t u"),        // chunks(4,2): "p q r s", "r s t u"
      (2L, "x y p q r s"),        // chunks:      "x y p q", "p q r s"
      (3L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val rows = QualityOps.dupPassages(docs, window = 4, stride = 2).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(1) == 2L) // n_occurrences
    assert(rows(0).getLong(2) == 2L) // n_docs
    assert(rows(0).getLong(3) == 1L) // first_doc
  }

  test("curationVerdict: first-failing-reason covers every branch") {
    val docs = Seq(
      (1L, "a", "s1", 200L),                                  // short
      (2L, "b b b b b", "s1", 200L),                          // repetitive
      (3L, "hola mundo grande", "s1", 200L),                  // no marker -> lang
      (4L, "the of and cat dog", "s1", 200L),                 // score 0.02 -> lowq
      (5L, "the cat sat on mat ran far too fast now", "s1", 200L), // keep
      (6L, "the cat runs the dog walks the bird flies now", "s2", 200L) // source (s2 < minDocs)
    ).toDF("doc_id", "text", "source", "n_chars")
    val v = QualityOps
      .curationVerdict(docs, minTokens = 2, maxDup2 = 0.4, minScore = 0.05)
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(v == Map(1L -> "short", 2L -> "repetitive", 3L -> "lang",
      4L -> "lowq", 5L -> "keep", 6L -> "source"))
  }

  test("chunkTokens coverage property: every token position lands in a " +
    "chunk, starts advance by exactly stride, tail never exceeds window") {
    val rnd = new scala.util.Random(42)
    val docs = (1L to 40L).map { id =>
      val n = 1 + rnd.nextInt(200)
      id -> (1 to n).map(i => s"t$i").mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    for ((window, stride) <- Seq((64, 48), (16, 8), (7, 3), (5, 5))) {
      val chunks = QualityOps.chunkTokens(df, window, stride)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val n = text.split(" ").length
        val cs = chunks(id).sortBy(_._2)
        // chunk i covers positions 1+stride*i .. min(1+stride*i+window-1, n)
        cs.foreach { case (_, idx, ct) =>
          val start = 1 + stride * idx
          assert(ct == math.min(start + window - 1, n) - start + 1,
            s"doc $id w=$window s=$stride idx=$idx")
        }
        // the last chunk reaches the end of the document
        val (_, lastIdx, lastCt) = cs.last
        assert(1 + stride * lastIdx + lastCt - 1 == n.max(1))
        // and the one before it (if any) did NOT (no redundant tail chunk)
        if (cs.length > 1) assert(stride * (cs.length - 2) + window < n)
      }
    }
  }

  test("tfidfTopK: rare terms outrank common ones, token tie-break") {
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common cherry cherry")
    ).toDF("doc_id", "text")
    // df: apple 1, banana 2, cherry 2, common 3; N = 3
    val top = QualityOps.tfidfTopK(docs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(5)) -> r.getString(1)).toMap
    // doc 1: apple tf2*3/1 = 6 > banana 1*3/2 = 1.5 > common 1
    assert(top((1L, 1L)) == "apple" && top((1L, 2L)) == "banana")
    // doc 2: banana and cherry tie at 1.5 -> token tie-break
    assert(top((2L, 1L)) == "banana" && top((2L, 2L)) == "cherry")
    // doc 3: cherry tf2*3/2 = 3 > common 1
    assert(top((3L, 1L)) == "cherry" && top((3L, 2L)) == "common")
  }
}
