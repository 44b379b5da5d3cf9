package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. No media codecs ship in this
  * sandbox, so the DECODE step is a clearly-marked deterministic fake —
  * but the Spark-side contract (schema, batching via mapPartitions,
  * partition-local decoder init, no driver involvement) is real and
  * tested. Swapping `FakeDecoder` for a JNI/ffmpeg decoder changes one
  * function.
  */
object MultimodalOps {

  case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
                       height: Long, n_frames: Long, format: String)

  /** STUB decode — deterministic fake: derives plausible metadata purely
    * from payload bytes so tests and oracles are exact. A real decoder
    * replaces the body (and ONLY the body) of `decodeOne`. */
  object FakeDecoder extends Serializable {
    def decodeOne(docId: Long, payload: Array[Byte]): MediaMeta = {
      val len = payload.length.toLong
      MediaMeta(docId, len, len % 64, len % 48, len % 16 + 1,
        if (len % 2 == 0) "png" else "jpeg")
    }
  }

  /** Binarize a text column into the opaque payload column (stand-in for
    * real media bytes; keeps the pipeline runnable on the sandbox corpus).
    * NOT Spread: the sandbox decoder is length-arithmetic, so the scan IS
    * the cost and a repartition is pure overhead (measured). With a real
    * codec the decode dominates — Spread(docs) here would then be the
    * guide-§2.5 fix, same as the text/vector operators. */
  def binarize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Batched decode over partitions — the real plumbing: one decoder init
    * per partition (the expensive part with real codecs), streaming
    * iteration, typed output. This is the Scala analogue of a
    * mapInPandas batch UDF. */
  def decodeMeta(docsWithPayload: DataFrame): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    docsWithPayload.select("doc_id", "payload").mapPartitions { it =>
      // real impl: val codec = Codec.open(...) once per partition
      it.map(r => FakeDecoder.decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
  }

  /** Deterministic frame sampling: pick every `stride`-th frame index. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int = 4): DataFrame = {
    meta.toDF().select(col("doc_id"), col("n_frames"),
      sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)).as("frame_idxs"))
      .withColumn("n_sampled", size(col("frame_idxs")))
  }

  /** Aspect-preserving resize of the decoded metadata: longest side becomes
    * `maxDim`, the other scales by integer arithmetic (floor) — exact, so
    * oracle-checkable. Payload resize itself belongs to the codec stub. */
  def resizeMeta(meta: Dataset[MediaMeta], maxDim: Long = 32L): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    def scaled(c: String) =
      when(longest <= 0, lit(0L))
        .otherwise(floor(col(c) * maxDim / longest).cast("long"))
    meta.toDF().select(col("doc_id"), col("width"), col("height"),
      scaled("width").as("out_w"), scaled("height").as("out_h"))
  }

  final case class Feature(doc_id: Long, feature: Seq[Float])

  /** STUB feature extraction (the mapInPandas-analogue batch UDF): a
    * deterministic md5-derived "embedding" of the payload bytes. The
    * plumbing is the real contract — one model init per PARTITION (here
    * the MessageDigest instance; with a real encoder, the ONNX/JNI
    * session — the expensive step), streaming row iteration, typed
    * columnar output — so swapping in real inference changes only the
    * body of the row mapper.
    *
    * The payload is hashed ONCE (one linear pass regardless of dim);
    * feature j = h16(md5(hex(md5(payload)) ++ ":j")) / 65536 - 1/2, a
    * dyadic rational in [-0.5, 0.5) exactly representable in float32 —
    * the same engine-replayable-randomness derivation as
    * TextFunctions.tokenHash16 (CLAUDE.md invariant 10), so the q38d
    * oracle regenerates every value bit-exactly in ANSI SQL
    * (DuckDB's md5() is the same lowercase-hex digest). */
  def extractFeatures(docsWithPayload: DataFrame, dim: Int = 8): Dataset[Feature] = {
    implicit val enc = Encoders.product[Feature]
    // NULL payloads carry no features (same contract as simhash over NULL
    // text): filter here — not in the caller — so the operator can never
    // NPE on md.digest(null), and the q38d oracle mirrors the filter
    docsWithPayload.select("doc_id", "payload")
      .filter(org.apache.spark.sql.functions.col("payload").isNotNull)
      .mapPartitions { it =>
      // per-partition "model init" (real impl: OnnxSession.open(...))
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val hex = md.digest(r.getAs[Array[Byte]](1))
          .map(b => f"$b%02x").mkString
        Feature(r.getLong(0), (0 until dim).map { j =>
          md.reset()
          val h = md.digest(s"$hex:$j".getBytes("UTF-8"))
          val h16 = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
          h16 / 65536.0f - 0.5f
        })
      }
    }
  }
}
