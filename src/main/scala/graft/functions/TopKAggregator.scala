package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for a bounded top-k. */
final case class Scored(score: Double, id: Long)

/** Flat product wrapper so the aggregation buffer travels through
  * Encoders.product (Tungsten row), not a generic blob encoder. */
final case class TopKBuf(items: Seq[Scored])

/** Bounded top-k as a typed `Aggregator[IN, BUF, OUT]` — the engine's UDAF
  * surface (SURVEY.md §2.2, UDF/UDAF/UDTF row).
  *
  * Semantics: the k best (score DESC, id ASC — a total order, so results
  * are deterministic) rows per group. The buffer is a sorted Seq capped at
  * k, so partial aggregation is map-side: each task ships at most k rows
  * per group key into the shuffle regardless of input size — the property
  * that makes a global or per-key top-k viable over 10^12 rows (a
  * sort+limit would shuffle everything). reduce/merge are O(k) per call.
  */
final class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
  require(k > 0)

  // Double.compare gives a TOTAL order (NaN above all values — matching
  // the SQL sort semantics of both Spark and the DuckDB oracle); a plain
  // `>` would let a NaN score bypass the ordering and make results
  // merge-order-dependent. -0.0 is collapsed to 0.0 first: SQL treats
  // them as equal (falling through to the id tie-break) but Double.compare
  // orders -0.0 < 0.0.
  private def norm(d: Double): Double = if (d == 0.0) 0.0 else d
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(norm(a.score), norm(b.score))
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def insert(buf: Seq[Scored], v: Scored): Seq[Scored] =
    if (buf.size >= k && better(buf.last, v)) buf
    else {
      val (before, after) = buf.span(better(_, v))
      val merged = (before :+ v) ++ after
      if (merged.size > k) merged.take(k) else merged
    }

  override def zero: TopKBuf = TopKBuf(Seq.empty)
  override def reduce(b: TopKBuf, a: Scored): TopKBuf = TopKBuf(insert(b.items, a))
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf(b2.items.foldLeft(b1.items)(insert))
  override def finish(r: TopKBuf): TopKBuf = r
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
