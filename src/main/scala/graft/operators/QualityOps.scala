package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-curation quality signals beyond the per-document scores in
  * `TextFunctions`: intra-document repetition statistics (the Gopher-style
  * "repetitious document" filters) and PII detection/redaction.
  *
  * Scale notes (100 TB): `repetitionStats` is two hash aggregations keyed
  * by (doc_id, gram) then doc_id — partial aggregation applies to both, and
  * the row-local fractions ride through the first aggregate as a struct so
  * the documents table is scanned exactly once. `piiRedact` is a pure
  * codegen'd projection (regexp over the scan, no shuffle at all).
  *
  * Cross-engine determinism: fractions are ratios of small integers rounded
  * at 1e-6 (Queries.scala conventions); the redaction regexes use only
  * syntax with identical semantics in Java regex and RE2 (character
  * classes, bounded/unbounded greedy repeats — both engines match
  * leftmost-greedy here), so the DuckDB oracle replays them verbatim.
  */
object QualityOps {

  /** Email/phone patterns — restricted to the Java-regex/RE2 common subset
    * (no backrefs, no lookaround) so oracles replay them unchanged. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Per-document repetition signals over whitespace tokens:
    *  - dup_token_frac: 1 − |distinct tokens| / |tokens| (row-local)
    *  - dup_2gram_frac: same over word 2-grams (row-local)
    *  - top_2gram_frac: occurrences of the most frequent 2-gram / total
    *    2-grams (grouped: needs the per-gram counts)
    * High values flag boilerplate/spam documents that length or stopword
    * filters miss (the classic "same sentence 400 times" page). */
  def repetitionStats(docs: DataFrame): DataFrame = {
    // The row-local metrics ride through both aggregates as primitive
    // first() columns (NOT a struct: a struct-typed first() has an
    // immutable aggregation buffer, which kicks the whole pipeline out of
    // HashAggregate into SortAggregate — PlanSpec pins the hash shape).
    val perGram = docs.select(
      col("doc_id"),
      TextFunctions.bound(TextFunctions.tokens(col("text"))) { tk =>
        struct(
          size(tk).cast("long").as("n_tokens"),
          round(lit(1.0) -
            size(array_distinct(tk)).cast("double") / size(tk).cast("double"), 6)
            .as("dup_token_frac"),
          TextFunctions.bound(TextFunctions.shinglesOf(tk, 2)) { g =>
            round(lit(1.0) -
              size(array_distinct(g)).cast("double") / size(g).cast("double"), 6)
          }.as("dup_2gram_frac"))
        // aliases inside a lambda are stripped (fields come out col1..colN);
        // the positional struct cast restores the names
      }.cast("struct<n_tokens:bigint,dup_token_frac:double,dup_2gram_frac:double>")
        .as("m"),
      explode(TextFunctions.shingles(col("text"), 2)).as("gram"))
      .select(col("doc_id"),
        col("m.n_tokens").as("n_tokens"),
        col("m.dup_token_frac").as("dup_token_frac"),
        col("m.dup_2gram_frac").as("dup_2gram_frac"),
        col("gram"))

    perGram
      .groupBy(col("doc_id"), col("gram"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        first(col("dup_token_frac")).as("dup_token_frac"),
        first(col("dup_2gram_frac")).as("dup_2gram_frac"),
        count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        first(col("dup_token_frac")).as("dup_token_frac"),
        first(col("dup_2gram_frac")).as("dup_2gram_frac"),
        max(col("c")).as("top_c"), sum(col("c")).as("n_grams"))
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        col("dup_2gram_frac"),
        round(col("top_c").cast("double") / col("n_grams").cast("double"), 6)
          .as("top_2gram_frac"))
  }

  /** Detect + redact emails/phone numbers in `text`: emits match counts and
    * the redacted text. Redaction order (emails, then phones) is part of
    * the contract; the patterns cannot overlap so the order only matters
    * for documentation. Zero-shuffle codegen projection. */
  def piiRedact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("clean"))
}
