package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared tokenization / shingling primitives.
  *
  * Everything here is built from `org.apache.spark.sql.functions` higher-order
  * array functions — codegen-friendly, no UDFs, so document pipelines stay
  * inside whole-stage codegen at 100 TB (the per-record `map` lambdas of the
  * reference, channel/package.scala:62, would be black-box closures here).
  */
object TextOps {

  /** Whitespace tokens (testdata text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word-level n-gram shingles, space-joined.
    * Empty array when the document has fewer than n tokens.
    * One codegen'd pass ([[graft.expressions.WordShingles]]) — the
    * composed split/transform/slice/concat_ws/array_distinct form ran an
    * interpreted lambda per shingle and was the dominant cost of every
    * shingle-based dedup query; values are bit-identical. */
  def shingles(text: Column, n: Int): Column =
    graft.expressions.ShingleFunctions.word_shingles(text, n)

  /** The pre-expression composed form — kept as the differential-testing
    * oracle for [[shingles]] (TextOpsShinglesSpec asserts equality). */
  def shinglesComposed(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two shingle-set columns. Integer set sizes
    * divide in double — bit-identical across engines given identical sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")
}
