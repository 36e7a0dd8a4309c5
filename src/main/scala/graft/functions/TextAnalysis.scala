package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, fingerprinting. Beyond-reference extensions, all pure
  * `functions._` expressions (codegen'd, SQL-oracle-able where the math is
  * exact-integer or single-IEEE-op).
  */
object TextAnalysis {

  /** Stopword regex per language — the classic cheap n-gram/function-word
    * heuristic. Kept RE2/Java-compatible (plain alternation + \b). */
  val langStopwords: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|to|in|is|it|that|for)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|zu|mit|den)\\b",
    "fr" -> "\\b(le|la|les|et|est|un|une|de|que|pour)\\b",
    "es" -> "\\b(el|la|los|las|es|un|una|que|de|por)\\b")

  /** Per-language stopword hit count. */
  def langHits(text: Column, lang: String): Column = {
    val pattern = langStopwords.toMap.apply(lang)
    size(regexp_extract_all(text, lit(pattern), lit(0)))
  }

  /** Predicted language: argmax of stopword hits, first-listed wins ties,
    * "und" (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val hits = langStopwords.map { case (l, _) => l -> langHits(text, l) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und"): Column) { case ((l, h), acc) =>
      when(h > 0 && h === best, lit(l)).otherwise(acc)
    }
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(TextOps.tokens(text))

  /** BPE-ish subword count: letter runs, digits, and punctuation as separate
    * tokens (a regex approximation of GPT-2-style pre-tokenization). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** ~4 chars/token heuristic used for budget estimates. */
  def approxTokenCount(text: Column): Column = ceil(length(text) / 4.0).cast("long")

  /** Quality signals: char length, word count, mean word length, stopword
    * ratio, alpha ratio — integer counts divided in double (deterministic),
    * combined into a [0,1]-ish score. */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nWords = wsTokenCount(text)
    val nStop = langHits(text, "en")
    val nAlpha = size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0)))
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "mean_word_len" -> (nChars - (nWords - lit(1))).cast("double") / nWords.cast("double"),
      "stopword_ratio" -> nStop.cast("double") / nWords.cast("double"),
      "alpha_ratio" -> nAlpha.cast("double") / nChars.cast("double"))
  }

  /** Composite quality score: weighted sum of clamped signals. */
  def qualityScore(text: Column): Column = {
    val sig = qualitySignals(text).toMap
    val lenScore = least(sig("n_words").cast("double") / lit(100.0), lit(1.0))
    val stopScore = least(sig("stopword_ratio") * lit(5.0), lit(1.0))
    val alphaScore = sig("alpha_ratio")
    lenScore * lit(0.4) + stopScore * lit(0.3) + alphaScore * lit(0.3)
  }

  /** Winnowing-style rolling fingerprints: hash token shingles, take the
    * minimum in each sliding window, dedupe. Near-identical documents share
    * most fingerprints (spec-verified; xxhash64 is not DuckDB-expressible
    * so the driver check is rows-only). */
  def fingerprints(text: Column, shingleLen: Int = 5, window: Int = 4): Column = {
    val hashes = transform(TextOps.shingles(text, shingleLen), s => xxhash64(s))
    when(size(hashes) >= window,
      array_distinct(
        transform(sequence(lit(0), size(hashes) - window),
          i => array_min(slice(hashes, i + lit(1), lit(window))))))
      .otherwise(when(size(hashes) > 0, array(array_min(hashes)))
        .otherwise(array().cast("array<bigint>")))
  }
}
