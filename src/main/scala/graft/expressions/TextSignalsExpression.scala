package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-signal extraction: ONE byte-level traversal of the document
  * computes every count the cleaning pipeline needs — code-point length,
  * whitespace-token count, ASCII-letter count, and per-language stopword
  * hits — where the composed form ran `split` plus five separate
  * `regexp_extract_all` passes per row (the dominant cost of
  * `pipe_clean_corpus`, round-2 verdict "What's wrong #4").
  *
  * Bit-compatible with the regex-composed definitions (differentially
  * spec-checked in TextSignalsSpec):
  *  - `n_chars`  = `length(text)` — code points, counted as non-continuation
  *    UTF-8 bytes;
  *  - `n_words`  = `size(split(text, " "))` = (number of 0x20 bytes) + 1,
  *    including the empty trailing/leading/double-space tokens Spark's
  *    limit=-1 split keeps;
  *  - `n_alpha`  = `size(regexp_extract_all(text, '[A-Za-z]'))`;
  *  - `hits_XX`  = `size(regexp_extract_all(text, '\b(w1|w2|…)\bb'))`:
  *    Java's ASCII `\b`/`\w` make a match exactly a MAXIMAL `[A-Za-z0-9_]+`
  *    run equal to a stopword (non-ASCII bytes are not word chars, so they
  *    break runs just like the regex engine does), so the scan compares
  *    each run — packed into a long, stopwords are ≤ 7 bytes — against a
  *    sorted table derived from the same word lists that build the regexes.
  */
case class TextSignals(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextSignalsUtil.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_signals needs string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    TextSignalsUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // single shared implementation: whole-stage codegen emits a static call
    // into the same primitive loop the interpreted path runs (JIT-compiled
    // either way; what matters is ONE traversal, no regex machinery)
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.TextSignalsUtil.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): TextSignals =
    copy(child = newChild)
}

/** The traversal itself + the packed stopword table. Static so generated
  * code can call it without a reference object. */
object TextSignalsUtil {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("hits_en", IntegerType, nullable = false),
    StructField("hits_de", IntegerType, nullable = false),
    StructField("hits_fr", IntegerType, nullable = false),
    StructField("hits_es", IntegerType, nullable = false)))

  /** Language word lists — the SINGLE source of truth: the regex patterns
    * in [[graft.functions.TextAnalysis.langStopwords]] are built from
    * these same lists, so the table and the oracle regexes cannot drift. */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "de", "por"))

  private val maxWordLen: Int = langWords.flatMap(_._2).map(_.length).max // 5 ≤ 7

  /** Pack an ASCII word of ≤ 7 bytes into a long (little-endian, high byte
    * zero ⇒ collision-free against longer runs, which are never packed). */
  private def pack(w: String): Long = {
    require(w.length <= 7 && w.forall(_ < 128), s"unpackable stopword: $w")
    w.getBytes("US-ASCII").zipWithIndex
      .map { case (b, i) => (b.toLong & 0xffL) << (8 * i) }.sum
  }

  // sorted packed words + parallel per-language bit masks ("la" is both fr
  // and es, "de"/"que"/"un" overlap too — one entry, merged mask)
  private val (packedWords: Array[Long], wordMasks: Array[Int]) = {
    val masks = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
    for (((_, words), li) <- langWords.zipWithIndex; w <- words)
      masks(pack(w)) = masks.getOrElse(pack(w), 0) | (1 << li)
    val sorted = masks.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  /** One pass over the UTF-8 bytes. See [[TextSignals]] for the exact
    * regex-equivalence argument per field. */
  def compute(s: UTF8String): InternalRow = {
    val nBytes = s.numBytes()
    var nChars = 0
    var nSpaces = 0
    var nAlpha = 0
    var hitsEn = 0; var hitsDe = 0; var hitsFr = 0; var hitsEs = 0
    // current [A-Za-z0-9_]+ run: length, packed bytes, candidate flag
    // (stopwords are all-lowercase and ≤ maxWordLen — anything else can
    // only terminate the run's candidacy, never match)
    var runLen = 0
    var runPacked = 0L
    var runLower = true

    var i = 0
    while (i <= nBytes) {
      val b: Int = if (i < nBytes) s.getByte(i) & 0xff else 0x20 // virtual terminator
      if ((b & 0xc0) != 0x80 && i < nBytes) nChars += 1
      val lower = b >= 'a' && b <= 'z'
      val isWord = lower || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9') || b == '_'
      if (isWord) {
        if (lower || (b >= 'A' && b <= 'Z')) nAlpha += 1
        if (runLen < maxWordLen) runPacked |= (b.toLong & 0xffL) << (8 * runLen)
        runLower &&= lower
        runLen += 1
      } else {
        if (runLen > 0 && runLen <= maxWordLen && runLower) {
          val idx = java.util.Arrays.binarySearch(packedWords, runPacked)
          if (idx >= 0) {
            val m = wordMasks(idx)
            hitsEn += m & 1
            hitsDe += (m >> 1) & 1
            hitsFr += (m >> 2) & 1
            hitsEs += (m >> 3) & 1
          }
        }
        runLen = 0; runPacked = 0L; runLower = true
        if (b == 0x20 && i < nBytes) nSpaces += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nChars, nSpaces + 1, nAlpha, hitsEn, hitsDe, hitsFr, hitsEs))
  }
}

object TextSignalsFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** struct(n_chars, n_words, n_alpha, hits_en, hits_de, hits_fr, hits_es)
    * in one traversal. */
  def text_signals(text: Column): Column = column(TextSignals(expression(text)))
}
