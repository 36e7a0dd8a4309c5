package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.expressions.CdcUtil
import graft.functions.Corpus

/** Content-defined chunking: the codegen expression against an
  * independent in-test reference, the invariants the definition promises,
  * and the edit-stability property that motivates CDC over fixed windows. */
class CdcChunkSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val W = 16; private val MOD = 32
  private val MINL = 24; private val MAXL = 96

  /** Independent reference: same definition, written over a materialized
    * codepoint array with a naive window re-sum (no ring buffer). */
  private def refBounds(s: String): Seq[(Int, Int)] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var prev = 0
    for (i <- 1 to n) {
      val windowFull = i >= W
      val hsum =
        if (windowFull) (i - W until i).map(j => CdcUtil.gear(cps(j))).sum
        else 0L
      val cut = (i - prev >= MINL && windowFull && hsum % MOD == 0) ||
        (i - prev == MAXL)
      if (cut) { out += ((prev, i)); prev = i }
    }
    if (prev < n) out += ((prev, n))
    out.toSeq
  }

  private def exprBounds(s: String): Seq[(Int, Int)] = {
    val a = CdcUtil.bounds(org.apache.spark.unsafe.types.UTF8String.fromString(s),
      W, MOD, MINL, MAXL)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2)
      (r.getInt(0), r.getInt(1))
    }
  }

  test("expression matches the independent reference on varied inputs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh .,\n"
    val samples = Seq("", "x", "short text", "a" * 200) ++
      (0 until 50).map(_ => Seq.fill(20 + rnd.nextInt(400))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    samples.foreach { s => assert(exprBounds(s) === refBounds(s), s.take(40)) }
  }

  test("codepoint-based: astral-plane symbols count as one position") {
    val s = "😀" * 30 + "abc" * 30 // 30 emoji + 90 ascii = 120 cps
    val bs = exprBounds(s)
    assert(bs === refBounds(s))
    assert(bs.last._2 === 120, "end offsets must be codepoints, not Java chars")
  }

  test("invariants: chunks tile the text; lengths clamped to [min, max]") {
    val rnd = new scala.util.Random(7)
    val s = Seq.fill(3000)(('a' + rnd.nextInt(26)).toChar).mkString
    val bs = exprBounds(s)
    assert(bs.head._1 === 0 && bs.last._2 === s.length)
    bs.sliding(2).foreach { case Seq(a, b) => assert(a._2 === b._1); case _ => }
    bs.foreach { case (st, en) => assert(en - st <= MAXL) }
    bs.dropRight(1).foreach { case (st, en) => assert(en - st >= MINL) }
  }

  test("edit stability: one inserted char preserves most chunk hashes") {
    val rnd = new scala.util.Random(13)
    val s = Seq.fill(4000)(('a' + rnd.nextInt(26)).toChar).mkString
    val edited = s.substring(0, 2000) + "!" + s.substring(2000)
    def hashes(x: String) =
      exprBounds(x).map { case (st, en) => x.substring(
        x.offsetByCodePoints(0, st), x.offsetByCodePoints(0, en)) }
        .map(_.hashCode).toSet
    val a = hashes(s); val b = hashes(edited)
    val shared = (a intersect b).size.toDouble / a.size
    assert(shared > 0.8,
      s"CDC must localize a one-char edit; only ${(shared * 100).toInt}% shared")
  }

  test("operator: null/empty texts dropped, hashes match substring md5") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog " * 4),
      (2L, ""), (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Corpus.cdcChunks(docs, "doc_id", "text").collect()
    assert(out.nonEmpty && out.forall(_.getLong(0) == 1L))
    val text = "the quick brown fox jumps over the lazy dog " * 4
    out.foreach { r =>
      val st = r.getLong(2).toInt; val en = r.getLong(3).toInt
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(text.substring(st, en).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(5) === md)
      assert(r.getLong(4) === en - st)
    }
  }
}
