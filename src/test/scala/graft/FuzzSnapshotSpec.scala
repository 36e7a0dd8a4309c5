package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gates.CoreGates

/** Pins the fuzz generators' emitted SQL by content hash (seven families:
  * predicate, join, window, dates, strings, numeric, decimal).
  *
  * The fuzz gates' one-generator-two-forms design has a blind spot: the
  * Spark gate and the DuckDB oracle share the generator, so an accidental
  * edit that changes the GENERATED SEMANTICS (a reseed, a changed literal
  * range, a dropped case) still passes both engines in lockstep — the
  * differential check can't see it. This spec closes that: the exact SQL
  * text each generator emits is pinned by md5. A deliberate generator
  * change re-pins here in the same commit; an accidental one fails CI. */
class FuzzSnapshotSpec extends AnyFunSuite {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def pin(name: String, sqls: Seq[String], expect: String): Unit = {
    val h = md5(sqls.mkString("\n"))
    assert(h === expect,
      s"$name generator output changed (md5 $h) — if deliberate, re-pin")
  }

  test("fuzz generators emit exactly the pinned case lists") {
    pin("predicate", CoreGates.fuzzCases.map(_.sql), "1794ac83461bf6d2b3ee085ea9ee9649")
    pin("join", CoreGates.joinFuzzCases.map(c => c.oSql + "|" + c.lSql), "9a813c37f5bdfaba98b7e19ae4e0989c")
    pin("window", CoreGates.winFuzzCases.map(_.valueSql), "d446b36b1c873b58dd693d628ea20ec7")
    pin("dates", CoreGates.dateFuzzCases.map(_.valueSql), "6e9f797521e43e0223f35b8b061a1de6")
    pin("strings", CoreGates.strFuzzCases.map(_.valueSql), "f8c8b3be8b921fbfd8f99e0e9cee77e7")
    pin("numeric", CoreGates.numFuzzCases.map(_.valueSql), "fed7eeb9e47712b4fccca0a153dd4a0a")
    pin("decimal", CoreGates.decFuzzCases.map(_.valueSql), "011e32368f2f6fe5a4efdafa28bcb7f7")
  }
}
