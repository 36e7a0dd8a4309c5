package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.mem.{MemStore, MemWireServer}

/** Connector fuzz differential: the 32 seeded fuzz predicates
  * ([[graft.gates.CoreGates.fuzzCases]]) evaluated through the DSv2 mem
  * connector — where they exercise the Catalyst-filter → store-side
  * three-valued eval translation (Or/Not/In/comparison nesting, the
  * pushdown grammar) — against the same predicates on the plain
  * DataFrame. q_fuzz_parity proves Spark == DuckDB on these shapes; this
  * proves connector == Spark, so the pushdown path is covered by the
  * same machine-made combination sweep. Runs the wire client too: the
  * filter tree must round-trip the wire query codec unchanged. */
class MemFuzzSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private val fmt = "graft.sources.mem.GraftMemSource"

  private lazy val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_discount"), col("l_returnflag"), col("l_linestatus"))

  private lazy val seeded: Unit =
    MemStore.register("fuzz_lineitem", li)

  private lazy val server = MemWireServer.start()

  private def check(loadDf: => org.apache.spark.sql.DataFrame): Unit = {
    seeded
    graft.gates.CoreGates.fuzzCases.foreach { c =>
      val expect = li.where(c.pred).count()
      val got = loadDf.where(c.pred).count()
      assert(got === expect, s"case ${c.id} [${c.sql}]: connector $got vs $expect")
    }
  }

  test("all 32 fuzz predicates agree: embedded connector vs plain DataFrame") {
    check(spark.read.format(fmt).option("collection", "fuzz_lineitem").load())
  }

  test("all 32 fuzz predicates agree over the WIRE client (codec round-trip)") {
    check(spark.read.format(fmt).option("collection", "fuzz_lineitem")
      .option("client", "wire").option("port", server.port.toString).load())
  }
}
