package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{EventLog, Graph}

/** Unit coverage for the iterative/time-series operators added in r14:
  * integer PageRank and resample+LOCF. The gates prove oracle parity;
  * these prove the MATH on hand-built inputs. */
class GraphSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("pageRankInt: hand graph matches the recurrence computed by hand") {
    import spark.implicits._
    // a -> b, a -> c, b -> c, c -> a  (outdeg: a=2, b=1, c=1)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    val got1 = Graph.pageRankInt(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // r0 = 1e6 each; contribs: a->b 500000, a->c 500000, b->c 1000000,
    // c->a 1000000
    // r1(a) = 150000 + 850*1000000/1000 = 1000000
    // r1(b) = 150000 + 850*500000/1000  = 575000
    // r1(c) = 150000 + 850*1500000/1000 = 1425000
    assert(got1 === Map("a" -> 1000000L, "b" -> 575000L, "c" -> 1425000L))
    val got2 = Graph.pageRankInt(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // contribs from r1: a->b 500000, a->c 500000, b->c 575000, c->a 1425000
    assert(got2 === Map(
      "a" -> (150000L + 850L * 1425000L / 1000L),
      "b" -> (150000L + 850L * 500000L / 1000L),
      "c" -> (150000L + 850L * (500000L + 575000L) / 1000L)))
  }

  test("pageRankInt: sink-only node keeps the teleport term; mass bounded") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "z")).toDF("src", "dst")
    val got = Graph.pageRankInt(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // z never links out; its rank is teleport + damped share of a's rank
    assert(got("z") > 150000L)
    // truncating division only LOSES mass: total <= 3 * scale
    assert(got.values.sum <= 3000000L)
    assert(got.values.forall(_ >= 150000L), "teleport is a floor for every node")
  }

  test("resampleLocf: gaps filled, LOCF carries, ties broken by tieCol") {
    import spark.implicits._
    // key 1: events in buckets 10 and 13 (gap at 11, 12); bucket 10 has a
    // tie on ts -> event_id 7 (value 2.5) must win over event_id 3 (1.5)
    val log = Seq(
      (3L, 1L, 10L * 3600L, 1.5), (7L, 1L, 10L * 3600L, 2.5),
      (9L, 1L, 13L * 3600L + 5L, 4.0),
      (4L, 2L, 11L * 3600L, 9.0))
      .toDF("event_id", "user_id", "ts_us", "value")
    val out = EventLog.resampleLocf(log, "user_id", "ts_us", "event_id",
        "value", bucketUs = 3600L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.keySet === Set((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 11L)))
    assert(out((1L, 10L)) === ((2L, 2.5)), "tie broken by event_id")
    assert(out((1L, 11L)) === ((0L, 2.5)), "gap bucket carries LOCF")
    assert(out((1L, 12L)) === ((0L, 2.5)))
    assert(out((1L, 13L)) === ((1L, 4.0)))
    assert(out((2L, 11L)) === ((1L, 9.0)))
  }
}
