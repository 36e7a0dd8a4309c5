package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TopK
import graft.functions.TopK.Scored

class TopKSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table}

  test("typed top-k Aggregator equals the window-function top-k") {
    import spark.implicits._
    val events = table("events")
    val byAgg = events
      .select(col("user_id"), col("value").as("score"), col("event_id").as("id"))
      .as[(Long, Double, Long)]
      .map { case (u, s, i) => (u, Scored(s, i)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopK.topK(3).toColumn.name("top"))
      .flatMap { case (u, top) => top.map(e => (u, e.id, e.score)) }
      .toDF("user_id", "id", "score")

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val byWindow = events
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("user_id"), col("event_id").as("id"), col("value").as("score"))

    assert(byAgg.count() === byWindow.count())
    assert(byAgg.exceptAll(byWindow).count() === 0)
    assert(byWindow.exceptAll(byAgg).count() === 0)
  }

  test("buffer stays bounded: k larger than group size returns the whole group") {
    import spark.implicits._
    val tiny = Seq(Scored(1.0, 1), Scored(2.0, 2)).toDS()
      .groupByKey(_ => 0L).agg(TopK.topK(10).toColumn.name("top"))
      .head()._2
    assert(tiny.map(_.id) === Seq(2L, 1L)) // desc by score
  }

  test("non-positive k is rejected at construction, not per-row") {
    // regression: k <= 0 used to surface as NoSuchElementException from
    // b.last inside reduce on the first input row
    intercept[IllegalArgumentException](TopK.topK(0))
    intercept[IllegalArgumentException](TopK.topK(-3))
  }

  test("Misra-Gries: every true heavy hitter survives, under any partitioning") {
    import spark.implicits._
    import graft.functions.HeavyHitters
    // adversarial stream: 3 heavy items (>n/(k+1) with k=4 -> >n/5) buried
    // in a long distinct-item tail, shuffled deterministically
    val heavy = Seq.fill(400)("hh1") ++ Seq.fill(350)("hh2") ++ Seq.fill(300)("hh3")
    val tail = (0 until 450).map(i => s"t$i")
    val stream = new scala.util.Random(7).shuffle(heavy ++ tail)
    val n = stream.size // 1500; threshold n/5 = 300
    val mg = udaf(HeavyHitters.misraGries(4))
    for (parts <- Seq(1, 7, 32)) {
      val sketch = stream.toDF("term").repartition(parts)
        .agg(mg(col("term")).as("s")).as[Seq[String]].head()
      assert(sketch.size <= 4, s"buffer bound broken: $sketch")
      assert(Set("hh1", "hh2").subsetOf(sketch.toSet),
        s"guaranteed heavy hitters missing at parts=$parts: $sketch")
      // hh3 sits exactly at the n/5 boundary (not strictly above), so no
      // guarantee claim — but the documented bound says anything
      // > n/(k+1) MUST be there; assert the 400/350 ones always are
    }
    // plain-Scala fold == the same guarantee on a single partition,
    // and merging two half-streams keeps it (mergeable-summaries law)
    val agg = HeavyHitters.misraGries(4)
    val (a, b) = stream.splitAt(n / 2)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    assert(Set("hh1", "hh2").subsetOf(agg.finish(merged).toSet))
    intercept[IllegalArgumentException](HeavyHitters.misraGries(0))
  }

  test("Count-Min: estimate >= exact always, exact when collision-free, merge law") {
    import spark.implicits._
    import graft.functions.CountMin
    val depth = 4; val width = 256
    // Zipf-ish stream with a long tail, shuffled deterministically
    val stream = new scala.util.Random(11).shuffle(
      (0 until 40).flatMap(i => Seq.fill(200 / (i + 1))(s"w$i")) ++
        (0 until 300).map(i => s"tail$i"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cms = udaf(CountMin.countMin(depth, width))
    // one-sided guarantee holds under ANY partitioning (merge = cell sums)
    for (parts <- Seq(1, 7, 32)) {
      val sk = stream.toDF("term").repartition(parts)
        .agg(cms(col("term")).as("s")).as[Seq[Long]].head()
      assert(sk.length === depth * width)
      assert(sk.sum === depth.toLong * stream.size) // each arrival hits every row once
      exact.foreach { case (item, cnt) =>
        val e = CountMin.estimate(sk, item, depth, width)
        assert(e >= cnt, s"under-count for $item: est=$e exact=$cnt")
      }
    }
    // plain-Scala merge law: sketch(a ++ b) == merge(sketch(a), sketch(b))
    val agg2 = CountMin.countMin(depth, width)
    val (a, b) = stream.splitAt(stream.size / 2)
    def build(xs: Seq[String]) = xs.foldLeft(agg2.zero)(agg2.reduce)
    val merged = agg2.merge(build(a), build(b))
    assert(agg2.finish(merged) === agg2.finish(build(stream)))
    // 2 items in a 4x256 sketch: exact unless they collide in ALL 4 hash
    // rows (the fixed family doesn't — deterministic, so assert equality)
    val tiny = Seq.fill(5)("x") ++ Seq.fill(3)("y")
    val tsk = agg2.finish(build(tiny))
    assert(CountMin.estimate(tsk, "x", depth, width) === 5L)
    assert(CountMin.estimate(tsk, "y", depth, width) === 3L)
    intercept[IllegalArgumentException](CountMin.countMin(0, 16))
    intercept[IllegalArgumentException](
      CountMin.estimate(Seq(0L), "x", depth, width))
    // the codegen'd column probe and the JVM probe are the same function:
    // both sides hash with Spark's Murmur3 under the same per-row seeds
    val sk1 = stream.toDF("term").agg(cms(col("term")).as("s")).as[Seq[Long]].head()
    val colProbe = stream.distinct.toDF("term")
      .withColumn("e", CountMin.estimateColumn(
        typedLit(sk1), col("term"), depth, width))
      .as[(String, Long)].collect().toMap
    exact.keys.foreach { item =>
      assert(colProbe(item) === CountMin.estimate(sk1, item, depth, width),
        s"column/JVM probe divergence for $item")
    }
  }
}
