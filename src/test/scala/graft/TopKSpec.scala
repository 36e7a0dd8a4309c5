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
}
