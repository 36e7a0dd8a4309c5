package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.EventRow
import graft.streaming.Stateful

class StatefulSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table, sfDir}

  test("flatMapGroupsWithState: streaming running totals match the batch aggregate") {
    import spark.implicits._
    val events = table("events")
    val src = spark.readStream.schema(events.schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .withColumn("ts", graft.sources.Tables.tsFromNanos(col("ts")))
      .as[EventRow]
    val totals = Stateful.runningTotals[EventRow](src, _.user_id, _.value)
    val q = totals.toDF().writeStream.format("memory").queryName("state_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // final state per key (last emitted row) == batch groupBy
    val got = spark.table("state_test")
      .groupBy("key").agg(max("events").as("events"))
    val expected = events.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("events"))
    assert(got.join(expected, Seq("key"))
      .where(got("events") =!= expected("events")).count() === 0)
    assert(got.count() === expected.count())
  }
}
