package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.dsl._
import graft.dsl.Dsl._
import graft.operators.Joins

class FacadeSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table, sfDir}

  lazy val nation = table("nation")
  lazy val region = table("region")

  test("P10 fk binds a key like the reference's parameterized inner query") {
    val li = table("lineitem")
    assert(li.where(fk("l_orderkey", 7L).column).count() ===
      li.where(col("l_orderkey") === 7L).count())
  }

  test("P15 |> pipe is Dataset.transform") {
    val out = nation |> (_.where(col("n_regionkey") === 0)) |> (_.select("n_name"))
    assert(out.columns.toSeq === Seq("n_name"))
    assert(out.count() === nation.where(col("n_regionkey") === 0).count())
  }

  test("J3 zip produces (left, right) struct pairs, min-length") {
    val z = Joins.zip(nation, Seq(col("n_nationkey").asc), region, Seq(col("r_regionkey").asc))
    assert(z.columns.toSeq === Seq("left", "right"))
    assert(z.count() === math.min(nation.count(), region.count()))
    val first = z.orderBy(col("left.n_nationkey")).head()
    assert(first.getStruct(0).getAs[Int]("n_nationkey") === 0)
    assert(first.getStruct(1).getAs[Int]("r_regionkey") === 0)
  }

  test("J4 zip against a size-restricting side == zip + limit") {
    val z = Joins.zip(nation, Seq(col("n_nationkey").asc),
      region, Seq(col("r_regionkey").asc)).limit(3)
    assert(z.count() === 3)
  }

  test("J5 tee applies an arbitrary binary combinator") {
    val u = Joins.tee(region.select("r_regionkey"), nation.select(col("n_regionkey").as("r_regionkey")))(
      (l, r) => l.intersect(r))
    assert(u.count() === region.count()) // every region key appears among nations
  }

  test("T4 error channel: bad input fails fast at analysis (reference fail-fast-into-stream-error)") {
    val events = table("events")
    // missing path -> AnalysisException at source construction (fail-fast,
    // the Spark analogue of the reference's failed-Task error channel)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.readStream.schema(events.schema)
        .parquet("/root/testdata/does_not_exist_dir")
    }
    assert(ex.getMessage.contains("does_not_exist_dir"))
    // mid-stream corruption -> StreamingQueryException at execution
    val tmp = java.nio.file.Files.createTempDirectory("t4").toFile
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tmp.getPath, "bad.parquet"), "not parquet at all")
    val src = spark.readStream.schema(events.schema).parquet(tmp.getPath)
    val ex2 = intercept[StreamingQueryException] {
      val q = src.writeStream.format("memory").queryName("t4_err")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(ex2.getMessage != null)
  }

  test("T2 maxFilesPerTrigger bounds the micro-batch (backpressure knob)") {
    val events = table("events")
    val st = graft.operators.EventLog.stream(spark, sfDir, events.schema,
      "user_id", lit(3L), "event_id", 0L, 256L,
      fileGlob = "events.parquet", maxFilesPerTrigger = Some(1))
    val q = st.writeStream.format("memory").queryName("t2_bp")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("t2_bp").count() ===
      events.where(col("user_id") === 3L).count())
  }
}
