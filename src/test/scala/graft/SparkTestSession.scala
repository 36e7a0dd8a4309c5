package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for all suites (cheap startup, no UI). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkEntry.sessionBuilder(SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  def table(name: String): DataFrame =
    graft.sources.Tables.load(spark, sfDir, name)
}
