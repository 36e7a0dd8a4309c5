package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.sessionBuilder(
      SparkSession.builder().appName("graft-plandump").master("local[8]")).getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    args.drop(1).foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      df.explain("formatted")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
