package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** §1.2 typed-mapping semantics: the reference's `as[T]` returns Option[T]
  * on parse failure (mongotypes/package.scala:107-137); Spark's Encoder
  * derivation upgrades that to per-field nullability — Option fields absorb
  * missing/null values instead of failing the row. */
class TypedProjectionSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("as[T] with Option fields maps ragged documents to Some/None (reference product fixture)") {
    import spark.implicits._
    // the reference's product collection: producer_num/f absent on some docs
    val df = spark.read.json(Seq(
      """{"id": 1, "name": "Extra Large Wheel Barrow", "producerNum": 2, "flag": true}""",
      """{"id": 2, "name": "Large Wheel Barrow", "flag": false}""",
      """{"id": 3, "name": "Medium Wheel Barrow"}""").toDS())
    val ds = df.as[graft.model.RaggedDoc].collect().sortBy(_.id)
    assert(ds(0) === graft.model.RaggedDoc(1, "Extra Large Wheel Barrow", Some(2L), Some(true)))
    assert(ds(1) === graft.model.RaggedDoc(2, "Large Wheel Barrow", None, Some(false)))
    assert(ds(2) === graft.model.RaggedDoc(3, "Medium Wheel Barrow", None, None))
  }

  test("as[T] with the Encoder schema handles wholly-absent fields as None") {
    import spark.implicits._
    // schema inference fails fast if a field NEVER appears (fail-fast,
    // UNRESOLVED_COLUMN); reading with the Encoder's schema restores the
    // reference's Option semantics for columns absent from the data
    val schema = org.apache.spark.sql.Encoders.product[graft.model.RaggedDoc].schema
    val r = spark.read.schema(schema)
      .json(Seq("""{"id": 9, "name": "x"}""").toDS())
      .as[graft.model.RaggedDoc].head()
    assert(r === graft.model.RaggedDoc(9, "x", None, None))
  }

  test("column[T] on a missing field is an analysis error (fail-fast)") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select("no_such_column").as[String].collect()
    }
  }

  test("dynamic JSON document column: present keys extract, absent keys are null") {
    import spark.implicits._
    val df = Seq("""{"k": 87, "extra": "x"}""", """{"k": 3}""", """{"other": 1}""")
      .toDF("props")
      .select(
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        get_json_object(col("props"), "$.extra").as("extra"))
    val rows = df.collect()
    assert(rows.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq ===
      Seq(Some(87), Some(3), None))
    assert(rows.map(_.getAs[String]("extra")).toSeq === Seq("x", null, null))
  }
}
