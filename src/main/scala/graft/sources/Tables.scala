package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table catalog over one scale-factor directory
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * Plays the role of the reference's `Client`+`Session` connection plumbing
  * (reference: src/main/scala/join/package.scala:25-41 `StorageModule`;
  * src/main/scala/storage.scala:383-384 `connect`): in a Spark-first design a
  * table handle IS a lazily-planned `DataFrame`, and predicate/column pushdown
  * into the scan (the reference compiles filters into `find(query)`/CQL,
  * storage.scala:597,650) is supplied by Catalyst + the vectorized parquet
  * reader — `.explain` shows `PushedFilters`/`ReadSchema`.
  *
  * Scale posture: `spark.read.parquet` plans one task per ~maxPartitionBytes
  * split; nothing here materializes on the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables a planner should broadcast in joins. */
  val smallDims: Set[String] = Set("region", "nation", "supplier")

  /** Session settings every graft session needs. It belongs at session
    * construction — a loader mutating session conf is a global side effect
    * that surprises concurrent sessions — so every entrypoint
    * (Bench/Verify/RunOne/PlanAudit/tests) applies it at build time via
    * this map.
    *
    * - `nanosAsLong`: if the testdata generator ships `events.ts` as
    *   TIMESTAMP(NANOS) again (it did through round 8), the vectorized
    *   reader surfaces it as Long instead of rejecting the file; harmless
    *   for µs-encoded data. [[tsFromNanos]] adapts to either shape.
    * - `session.timeZone=UTC`: makes the NTZ→LTZ cast inside
    *   [[tsFromNanos]] value-identical at EVERY entrypoint, not only the
    *   ones whose launcher happens to set it (a spark-submit of Bench on a
    *   non-UTC host must not shift restored event times). */
  val sessionConf: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // r19 optimization round: plans wider than maxFields (default 100)
    // silently drop out of whole-stage codegen and run interpreted — the
    // 128-buffer conditional-aggregate fuzz gates lost codegen entirely
    // and paid 2.3× (q_fuzz_parity 5.7 s → 2.4 s at sf0.1 when raised).
    // 500 is a plan-WIDTH knob, independent of data scale or core count
    // (the generated functions are split by methodSplitThreshold as
    // usual), so it is safe at any SF and on a real cluster. Override
    // via spark.sql.codegen.maxFields if a future Spark version changes
    // the splitting behavior.
    "spark.sql.codegen.maxFields" -> "500",
    // Pinned explicitly (ADVICE r19 #2) because maxFields=500 applies
    // session-wide: if some very wide plan elsewhere ever blows Janino's
    // 64KB-method/constant-pool limits, fallback=true (the Spark default,
    // restated here so a deployment override can't flip it) demotes that
    // one stage to interpreted execution instead of failing the query —
    // the pre-r19 behavior, a perf-only regression, never a correctness
    // one.
    "spark.sql.codegen.fallback" -> "true")

  /** Expected shape per table: column → accepted Spark types. A silent
    * upstream regeneration of the testdata burned 19 gates in round 9;
    * this makes the failure loud, local, and actionable instead. Only
    * drift-prone columns are pinned — the guard is a tripwire, not a full
    * schema contract. */
  private val expectedShapes: Map[String, Map[String, Set[org.apache.spark.sql.types.DataType]]] = {
    import org.apache.spark.sql.types._
    Map(
      "events" -> Map(
        "event_id" -> Set(LongType),
        "ts" -> Set(LongType, TimestampType, TimestampNTZType),
        "user_id" -> Set(LongType),
        "event_type" -> Set(StringType)),
      "lineitem" -> Map(
        "l_orderkey" -> Set(LongType),
        "l_quantity" -> Set(LongType, IntegerType, DoubleType, DecimalType(12, 2), DecimalType(15, 2))),
      "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType)),
      "embeddings" -> Map(
        "vec_id" -> Set(LongType),
        "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false),
          ArrayType(DoubleType), ArrayType(DoubleType, containsNull = false))))
  }

  private def checkShape(name: String, schema: org.apache.spark.sql.types.StructType): Unit =
    for {
      expected <- expectedShapes.get(name)
      (colName, accepted) <- expected
    } {
      val actual = schema.find(_.name == colName).map(_.dataType)
      require(actual.isDefined,
        s"testdata drift: table '$name' lost column '$colName' (schema: ${schema.simpleString}); " +
          "regenerated parquet no longer matches graft.sources.Tables.expectedShapes")
      require(accepted.contains(actual.get),
        s"testdata drift: $name.$colName is ${actual.get.simpleString}, expected one of " +
          s"${accepted.map(_.simpleString).mkString("{", ",", "}")} — the generator changed its " +
          "encoding; extend the adapter (NormalizeEventTs / expectedShapes) before trusting results")
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table '$name' (expected one of ${all.mkString(",")})")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    checkShape(name, df.schema)
    df
  }

  /** events.ts → TimestampType (µs precision), whatever the parquet
    * encoding: schema-adaptive at analysis time via
    * [[graft.expressions.NormalizeEventTs]] — Long nanos get an exact
    * integral divide; native timestamp/NTZ pass through a UTC-safe cast.
    * (Name kept from the nanos era; every event-time call site routes
    * through here, which is what made round 9's drift a one-function fix.) */
  def tsFromNanos(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.expressions.NormalizeEventTs(expression(c)))
  }

  /** events.ts → epoch micros as Long, encoding-adaptive. For operators
    * whose arithmetic wants a plain long axis (range-join binning, window
    * range frames) rather than a timestamp. */
  def tsMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.unix_micros(tsFromNanos(c))
}
