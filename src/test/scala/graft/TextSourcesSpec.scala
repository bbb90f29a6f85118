package graft

import graft.sources.TextSources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV/JSON side-table sources must roundtrip lakehouse data exactly
  * (schema-pinned, no inference) and join back against parquet views.
  */
class TextSourcesSpec extends SparkSpec with TmpDirSupport {


  private lazy val base = {
    // timestamps flattened to epoch micros for text-format roundtrip
    Tables.df(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
  }
  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("ts_us", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("CSV roundtrip: schema pinned, all rows and values preserved") {
    val dir = tmpDir("graft-csv")
    base.write.mode("overwrite").option("header", "true").csv(dir)
    val back = TextSources.csv(spark, dir, schema)
    assert(back.schema === schema) // explicit schema, not inferred
    assert(back.count() === base.count())
    assert(back.exceptAll(base).isEmpty && base.exceptAll(back).isEmpty)
  }

  test("JSON-lines roundtrip joins back against the parquet view") {
    val dir = tmpDir("graft-json")
    base.write.mode("overwrite").json(dir)
    val back = TextSources.json(spark, dir, schema)
    assert(back.schema === schema)
    val joined = back.join(base.select(col("event_id"), col("value").as("v2")), "event_id")
    assert(joined.where(col("value") =!= col("v2")).isEmpty)
    assert(joined.count() === base.count())
  }

  test("ORC roundtrip preserves rows and pushes predicates to the scan") {
    val dir = tmpDir("graft-orc")
    base.write.mode("overwrite").orc(dir)
    val back = TextSources.orc(spark, dir, schema)
    assert(back.count() === base.count())
    assert(back.exceptAll(base).isEmpty && base.exceptAll(back).isEmpty)
    // predicate pushdown reaches the ORC reader like parquet
    val plan = back.where(col("event_id") === 42L).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), EqualTo(event_id,42)]"),
      s"no pushdown in:\n$plan")
  }

  test("FAILFAST surfaces corrupt rows instead of nulling them") {
    val dir = tmpDir("graft-bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.json"),
      "{\"event_id\": \"not-a-number\"}\n".getBytes)
    val ex = intercept[Exception] {
      TextSources.json(spark, dir, schema).collect()
    }
    assert(ex.getMessage != null)
  }
}
