package graft

import org.apache.spark.sql.functions._

class PropertyGetSpec extends SparkSpec {
  import spark.implicits._

  private def get(json: String, key: String): String = {
    graft.functions.GraftFunctions.register(spark)
    Seq(json).toDF("j")
      .select(call_function("graft_property_get", col("j"), lit(key)))
      .head().getString(0)
  }

  test("numeric, string, spaced, and missing keys") {
    assert(get("""{"k": 87}""", "k") === "87")
    assert(get("""{"a":"x","k":"hello world"}""", "k") === "hello world")
    assert(get("""{ "k" :  -3.5 , "z": 1}""", "k") === "-3.5")
    assert(get("""{"k": 87}""", "missing") === null)
    assert(get("""{"kk": 1, "k": 2}""", "k") === "2")
    assert(get("""{"s": "has \" quote"}""", "s") === "has \" quote")
    assert(get("""{"o": {"n": 1}}""", "o") === null) // nested: out of scope
  }

  test("matches get_json_object over the events table") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.df(spark, sfDir, "events")
    val diff = e.select(
        call_function("graft_property_get", col("props"), lit("k")).as("a"),
        get_json_object(col("props"), "$.k").as("b"))
      .where(!(col("a") <=> col("b"))).count()
    assert(diff === 0L)
  }
}
