package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Side-table sources beyond parquet — the Spark-first analog of the
  * reference's ad-hoc table providers
  * (rust/analytics/src/dfext/csv_table_provider.rs,
  * json_table_provider.rs): CSV and JSON-lines readers with an
  * EXPLICIT schema, so loading a side table never triggers a schema-
  * inference pre-scan (at 100 TB an inference pass is a full extra
  * read) and the column types joining against lakehouse views are
  * pinned rather than guessed.
  */
object TextSources {

  /** CSV with header, explicit schema, strict parsing (corrupt rows
    * fail fast instead of silently nulling).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  /** JSON-lines with explicit schema, strict parsing. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** ORC — the columnar alternative when a side table is too big for
    * text formats: column pruning and predicate pushdown reach the
    * reader (same scan contract as the parquet lakehouse tables).
    */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
