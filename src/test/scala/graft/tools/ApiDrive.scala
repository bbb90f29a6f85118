package graft.tools
import org.apache.spark.sql.SparkSession
object ApiDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false")
      .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val b = Some(java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L)
    val e = Some(java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L)
    graft.Graft.query(spark, "/root/testdata/sf0.001",
      "SELECT name, count(*) AS n, round(avg(value),2) AS avg_v FROM measures GROUP BY name ORDER BY name",
      b, e).show()
    spark.stop()
  }
}
