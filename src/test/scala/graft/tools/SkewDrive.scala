package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SkewDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val large = (1 to 100000).map(i => (if (i % 10 == 0) i % 5 else 1, i.toLong)).toDF("k","v")
    val small = Seq((0,"a"),(1,"b"),(2,"c"),(3,"d"),(4,"e")).toDF("k","name")
    val r = graft.operators.Skew.saltedJoin(large, small, "k", col("v"), 8)
    r.groupBy("k").count().orderBy("k").show()
    println("SKEW_TOTAL=" + r.count())
    spark.stop()
  }
}
