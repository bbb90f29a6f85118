package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val df = Seq(-4.1756260969689035e-07, -0.0, 0.0, -1.490162e-07).toDF("c")
    val r = df.select(col("c"), graft.queries.round(col("c"), 6).as("r"))
    r.collect().foreach { row =>
      val v = row.getDouble(1)
      println(s"c=${row.getDouble(0)} r=$v signbit=${java.lang.Double.doubleToRawLongBits(v) < 0}")
    }
    s.stop()
  }
}
