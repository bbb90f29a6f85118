package graft.tmp
import graft.operators.Pq
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
object RecallProbe2 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Pq.scaled(Tables.df(spark, "/root/testdata/sf0.1", "embeddings")).localCheckpoint()
    val subs = Pq.subSlices(e).localCheckpoint()
    val qpred = col("vec_id") < 5
    val qs = e.where(qpred).select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val w = Window.partitionBy("query_id").orderBy(col("el2"), col("vec_id"))
    val exact = e.crossJoin(broadcast(qs)).where(col("vec_id") =!= col("query_id"))
      .withColumn("el2", Pq.l2sq(col("qv"), col("qqv")))
      .withColumn("erk", row_number().over(w)).where(col("erk") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id")).localCheckpoint()
    def recallRR(cb: org.apache.spark.sql.DataFrame, shortlist: Int): Seq[(Long, Long)] = {
      val top = Pq.adcTopK(Pq.encode(subs, cb), Pq.adcTables(subs, qpred, cb), k = shortlist)
      val rr = top.join(e, top("neighbor_id") === e("vec_id"))
        .join(broadcast(qs), "query_id")
        .withColumn("el2", Pq.l2sq(col("qv"), col("qqv")))
      val rw = Window.partitionBy("query_id").orderBy(col("el2"), col("neighbor_id"))
      val sel = rr.withColumn("rrk", row_number().over(rw)).where(col("rrk") <= 5)
        .select(col("query_id"), col("neighbor_id"))
      exact.join(sel, Seq("query_id","neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    val tr2 = Pq.trainCodebooks(subs, iters = 2)
    println("TRAIN2+rr100 = " + recallRR(tr2, 100))
    println("TRAIN2+rr200 = " + recallRR(tr2, 200))
    spark.stop()
  }
}
