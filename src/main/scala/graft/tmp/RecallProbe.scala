package graft.tmp
import graft.operators.Pq
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SF", "/root/testdata/sf0.1")
    val e = Pq.scaled(Tables.df(spark, sf, "embeddings")).localCheckpoint()
    val subs = Pq.subSlices(e).localCheckpoint()
    val qpred = col("vec_id") < 5
    val qs = e.where(qpred).select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val w = Window.partitionBy("query_id").orderBy(col("el2"), col("vec_id"))
    val exact = e.crossJoin(broadcast(qs)).where(col("vec_id") =!= col("query_id"))
      .withColumn("el2", Pq.l2sq(col("qv"), col("qqv")))
      .withColumn("erk", row_number().over(w)).where(col("erk") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id")).localCheckpoint()
    def recall(cb: org.apache.spark.sql.DataFrame, shortlist: Int): Seq[(Long, Long)] = {
      val top = Pq.adcTopK(Pq.encode(subs, cb), Pq.adcTables(subs, qpred, cb), k = shortlist)
      val sel = if (shortlist == 5) top else {
        // exact re-rank of the ADC shortlist
        val rr = top.join(e, top("neighbor_id") === e("vec_id"))
          .join(broadcast(qs), "query_id")
          .withColumn("el2", Pq.l2sq(col("qv"), col("qqv")))
        val rw = Window.partitionBy("query_id").orderBy(col("el2"), col("neighbor_id"))
        rr.withColumn("rrk", row_number().over(rw)).where(col("rrk") <= 5)
          .select(col("query_id"), col("neighbor_id"))
      }
      exact.join(sel.select("query_id","neighbor_id"), Seq("query_id","neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    val sample = Pq.sampleCodebook(subs)
    println("SAMPLE@5      = " + recall(sample, 5))
    println("SAMPLE+rr50   = " + recall(sample, 50))
    for (it <- Seq(2, 4)) {
      val tr = Pq.trainCodebooks(subs, iters = it)
      println(s"TRAIN$it@5     = " + recall(tr, 5))
      println(s"TRAIN$it+rr50  = " + recall(tr, 50))
    }
    spark.stop()
  }
}
