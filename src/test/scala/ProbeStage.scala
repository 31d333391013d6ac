import org.apache.spark.sql.SparkSession
object ProbeStage {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.allQueries
    def run(n: String): Unit = {
      val qq = q.find(_.name.startsWith(n)).get
      // warm
      qq.run(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      qq.run(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    args.foreach(run)
    spark.stop()
  }
}
