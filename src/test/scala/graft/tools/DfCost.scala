package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.operators.Dedup
object DfCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[dfc] $label%-28s min ${ts.min}%6.2f s")
    }
    val d = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    timed("jpp value sf0.1")(Dedup.ngramJaccardPrefixPairs(d, "doc_id", "text", 3, 0.5))
    timed("jpp df    sf0.1")(Dedup.ngramJaccardPrefixPairs(d, "doc_id", "text", 3, 0.5, dfOrdered = true))
    timed("cpp value sf0.1")(Dedup.containmentPrefixPairs(d, "doc_id", "text", 3, 0.6))
    timed("cpp df    sf0.1")(Dedup.containmentPrefixPairs(d, "doc_id", "text", 3, 0.6, dfOrdered = true))
    spark.stop()
  }
}
