package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: run named queries and print row counts (test scope). */
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(',').toSeq else Seq("q26")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { prefix =>
      val q = SparkEntry.allQueries.find(_.name.startsWith(prefix)).get
      val res = q.run(spark, sfDir)
      println(s"[qc] ${q.name}: rows=${res.count()}")
      res.show(5, truncate = false)
    }
    spark.stop()
  }
}
