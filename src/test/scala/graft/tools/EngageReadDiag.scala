package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-bytes companion to the `pruneengage` probe leg: the task-level
  * input-bytes meter under-reports the standing-index scan inside
  * foreachBatch triggers, so the honest read-amplification numbers
  * come from the SCAN NODE itself — bytes of the files selected after
  * partition pruning, measured on a preserved copy of the probe's
  * 2^26-row auto-pruned base (N = 512).
  *
  * Usage: Test/runMain graft.tools.EngageReadDiag <baseDirCopy>
  */
object EngageReadDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/engage_idx_copy")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(dir)
    def selectedBytes(df: org.apache.spark.sql.DataFrame)
        : (Long, Long) = {
      df.write.format("noop").mode("overwrite").save()
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      val parts = scans.map(_.selectedPartitions.partitionCount.toLong).sum
      val bytes = scans.map(_.selectedPartitions.totalFileSize).sum
      (parts, bytes)
    }
    val rnd = new scala.util.Random(42)
    val (fullP, fullB) = selectedBytes(base)
    println(f"[diag] full scan: $fullP partitions, ${fullB / 1048576.0}%10.1f MB selected")
    for (k <- Seq(318, 61, 8)) {
      val picks = rnd.shuffle((0 until 512).toList).take(k)
      val (p, b) = selectedBytes(base.filter(col("b").isin(picks: _*)))
      println(f"[diag] restrict to $k%3d buckets: $p partitions, " +
        f"${b / 1048576.0}%10.1f MB selected (${100.0 * b / fullB}%5.1f%% of full)")
    }
    spark.stop()
  }
}
