package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (test scope, not part of the suite). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(',').toSeq
      else Seq("q38_quality", "q39_token_counts")
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { prefix =>
      val q = SparkEntry.allQueries.find(_.name.startsWith(prefix)).get
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(s"[probe] ${q.name} run$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      // count codegen spans on the POST-EXECUTION plan: with AQE on,
      // an unexecuted df prints "isFinalPlan=false" without the
      // WholeStageCodegen wrappers, which made this metric read 0 for
      // every query. The action must run on THIS df's QueryExecution —
      // df.write clones the plan into a fresh one and leaves the
      // original unfinalized.
      val df = q.run(spark, sfDir)
      // execute the plan object itself: df.write / df.foreach both
      // clone into a fresh QueryExecution and leave this one
      // unfinalized
      val exec = df.queryExecution.executedPlan
      exec.executeTake(1)
      val plan = exec.toString
      // the simple tree renders a codegen span as a "*(id)" node
      // prefix (the word WholeStageCodegen only appears in formatted
      // explain); distinct ids = span count
      val wsc = """\*\((\d+)\)""".r
        .findAllMatchIn(plan).map(_.group(1)).toSet.size
      println(s"[probe] ${q.name} WholeStageCodegen spans: $wsc " +
        s"(finalPlan=${plan.contains("isFinalPlan=true")})")
    }
    spark.stop()
  }
}
