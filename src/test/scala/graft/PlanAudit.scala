package graft

/** Ad-hoc plan auditor (Test / runMain graft.PlanAudit [sfDir]): prints
  * per-query physical-plan stats — exchanges, file scans, nested-loop /
  * cartesian joins, unpartitioned windows — so scale-killers (duplicated
  * subtrees, corpus-wide sorts, accidental broadcasts of big sides) show
  * up as outlier counts instead of being discovered at 100 TB.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkTestBase.spark
    val rows = SparkEntry.allQueries.map { q =>
      // executedPlan: EnsureRequirements has inserted the exchanges
      // (sparkPlan is pre-preparation and renders none)
      val p =
        try q.run(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"ERROR ${e.getMessage}" }
      def n(pat: String) = pat.r.findAllIn(p).length
      (q.name, n("Exchange "), n("FileScan|Scan ExistingRDD"),
        n("BroadcastNestedLoopJoin|CartesianProduct"),
        n("windowspecdefinition\\(,") +
          n("Window \\[[^\\]]*\\], \\[\\]"),
        n("SortMergeJoin"), p.startsWith("ERROR"))
    }
    println(f"${"query"}%-28s exch scan nlj smj err")
    rows.foreach { case (name, ex, sc, nlj, _, smj, err) =>
      println(f"$name%-28s $ex%4d $sc%4d $nlj%3d $smj%3d ${if (err) "ERR" else ""}")
    }
    val worst = rows.sortBy(-_._2).take(10)
    println("\nmost exchanges: " +
      worst.map(r => s"${r._1}=${r._2}").mkString(", "))
  }
}
