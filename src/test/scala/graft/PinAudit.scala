package graft

/** One-off: dump formatted plans + exchange accounting for the
  * fence-migrated queries whose pins are stale (round-12 item 1). */
object PinAudit {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.001"
    val spark = SparkTestBase.spark
    for (name <- args) {
      val q = SparkEntry.allQueries.find(_.name == name).get
      val qe = q.run(spark, sf).queryExecution
      val p = qe.executedPlan.toString
      val ex = "Exchange ".r.findAllIn(p).length
      val rex = "ReusedExchange ".r.findAllIn(p).length
      println(s"===== $name : exchanges=$ex reused=$rex net=${ex - rex}")
      println(qe.executedPlan.treeString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Join"))
        .take(80).mkString("\n"))
      println()
    }
    spark.stop()
  }
}
