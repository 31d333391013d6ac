package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM; ~5 s startup paid once).
  * Extensions are installed so the partition-filter check rule is live,
  * exactly as a production session would run.
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    // The suite's plan-shape assertions (PlanSpec exchange pins, the
    // broadcast-probe shapes) are derived under the DF-ORDER dedup
    // default; running sbt with -Dgraft.dedup.valueOrder=true would
    // silently flip containmentPrefixPairs to value order and redden
    // the qS0 pin with a misleading failure (ADVICE r13). The opt-out
    // is a production knob, not a test matrix — pin the default here.
    System.clearProperty("graft.dedup.valueOrder")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(s)
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
}
