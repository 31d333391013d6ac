package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: train the BPE merge table on a fixture corpus and print
  * it as the Scala literal the qQ2 declaration embeds — the provenance
  * of `LlmOps.BpeFixtureRules` (a tokenizer is trained ONCE and the
  * merge table ships as an artifact; the declared query applies it).
  * Re-run after any change to Bpe.train to refresh the literals:
  *
  *   sbt "Test/runMain graft.tools.BpeDump /root/testdata/sf0.01 24"
  */
object BpeDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val merges = if (args.length > 1) args(1).toInt else 24
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    val rules = graft.operators.Bpe.train(docs, "text", merges).collect()
    println("  val BpeFixtureRules: Seq[(String, String)] = Seq(")
    println(rules.map { r =>
      val l = r.getString(1); val rr = r.getString(2)
      s"""    ("$l", "$rr")"""
    }.mkString(",\n"))
    println("  )")
    rules.foreach(r => println(
      s"// round ${r.getLong(0)}: ${r.getString(1)}+${r.getString(2)} " +
        s"count=${r.getLong(3)}"))
    spark.stop()
  }
}
