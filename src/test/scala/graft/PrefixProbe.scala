package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway A/B probe: window-rank prefix join (r4 shape + FP epsilon)
  * vs the current collect_list restructure.
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextOps

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r rows)")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val threshold = 0.5

    def variantWindow(): Long = {
      val sets = docs.select(col("doc_id"),
        TextOps.shingleHashSet(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0).localCheckpoint()
      val inv = sets.select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("shingle"))
      val freq = inv.groupBy("shingle").agg(count(lit(1)).as("df_"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("df_"), col("shingle"))
      val prefix = inv.hint("shuffle_hash")
        .join(freq.hint("shuffle_hash"), Seq("shingle"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <=
          col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-6)) + 1)
        .select(col("shingle"), col("doc_id"), col("sz"))
        .hint("shuffle_hash")
      val cand = prefix.as("x")
        .join(prefix.as("y"),
          col("x.shingle") === col("y.shingle") &&
            col("x.doc_id") < col("y.doc_id") &&
            col("y.sz") >= lit(threshold) * col("x.sz") - lit(1e-6) &&
            col("x.sz") >= lit(threshold) * col("y.sz") - lit(1e-6))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha")),
          Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")),
          Seq("doc_b"))
        .withColumn("common",
          size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jaccard", col("common").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("common")))
        .filter(col("jaccard") >= threshold).count()
    }

    def variantCurrent(): Long =
      graft.operators.Dedup.ngramJaccardPrefixPairs(
        docs, "doc_id", "text", 3, threshold).count()

    (1 to 3).foreach(i => timed(s"window run$i")(variantWindow()))
    (1 to 3).foreach(i => timed(s"current run$i")(variantCurrent()))
    spark.stop()
  }
}
