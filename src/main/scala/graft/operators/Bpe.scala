package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.GraftFunctions

/** Byte-pair-encoding tokenizer TRAINING over a distributed corpus —
  * the step that produces the merge table a `vocab_encode`-style
  * tokenizer consumes (Sennrich et al. 2016's subword algorithm, the
  * shape GPT/Llama tokenizers train with at corpus scale).
  *
  * Scale shape per merge round:
  *   1. adjacency counts — slice/zip_with projections over the WORD
  *      table (corpus pre-aggregated to `word → weight` once: pair
  *      statistics are weight-sums over distinct words, so a round
  *      touches |vocab| rows, not |corpus|), one partial-aggregated
  *      groupBy on the pair;
  *   2. argmax — TakeOrderedAndProject of 1 row to the driver
  *      (deterministic (count desc, left, right) tie-break);
  *   3. apply — the `merge_pair` codegen kernel as a per-row
  *      projection, re-fenced with localCheckpoint so round lineage
  *      stays flat.
  *
  * Nothing here is SQL-expressible for the DuckDB oracle (the greedy
  * leftmost merge needs either a fold — DuckDB 1.0's reduce() corrupts
  * list accumulators — or lookaround regex, which RE2 lacks), so the
  * algorithm is locked by hand-computed OperatorsSpec fixtures instead
  * of a declared query.
  */
object Bpe {

  private def chars(c: org.apache.spark.sql.Column) =
    filter(split(c, ""), x => x =!= "")

  private def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.TextOps.tokens(col(textCol)))
        .as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("weight"))
      .withColumn("sym", chars(col("w")))

  /** Learn `merges` merge rules. Output: round, left, right,
    * pair_count (corpus-weighted adjacency count at merge time).
    */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = df.sparkSession
    GraftFunctions.registerAll(spark)
    var words = wordTable(df, textCol).localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer.empty[Row]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += Row(r.toLong, l, rr, cnt)
        words = words.withColumn("sym",
          GraftFunctions.mergePair(col("sym"), l, rr)).localCheckpoint()
        r += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rules.toSeq, 1),
      StructType(Seq(StructField("round", LongType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Corpus-weighted adjacency counts of the current symbol table. */
  private def pairCounts(words: DataFrame): DataFrame = {
    val n1 = greatest(size(col("sym")) - 1, lit(0))
    words.select(col("weight"),
        explode(zip_with(slice(col("sym"), lit(1), n1),
          slice(col("sym"), lit(2), n1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("weight")).as("cnt"))
  }

  /** Apply a learned merge table to a corpus: per-doc symbol arrays
    * after replaying the rules in round order — a chain of per-row
    * kernel projections, zero shuffles, rules driver-side by
    * construction (they came out of train's bounded merge list).
    */
  def segment(df: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    GraftFunctions.registerAll(df.sparkSession)
    val toks = df.select(col(idCol),
      explode(graft.functions.TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val seg = rules.foldLeft(chars(col("w"))) { case (c, (a, b)) =>
      GraftFunctions.mergePair(c, a, b)
    }
    toks.withColumn("sym", seg)
  }
}
