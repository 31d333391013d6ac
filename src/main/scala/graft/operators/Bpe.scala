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
  *      projection, re-fenced behind the durable stage writer so
  *      round lineage stays flat and rounds survive executor loss.
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
    *
    * The |corpus| → |vocab| reduction (wordTable) is always distributed;
    * the merge LOOP is driver-side whenever the aggregated word table
    * fits (`count ≤ localThreshold`) — a production tokenizer trains
    * 32k–50k merges, and one Spark job per merge round would be a
    * driver-orchestration bottleneck measured in days, while the word
    * table itself is vocabulary-sized (millions of rows, not corpus-
    * sized) and each local round is a linear scan of it. The
    * distributed per-round path remains as the fallback for an
    * unbounded vocabulary; both paths emit identical rule tables
    * (OperatorsSpec asserts equality on the fixtures).
    */
  def train(df: DataFrame, textCol: String, merges: Int,
      localThreshold: Long = 2000000L): DataFrame = {
    val spark = df.sparkSession
    GraftFunctions.registerAll(spark)
    // vocab-sized but corpus-derived and unbounded (heaps-law growth
    // at 100 TB) -> durable stage fence, not executor-pinned blocks
    val words0 = graft.plans.Fence.corpus(wordTable(df, textCol), "bpe_words")
    val rules =
      if (words0.count() <= localThreshold) trainLocal(words0, merges)
      else trainDistributed(words0, merges)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rules, 1),
      StructType(Seq(StructField("round", LongType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** One Spark job per merge round — the unbounded-vocabulary fallback. */
  private def trainDistributed(words0: DataFrame, merges: Int): Seq[Row] = {
    var words = words0
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
        val next = graft.plans.Fence.corpus(words.withColumn("sym",
          GraftFunctions.mergePair(col("sym"), l, rr)), "bpe_round")
        // BPE runs are 10k+ merges and each round stages the FULL word
        // table: reclaim round r-1 the moment round r's write commits,
        // so storage is 2 word-table stages, not `merges` of them. The
        // `ne words0` guard is LOAD-BEARING: bpe_words IS a live
        // stage-writer frame the caller may still read, and an
        // unconditional reclaim on round 1 would delete it
        if (words ne words0) graft.plans.Fence.reclaim(words)
        words = next
        r += 1
      }
    }
    rules.toSeq
  }

  /** Spark's StringType ORDER BY compares UTF8String bytes — i.e. code
    * points — while Java String.compareTo compares UTF-16 units, which
    * disagree for supplementary characters vs U+E000..U+FFFF. The local
    * tie-break must replay the distributed one bit for bit.
    */
  private[graft] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Exact [[VectorHashOps.mergePair]] semantics on a JVM array:
    * greedy leftmost, non-overlapping.
    */
  private def mergeLocal(sym: Array[String], a: String, b: String)
      : Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](sym.length)
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b)
        i += 2
      } else {
        out += sym(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Driver-side merge loop over the collected word table: per round a
    * linear adjacency count + argmax + in-place merge, no job launch.
    */
  private def trainLocal(words: DataFrame, merges: Int): Seq[Row] = {
    var tbl: Array[(Array[String], Long)] = words
      .select(col("sym"), col("weight")).collect()
      .map(r => (r.getSeq[String](0).toArray, r.getLong(1)))
    val rules = scala.collection.mutable.ArrayBuffer.empty[Row]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val cnt = new java.util.HashMap[(String, String), java.lang.Long]
      tbl.foreach { case (sym, w) =>
        var i = 0
        while (i + 1 < sym.length) {
          cnt.merge((sym(i), sym(i + 1)), w, (p, q) => p + q)
          i += 1
        }
      }
      if (cnt.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        cnt.forEach { (k, v) =>
          if (best == null || v > best._2 ||
              (v == best._2 && (utf8Lt(k._1, best._1._1) ||
                (k._1 == best._1._1 && utf8Lt(k._2, best._1._2)))))
            best = (k, v)
        }
        val ((l, rr), c) = best
        rules += Row(r.toLong, l, rr, c)
        tbl = tbl.map { case (sym, w) => (mergeLocal(sym, l, rr), w) }
        r += 1
      }
    }
    rules.toSeq
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

  /** [[segment]] with a 1-based token position — the oracle-checked
    * form (qQ2): (doc_id, tok_idx) is a unique, deterministic key for
    * the row-order-independent compare. Same per-row kernel chain,
    * zero shuffles.
    */
  def segmentWithPos(df: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    GraftFunctions.registerAll(df.sparkSession)
    val toks = df.select(col(idCol),
      posexplode(graft.functions.TextOps.tokens(col(textCol)))
        .as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val seg = rules.foldLeft(chars(col("w"))) { case (c, (a, b)) =>
      GraftFunctions.mergePair(c, a, b)
    }
    toks.select(col(idCol), (col("pos") + 1).cast("long").as("tok_idx"),
      col("w"), seg.as("sym"))
  }

  /** DuckDB replay of [[segmentWithPos]]'s merge chain as an UNROLLED
    * nested-`replace` expression over a delimiter-wrapped symbol
    * string — generated from the SAME rule literals (the qJ6/qK8
    * generated-oracle pattern), closing the documented "BPE is not
    * SQL-expressible" gap for the APPLICATION half (training remains
    * spec-locked: the greedy argmax loop needs a fold and DuckDB's
    * reduce() corrupts list accumulators).
    *
    * Encoding: each symbol wrapped `\x01sym\x01` and concatenated, so
    * rule (l, r) is the literal substring `\x01l\x01\x01r\x01` and
    * SQL `replace()` — leftmost, non-overlapping, like every string
    * replace — reproduces [[VectorHashOps.mergePair]]'s greedy
    * semantics EXACTLY: after "aa"←(a,a) consumes two wrapped symbols
    * the residual `\x01a\x01` has no second wrapped operand to pair
    * with, which is precisely the kernel's skip-ahead. U+0001 is the
    * transport delimiter, so a token CONTAINING it would silently
    * shift symbol boundaries — callers must exclude such tokens
    * identically on both sides (qQ2 filters them in query and oracle;
    * the same discipline as GraftFunctions' VocabSep).
    *
    * Returns the expression text producing the merged wrapped string
    * from a column `s` holding the wrapped initial characters.
    */
  def mergeChainSql(rules: Seq[(String, String)]): String = {
    def wrap(sym: String) = s"chr(1)||'${sym.replace("'", "''")}'||chr(1)"
    rules.foldLeft("s") { case (e, (l, r)) =>
      s"replace($e, ${wrap(l)}||${wrap(r)}, ${wrap(l + r)})"
    }
  }
}
