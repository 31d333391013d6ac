package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an sf1-equivalent dataset from sf0.1 as ten
  * DISJOINT SHARDS — every replica id-offset by r·10⁷, document tokens
  * salted per replica (so text workloads see 10× the corpus with the
  * within-shard duplicate/near-dup structure preserved and ZERO
  * cross-shard token overlap — a sharded crawl, not ten literal copies,
  * which would synthesize 10× artificial exact-dup groups and distort
  * every dedup scaling exponent), embeddings perturbed per replica (so
  * cosine-pair generators don't see 10 identical copies of every
  * vector). region/nation stay fixed (the TPC-H convention).
  *
  * Output: /root/repo/target/sf1/<table>.parquet. Used by the sf0.1→sf1
  * scale probe (SCALE.md); NOT driver testdata — /root/testdata is
  * read-only and stays untouched.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val replicas = 10
    val off = 10000000L
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // "hv" mode: events-only variant with 10x VALUE cardinality —
    // each replica's values banded into its own +r*1000 range, so the
    // post-cent-snap distinct-value frames (quantile cut-points,
    // residual ranks, score partials) genuinely grow 10x instead of
    // dedup-collapsing across shards. Probes the |distinct values|
    // boundedness claim the value-copying default cannot stress.
    if (args.headOption.contains("hv")) {
      val base = graft.Tables.load(spark, src, "events")
      (0 until replicas).map { r =>
        base.select((col("event_id") + lit(r * off)).as("event_id"),
          col("ts"), (col("user_id") + lit(r * off)).as("user_id"),
          col("event_type"),
          (col("value") + lit(r * 1000.0)).as("value"), col("props"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite")
        .parquet("/root/repo/target/sf1hv/events.parquet")
      spark.stop()
      println("wrote high-cardinality events to target/sf1hv")
      return
    }
    // "sf10" mode: documents + embeddings only at 100 REPLICAS (100x
    // sf0.1) — the second decade of the similarity-family scale probe.
    // The sf1 probe extrapolates one decade; the birthday-curve knee
    // the posting caps exist for appears in the second, so the banded/
    // capped pair generators (qP0/qP1/qP3/qB7) and the LSH DBSCAN
    // generator (qO9) are probed at 100x against exactly these shards.
    // Same disjointness discipline as the default mode: ids offset
    // r*10^7, tokens salted per replica (zero cross-shard shingle
    // overlap), embeddings perturbed per replica with a BOUNDED
    // deterministic delta (the sf1 formula grows linearly in r and
    // would swamp the cosine structure by r=99).
    if (args.headOption.contains("sf10")) {
      val reps = 100
      val docs = graft.Tables.load(spark, src, "documents")
      (0 until reps).map { r =>
        val text =
          if (r == 0) col("text")
          else array_join(transform(split(col("text"), " "),
            t => concat(t, lit(s"~$r"))), " ")
        docs.select((col("doc_id") + lit(r * off)).as("doc_id"),
          text.as("text"), col("lang"), col("source"),
          length(text).cast("long").as("n_chars"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite")
        .parquet("/root/repo/target/sf10/documents.parquet")
      val emb = graft.Tables.load(spark, src, "embeddings")
      (0 until reps).map { r =>
        // two coprime-modulus terms: (r mod 19, r mod 17) is unique
        // for r < 323 and never (9-zero, 8-zero) simultaneously for
        // 1 <= r <= 99, so every replica gets a DISTINCT nonzero
        // bounded delta (a single mod-19 term collapses 100 replicas
        // to 19 variants with 5 exact copies — round-9 review find)
        val e =
          if (r == 0) col("embedding")
          else transform(col("embedding"),
            (x, i) => (x +
              (lit(((r * 37) % 19 - 9) * 0.0008) +
                lit(((r * 53) % 17 - 8) * 0.00013)) *
                ((i % 7) - lit(3.0))).cast("float"))
        emb.select((col("vec_id") + lit(r * off)).as("vec_id"),
          e.as("embedding"), col("label"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite")
        .parquet("/root/repo/target/sf10/embeddings.parquet")
      spark.stop()
      println("wrote 100x documents+embeddings shards to target/sf10")
      return
    }
    // "ov" mode: OVERLAPPING-boilerplate document corpora — the
    // adversarial shape the disjoint salting deliberately avoids and
    // therefore can never falsify: every document (every shard) gets
    // the SAME 12-token boilerplate tail, so ten corpus-wide hot
    // shingles whose posting lists grow ∝ n thread through every
    // inverted-index/prefix/band generator. Four sizes: small (sf0.01
    // base), mid (sf0.1 base), sf1 (10 shards), sf10 (100 shards) —
    // real tokens still salted per shard, ids still offset, so the
    // ONLY cross-shard overlap is the boilerplate (plus sf0.1's
    // within-shard near-dup structure).
    if (args.headOption.contains("ov")) {
      val bp = (0 until 12).map(i => s"zbp$i").mkString(" ", " ", "")
      def withBp(base: DataFrame, reps: Int): DataFrame =
        (0 until reps).map { r =>
          val text =
            if (r == 0) col("text")
            else array_join(transform(split(col("text"), " "),
              t => concat(t, lit(s"~$r"))), " ")
          base.select((col("doc_id") + lit(r * off)).as("doc_id"),
            concat(text, lit(bp)).as("text"), col("lang"), col("source"),
            (length(text) + lit(bp.length)).cast("long").as("n_chars"))
        }.reduce(_ unionAll _)
      val d001 = graft.Tables.load(spark, "/root/testdata/sf0.01",
        "documents")
      val d01 = graft.Tables.load(spark, src, "documents")
      for ((name, df) <- Seq(
          "small" -> withBp(d001, 1), "mid" -> withBp(d01, 1),
          "sf1" -> withBp(d01, 10), "sf10" -> withBp(d01, 100)))
        df.write.mode("overwrite")
          .parquet(s"/root/repo/target/ov/$name/documents.parquet")
      spark.stop()
      println("wrote overlapping-boilerplate corpora to target/ov")
      return
    }

    // "ovl" mode: the LINE-STRUCTURED sibling of "ov" — identical
    // corpora except the boilerplate tail sits on its OWN line with no
    // terminal punctuation (the realistic web shape: footers and nav
    // chrome are block-separable, which is the premise of the C4/
    // extraction gate posture). The gated containment chain (qS0's
    // operator composition) can DROP the tail here, so probing it on
    // ovl demonstrates the posture's operating shape, while raw "ov"
    // (tail inline, gate-blind) isolates the output-bound residual.
    if (args.headOption.contains("ovl")) {
      val bpLine = (0 until 12).map(i => s"zbp$i").mkString(" ")
      def withBpLine(base: DataFrame, reps: Int): DataFrame =
        (0 until reps).map { r =>
          val text =
            if (r == 0) col("text")
            else array_join(transform(split(col("text"), " "),
              t => concat(t, lit(s"~$r"))), " ")
          val full = concat(text, lit("."), lit("\n"), lit(bpLine))
          base.select((col("doc_id") + lit(r * off)).as("doc_id"),
            full.as("text"), col("lang"), col("source"),
            length(full).cast("long").as("n_chars"))
        }.reduce(_ unionAll _)
      val d01l = graft.Tables.load(spark, src, "documents")
      for ((name, df) <- Seq(
          "mid" -> withBpLine(d01l, 1), "sf1" -> withBpLine(d01l, 10),
          "sf10" -> withBpLine(d01l, 100)))
        df.write.mode("overwrite")
          .parquet(s"/root/repo/target/ovl/$name/documents.parquet")
      spark.stop()
      println("wrote line-boilerplate corpora to target/ovl")
      return
    }
    val out = "/root/repo/target/sf1"

    def load(n: String): DataFrame =
      graft.Tables.load(spark, src, n)

    def write(n: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")

    // fixed dimensions
    write("region", load("region"))
    write("nation", load("nation"))

    def replicated(n: String)(f: (DataFrame, Int) => DataFrame)
        : DataFrame = {
      val base = load(n)
      (0 until replicas).map(r => f(base, r)).reduce(_ unionAll _)
    }

    def shift(c: String, r: Int) = col(c) + lit(r * off)

    write("customer", replicated("customer") { (df, r) =>
      df.select(shift("c_custkey", r).as("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    })
    write("supplier", replicated("supplier") { (df, r) =>
      df.select(shift("s_suppkey", r).as("s_suppkey"), col("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    })
    write("part", replicated("part") { (df, r) =>
      df.select(shift("p_partkey", r).as("p_partkey"), col("p_name"),
        col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice"))
    })
    write("orders", replicated("orders") { (df, r) =>
      df.select(shift("o_orderkey", r).as("o_orderkey"),
        shift("o_custkey", r).as("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    })
    write("lineitem", replicated("lineitem") { (df, r) =>
      df.select(shift("l_orderkey", r).as("l_orderkey"),
        shift("l_partkey", r).as("l_partkey"),
        shift("l_suppkey", r).as("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
    })
    write("events", replicated("events") { (df, r) =>
      df.select(shift("event_id", r).as("event_id"), col("ts"),
        shift("user_id", r).as("user_id"), col("event_type"),
        col("value"), col("props"))
    })
    write("documents", replicated("documents") { (df, r) =>
      val text =
        if (r == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"~$r"))), " ")
      df.select(shift("doc_id", r).as("doc_id"), text.as("text"),
        col("lang"), col("source"), length(text).cast("long")
          .as("n_chars"))
    })
    write("embeddings", replicated("embeddings") { (df, r) =>
      // deterministic per-replica perturbation, small enough to keep
      // realistic cosine structure, large enough that replicas are not
      // bitwise-identical vectors
      val emb =
        if (r == 0) col("embedding")
        else transform(col("embedding"),
          (x, i) => (x + lit(r * 0.003) * ((i % 5) - lit(2.0)))
            .cast("float"))
      df.select(shift("vec_id", r).as("vec_id"), emb.as("embedding"),
        col("label"))
    })
    spark.stop()
    println(s"wrote sf1 shards to $out")
  }
}
