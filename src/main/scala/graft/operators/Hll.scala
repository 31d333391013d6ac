package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** HyperLogLog cardinality sketch (Flajolet, Fusy, Gandouet, Meunier,
  * AofA'07) as PLAIN DataFrame aggregates — no UDAF, no binary blob:
  * the sketch IS a (group, register_index, rho) table, which makes it
  *
  *   - mergeable: union + max per register (Agarwal et al., "Mergeable
  *     Summaries", PODS'12 — max is idempotent/commutative/associative,
  *     so ANY merge tree, incl. re-merging yesterday's persisted
  *     registers with today's, yields the register state of the
  *     concatenated stream);
  *   - persistable/incremental: write the register table per day or
  *     per shard, re-estimate over any union of shards without
  *     touching raw data — the same lifecycle as the LSH band index
  *     ([[Dedup.lshBandIndex]]);
  *   - fully codegen: hash, register split, and rank are built-in
  *     expressions; the only shuffle is the partial-aggregated groupBy
  *     on (group, register) — O(groups × 2^p) rows, never the stream.
  *
  * Determinism: the value hash is the portable md5-based 32-bit
  * [[TextOps.hash32]]; register index = low p bits, rank = position of
  * the leading 1 in the remaining (32−p) bits. Every step (including
  * the estimate's bias constant and small-range correction) is
  * reproducible bit-for-bit in any SQL engine, which is what lets the
  * DuckDB oracle check the ESTIMATE itself, not just plumbing.
  *
  * Standard error ≈ 1.04/√(2^p): p=9 → ~4.6%.
  */
object Hll {

  /** Per-group register table: (groupCols..., ridx, rho) with
    * rho = max over the group's values hashing to that register.
    * Missing registers mean "never hit" (rho conceptually 0) and are
    * re-materialized arithmetically in [[estimate]] — storing only hit
    * registers keeps sparse groups cheap.
    */
  /** (ridx, rho) projection columns for one value — shared by the
    * batch, grouped, and event-time-windowed register builders.
    * rho = rank of the leading 1 bit of the hash's top (32−p) bits,
    * 1-based; all-zero → (32−p)+1. floor(log2(w)) is FP-exact for
    * w < 2^24: log2 of an exact power of two is exact, and off-power
    * values sit > 4e-15 away from the next integer.
    */
  private def registerCols(value: Column, p: Int): Seq[Column] = {
    val h = TextOps.hash32(value)
    val w = shiftright(h, p)
    val rho = when(w === 0, lit(32 - p + 1))
      .otherwise(lit(32 - p) - floor(log2(w)))
    Seq(h.bitwiseAND(lit((1L << p) - 1)).as("ridx"),
      rho.cast("long").as("rho"))
  }

  def registers(df: DataFrame, groupCols: Seq[String], value: Column,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "p in [4,16] (m = 2^p registers)")
    // a NULL value hashes to a NULL register, which would survive the
    // groupBy as a phantom (ridx=null) row and inflate m_used — NULLs
    // carry no cardinality, drop them at the scan
    df.filter(value.isNotNull)
      .select(groupCols.map(col) ++ registerCols(value, p): _*)
      .groupBy((groupCols.map(col) :+ col("ridx")): _*)
      .agg(max("rho").as("rho"))
  }

  /** 64-bit-hash register builder (the HLL++ lineage, Heule et al.
    * EuroSys'13): same (groupCols..., ridx, rho) table schema and the
    * SAME [[merge]]/[[estimate]] machinery, but rho derives from a
    * 63-bit md5-based hash — lifting the reliable range from ~10^8
    * distinct per group (where the 32-bit [[TextOps.hash32]] itself
    * saturates: every distinct beyond 2^32 necessarily collides,
    * documented at [[estimate]]) into the 100 TB-distinct regime
    * (collision-free to ~10^18).
    *
    * Two portability details:
    *   - the hash is 63 bits (top md5 bit masked) so it stays a
    *     POSITIVE long in any engine — no unsigned/overflow dialect
    *     divergence;
    *   - the leading-one rank is EXACT integer/hex arithmetic
    *     (hex-digit count + top-digit case), not floor(log2):
    *     w spans up to 2^(63−p), past double's 53-bit mantissa, where
    *     floating log2 can mis-round at power-of-two boundaries.
    *
    * The estimator keeps the FFGM small-range correction and needs no
    * large-range branch — that branch exists to undo 32-bit hash
    * saturation and is unreachable with 63 hash bits.
    */
  def registers64(df: DataFrame, groupCols: Seq[String], value: Column,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "p in [4,16] (m = 2^p registers)")
    val md = md5(value)
    val hi = conv(substring(md, 1, 8), 16, 10).cast("long")
      .bitwiseAND(lit(0x7FFFFFFFL))
    val lo = conv(substring(md, 9, 8), 16, 10).cast("long")
    val h = hi * lit(4294967296L) + lo // 63-bit positive
    val w = shiftright(h, p)
    val hx = hex(w) // no leading zeros → digit count locates the MSB
    val top = conv(substring(hx, 1, 1), 16, 10).cast("int")
    val msb = (length(hx) - 1) * 4 + // floor(log2(top)), top in 1..15
      when(top >= 8, 3).when(top >= 4, 2).when(top >= 2, 1).otherwise(0)
    val rho = when(w === 0, lit(63 - p + 1))
      .otherwise(lit(63 - p) - msb)
    df.filter(value.isNotNull)
      .select(groupCols.map(col) :+
        h.bitwiseAND(lit((1L << p) - 1)).as("ridx") :+
        rho.cast("long").as("rho"): _*)
      .groupBy((groupCols.map(col) :+ col("ridx")): _*)
      .agg(max("rho").as("rho"))
  }

  /** Event-time-windowed registers — the STATEFUL-streaming face of
    * the sketch (vs [[graft.streaming.Ingest.startCardinalityScreen]]'s
    * foreachBatch merge): `groupBy(window(ts), ridx) → max(rho)` is a
    * plain streaming aggregation, so watermarking, state eviction, and
    * late-data handling are Catalyst's, not ours; state per window is
    * ≤ 2^p registers regardless of traffic. The SAME transform runs on
    * a batch frame (window() is an ordinary function), which is how
    * the spec asserts stream/batch agreement. Estimate the emitted
    * register tables per window with [[estimate]] downstream.
    */
  def windowedRegisters(df: DataFrame, tsCol: String, value: Column,
      p: Int, windowDuration: String, watermarkDelay: String)
      : DataFrame = {
    require(p >= 4 && p <= 16, "p in [4,16] (m = 2^p registers)")
    val src = (if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay)
      else df).filter(value.isNotNull) // see registers(): no phantom rows
    src.select(window(col(tsCol), windowDuration).as("win") +:
        registerCols(value, p): _*)
      .groupBy(col("win"), col("ridx"))
      .agg(max("rho").as("rho"))
      .select(col("win.start").as("window_start"), col("ridx"),
        col("rho"))
  }

  /** Merge register tables (same groupCols/p): union + max. Feeding the
    * result back into merge is sound — max is associative/idempotent.
    */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String])
      : DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("ridx")): _*)
      .agg(max("rho").as("rho"))

  /** Cardinality estimate per group from a register table: the raw
    * harmonic-mean estimator with the linear-counting small-range
    * correction (the original FFGM'07 pair; the 32-bit large-range
    * branch is irrelevant below ~10^8 per group and omitted —
    * documented, not forgotten).
    *
    * Output: groupCols..., m_used (hit registers), est (double).
    */
  def estimate(regs: DataFrame, groupCols: Seq[String], p: Int)
      : DataFrame = {
    val m = (1L << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("m_used"),
        // 2^-rho sums: powers of two are FP-exact, so the harmonic sum
        // is reproducible across engines
        sum(lit(1.0) / pow(lit(2.0), col("rho"))).as("zhit"))
      .withColumn("z", col("zhit") + (lit(m) - col("m_used")))
      .withColumn("e_raw", lit(alpha * m * m) / col("z"))
      .withColumn("est",
        when(col("e_raw") <= lit(2.5 * m) && col("m_used") < lit(m),
          lit(m) * log(lit(m) / (lit(m) - col("m_used"))))
          .otherwise(col("e_raw")))
      .select((groupCols.map(col) :+ col("m_used") :+ col("est")): _*)
  }

  /** registers → estimate in one call, for the non-incremental case. */
  def cardinality(df: DataFrame, groupCols: Seq[String], value: Column,
      p: Int): DataFrame =
    estimate(registers(df, groupCols, value, p), groupCols, p)

  /** Set-operation estimates from two register tables — the payoff of
    * keeping sketches as mergeable tables: |A∪B| estimates off the
    * max-merged registers WITHOUT rescanning either stream, and |A∩B|
    * follows by inclusion–exclusion (clamped at 0 — the estimator can
    * go slightly negative for near-disjoint sets). This is how
    * cross-shard / cross-day overlap questions ("how many of today's
    * distinct URLs did yesterday already have?") are answered at scale:
    * three register-table aggregates, zero raw-data passes.
    *
    * Output: groupCols..., est_a, est_b, est_union, est_intersect.
    */
  def overlapEstimate(a: DataFrame, b: DataFrame,
      groupCols: Seq[String], p: Int): DataFrame = {
    def est1(r: DataFrame, name: String) =
      estimate(r, groupCols, p)
        .withColumnRenamed("est", name).drop("m_used")
    val ea = est1(a, "est_a")
    val eb = est1(b, "est_b")
    val eu = est1(merge(a, b, groupCols), "est_union")
    val joined =
      if (groupCols.isEmpty) ea.crossJoin(eb).crossJoin(eu)
      else ea.join(eb, groupCols).join(eu, groupCols)
    joined.withColumn("est_intersect",
      greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
  }
}
