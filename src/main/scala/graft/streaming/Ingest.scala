package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingestion — the clean extension SURVEY.md §2.9
  * identifies: the reference's "stream" is daily batch partitions appended
  * by the upstream parser (/root/reference/schema/README.md:6-9), so the
  * same view chain becomes streaming by swapping `read` for `readStream`:
  * file-arrival source → dedup by test id under a watermark → windowed
  * aggregation / append to the date-partitioned table.
  *
  * All transforms here are also valid on batch DataFrames (Structured
  * Streaming's unified-API contract), which is how the specs assert
  * semantics without a long-running query.
  */
object Ingest {

  /** File-arrival stream over a directory of parquet drops. */
  def streamTable(spark: SparkSession, dir: String, schema: StructType)
      : DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** At-least-once → effectively-once: drop duplicate test ids within the
    * watermark horizon (the reference relies on the parser's daily
    * idempotence; here it is explicit state).
    */
  def dedupByIdWithWatermark(df: DataFrame, idCol: String, tsCol: String,
      watermark: String = "1 day"): DataFrame =
    df.withWatermark(tsCol, watermark).dropDuplicates(Seq(idCol))

  /** Tumbling-window counts per key — the streaming analog of the
    * reference's hourly rollups
    * (views/website/entry07_platform_hourly_downloads_after.sql:76).
    */
  def windowedCounts(df: DataFrame, tsCol: String, keyCol: String,
      window: String = "1 hour", watermark: Option[String] = None)
      : DataFrame =
    watermark.fold(df)(w => df.withWatermark(tsCol, w))
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window),
        col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("cnt"), col("total_value"))

  /** Stream-stream equi + event-time interval join: enrich a measurement
    * stream with an annotation stream that may arrive up to
    * `maxDelaySec` later (either direction). Both sides carry
    * watermarks, and the time-bound condition is what lets the engine
    * EXPIRE join state — an unbounded stream-stream join would buffer
    * both streams forever. State per key is bounded by
    * watermark + maxDelay.
    *
    * Left columns keep their names; right payload columns must not
    * collide (rename before calling). Valid on batch frames too (the
    * unified-API contract) — the spec asserts batch/stream agreement.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, maxDelaySec: Long,
      watermark: String = "1 hour", joinType: String = "inner")
      : DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $maxDelaySec SECONDS") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxDelaySec SECONDS"),
      joinType)
      .drop(r(keyCol))
  }

  /** Streaming incremental dedup: screen every arriving micro-batch of
    * documents against a static, prebuilt corpus band index
    * (`Dedup.lshBandIndex`) and append one decision row per new doc.
    *
    * `foreachBatch` is the right harness here — the screen aggregates
    * per doc over its band matches, which is a batch-scoped aggregation
    * (each doc's bands arrive together in its micro-batch), not
    * cross-batch streaming state; the static index is the only standing
    * state and it lives outside the stream. This is the daily-crawl
    * topology: yesterday's corpus indexed once, today's docs screened as
    * they land.
    */
  def startDedupScreen(newDocs: DataFrame, oldIndex: DataFrame,
      idCol: String, textCol: String, shingleN: Int, bands: Int,
      rowsPerBand: Int, threshold: Double, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Dedup.screenAgainstIndex(batch, idCol, textCol,
            oldIndex, shingleN, bands, rowsPerBand, threshold)
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Per-micro-batch distribution-drift screen: each arriving batch is
    * histogrammed on `binExpr` and scored (PSI) against a STATIC
    * baseline histogram — the ingest-path monitoring loop that catches
    * an upstream format/mix change before it lands in the corpus. Like
    * the dedup screen, the baseline is the only standing state; the
    * per-batch score is one row appended to `outDir`.
    */
  def startDriftScreen(stream: DataFrame,
      baseline: DataFrame, binExpr: org.apache.spark.sql.Column,
      outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val counts = batch.groupBy(binExpr.as("bin"))
          .agg(count(lit(1)).as("n"))
        val psi = graft.operators.Drift.psiTotal(baseline, counts)
        val n = batch.count()
        Seq((batchId, n, psi)).toDF("batch_id", "n_rows", "psi")
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Incremental-cardinality screen: each micro-batch's values are
    * sketched ([[graft.operators.Hll.registers]]) and max-merged into
    * the standing register table at `regDir` — the streaming face of
    * the HLL lifecycle (per-batch registers are tiny, merge is
    * idempotent, and the estimate over the merged table equals the
    * estimate over the concatenated stream, any arrival order). Each
    * batch also appends a running per-group estimate row to `outDir`,
    * which is the monitoring signal: distinct-URL/token growth per
    * source as the crawl lands.
    *
    * The read-merge-overwrite of the register table is safe under
    * AvailableNow/foreachBatch's serialized batch execution; registers
    * are |groups| × 2^p rows — driver-light, never stream-sized.
    */
  def startCardinalityScreen(stream: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Int, regDir: String, outDir: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fresh = graft.operators.Hll.registers(
          batch, groupCols, col(valueCol), p)
        val merged =
          if (new java.io.File(regDir).exists()) {
            val standing = spark.read.parquet(regDir)
            graft.operators.Hll.merge(standing, fresh, groupCols)
          } else fresh
        // materialize before overwriting the table being read
        val pinned = merged.localCheckpoint()
        pinned.write.mode("overwrite").parquet(regDir)
        graft.operators.Hll.estimate(pinned, groupCols, p)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Incremental-frequency screen — [[startCardinalityScreen]]'s
    * Count-Min sibling: per micro-batch counter tables sum-merge into
    * the standing sketch at `skDir` (sum is associative/commutative,
    * so the merged table equals the sketch of the concatenated
    * stream), and each batch appends the probe list's running
    * frequency estimates — hot-key / hot-domain watch on the ingest
    * path without counting the vocabulary.
    */
  def startFrequencyScreen(stream: DataFrame, groupCols: Seq[String],
      valueCol: String, depth: Int, width: Int, probes: Seq[String],
      skDir: String, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val fresh = graft.operators.CountMin.sketch(
          batch, groupCols, col(valueCol), depth, width)
        val merged =
          if (new java.io.File(skDir).exists()) {
            val standing = spark.read.parquet(skDir)
            graft.operators.CountMin.merge(standing, fresh, groupCols)
          } else fresh
        val pinned = merged.localCheckpoint()
        pinned.write.mode("overwrite").parquet(skDir)
        graft.operators.CountMin.estimate(pinned, groupCols,
            probes.toDF("probe"), "probe", depth, width)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Append sink into the engine's date-partitioned layout: the streaming
    * continuation of the CTAS contract (transform/web100.sql:8-13).
    */
  def startPartitionedAppend(df: DataFrame, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.withColumn("date", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("date")
      .outputMode("append")
      .start()
}
