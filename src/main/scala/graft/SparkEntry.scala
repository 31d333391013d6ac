package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared query from the query modules under
  * `graft.queries`. Each module covers one slice of SURVEY.md §2's operator
  * inventory; `GraftQuery.doc` carries the operator IDs it exercises.
  */
object SparkEntry {

  /** All declared queries, in module order. */
  def allQueries: Seq[GraftQuery] =
    _root_.graft.queries.Relational.all ++
      _root_.graft.queries.Functions.all ++
      _root_.graft.queries.Composite.all ++
      _root_.graft.queries.LlmOps.all ++
      _root_.graft.queries.Extended.all ++
      _root_.graft.queries.Eras.all ++
      _root_.graft.queries.ErasUpload.all ++
      _root_.graft.queries.Pipeline.all ++
      _root_.graft.queries.Analytics.all ++
      _root_.graft.queries.Curation.all ++
      _root_.graft.queries.Evaluation.all ++
      _root_.graft.queries.Stats.all ++
      _root_.graft.queries.ViewSurface.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The pdf/cdf histogram TVF — the reference's marquee table function
    * (functions/ops.ndt7_download_pdf_autonode.sql) — exercising scan,
    * filter, O(n) binning, broadcast completeness frame, and both window
    * shapes in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "q20_ops_pdf_cdf").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
