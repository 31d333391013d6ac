package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Enforcement of the reference's `require_partition_filter=true` contract
  * (/root/reference/transform/web100.sql:8-13; schema/README.md:16-17 —
  * every date-partitioned table demands a partition predicate so a naive
  * query cannot scan years of data).
  *
  * Spark has no such table option, so this is the custom analyzer check
  * SURVEY.md §4.3 calls for: an `extendedCheckRules` hook that fails
  * analysis when a flagged table is scanned without a predicate over its
  * partition column anywhere in the plan. At 100 TB this check is the
  * difference between a 40 TB accidental full scan and an error message.
  *
  * Tables are flagged by name in [[PartitionFilterRegistry]]; the check
  * matches both catalog reads (saveAsTable) and path reads whose location
  * ends with the flagged name.
  */
object PartitionFilterRegistry {
  private val flagged = new ConcurrentHashMap[String, String]()

  /** Require queries over `table` to filter on `partitionCol`. */
  def flag(table: String, partitionCol: String): Unit =
    flagged.put(table.toLowerCase, partitionCol.toLowerCase)

  def unflag(table: String): Unit = flagged.remove(table.toLowerCase)

  def get(table: String): Option[String] =
    Option(flagged.get(table.toLowerCase))

  def isEmpty: Boolean = flagged.isEmpty
}

class PartitionFilterCheck(spark: SparkSession)
    extends (LogicalPlan => Unit) {

  override def apply(plan: LogicalPlan): Unit = {
    if (PartitionFilterRegistry.isEmpty) return
    // A bare relation is just a table handle (spark.read.parquet(...));
    // BigQuery likewise errors at query time, not reference time. Enforce
    // once the plan computes anything on top of the scan.
    if (plan.isInstanceOf[LogicalRelation]) return
    // Attributes constrained by any Filter in the plan.
    val filtered = plan.collect { case Filter(cond, _) =>
      cond.references.map(_.name.toLowerCase).toSet
    }.foldLeft(Set.empty[String])(_ ++ _)

    plan.foreach {
      case lr: LogicalRelation =>
        val names =
          lr.catalogTable.map(_.identifier.table.toLowerCase).toSeq ++
            locationNames(lr)
        names.flatMap(PartitionFilterRegistry.get).distinct.foreach { pcol =>
          if (!filtered.contains(pcol)) {
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "USER_RAISED_EXCEPTION",
              messageParameters = Map("errorMessage" ->
                (s"Table '${names.headOption.getOrElse("?")}' requires a " +
                  s"partition filter on '$pcol' " +
                  "(require_partition_filter contract)")))
          }
        }
      case _ => ()
    }
  }

  /** Last path segments of a file-relation location (directory name ==
    * logical table name for path-registered tables).
    */
  private def locationNames(lr: LogicalRelation): Seq[String] =
    lr.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths.map(_.getName.toLowerCase).distinct
      case _ => Nil
    }
}

/** Session extensions installing the partition-filter check and graft's
  * native function surface:
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. A session built
  * this way resolves `vec_dot`, `minhash_sig`, `is_private_ip`, … in SQL
  * text with no registration call — the idiomatic deployment route;
  * `GraftFunctions.registerAll` remains for plain sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectCheckRule(spark => new PartitionFilterCheck(spark))
    e.injectPlannerStrategy(_ => CooldownStrategy)
    e.injectOptimizerRule(_ => PushFilterThroughCooldown)
    graft.functions.GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        b))
    }
  }
}
