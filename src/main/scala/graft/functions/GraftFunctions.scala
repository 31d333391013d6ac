package graft.functions


import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Session-level registration of graft's native expressions, exposing them
  * to both SQL text and the Column API (via `call_function`, the public
  * route to a registered expression — avoids depending on non-public
  * Column-construction internals).
  */
object GraftFunctions {

  /** Idempotently register all graft expressions on the session
    * (createOrReplaceTempFunction is itself idempotent).
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "safe_ip_from_string", es => SafeIpFromString(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "ip_trunc", es => IpTrunc(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "is_private_ip", es => IsPrivateIp(es.head), "built-in")
  }

  /** Column wrappers (require registerAll on the session first). */
  def safeIpFromString(c: Column): Column =
    call_function("safe_ip_from_string", c)
  def ipTrunc(c: Column, prefixLen: Column): Column =
    call_function("ip_trunc", c, prefixLen)
  def isPrivateIp(c: Column): Column =
    call_function("is_private_ip", c)
}
