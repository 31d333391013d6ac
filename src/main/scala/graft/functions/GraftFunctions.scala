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
    reg.createOrReplaceTempFunction(
      "vec_dot", es => VecDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash60", es => SimHash60Expr(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig", es => MinHashSigExpr(es(0),
        es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "shingle_hash_set", es => ShingleHashSetExpr(es(0),
        es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(
      "token_hashes", es => TokenHashesExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "stop_hits", es => StopHitsExpr(es(0),
        es(1).eval().toString.split(',').toSeq), "built-in")
  }

  /** Column wrappers (require registerAll on the session first). */
  def safeIpFromString(c: Column): Column =
    call_function("safe_ip_from_string", c)
  def ipTrunc(c: Column, prefixLen: Column): Column =
    call_function("ip_trunc", c, prefixLen)
  def isPrivateIp(c: Column): Column =
    call_function("is_private_ip", c)
  def vecDot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)
  def simhash60(hashes: Column): Column =
    call_function("simhash60", hashes)
  def minhashSig(hashes: Column, numHashes: Int): Column =
    call_function("minhash_sig", hashes,
      org.apache.spark.sql.functions.lit(numHashes))
  def shingleHashSet(tokens: Column, n: Int): Column =
    call_function("shingle_hash_set", tokens,
      org.apache.spark.sql.functions.lit(n))
  def tokenHashes(tokens: Column): Column =
    call_function("token_hashes", tokens)
  def stopHits(tokens: Column, words: Seq[String]): Column =
    call_function("stop_hits", tokens,
      org.apache.spark.sql.functions.lit(words.mkString(",")))
}
