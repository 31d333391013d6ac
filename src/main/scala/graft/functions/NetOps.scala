package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery NET.* function trio as native Catalyst expressions
  * (SURVEY.md §2.8 "Net (IP)" family; reference usage:
  * views/ndt_intermediate/extended_ndt7_downloads.sql:61-67 — the RFC1918
  * private-address predicate repeated across six views).
  *
  * Implemented as `Expression`s with `doGenCode` delegating to the static
  * evaluators below, so they participate in whole-stage codegen (no UDF
  * boxing on the 100 TB hot path). Registered for SQL + Column use via
  * [[GraftFunctions.registerAll]].
  *
  * Semantics pinned to BigQuery:
  *   - NET.IP_FROM_STRING: error on malformed input → here the erroring
  *     variant is intentionally not exposed; use the SAFE form.
  *   - NET.SAFE_IP_FROM_STRING: NULL on malformed input.
  *   - NET.IP_TRUNC(bytes, prefixLen): keep the first prefixLen bits,
  *     zero the rest.
  * Supports IPv4 (4 bytes) and IPv6 (16 bytes), matching BigQuery.
  */
object NetOps {

  /** Parse a textual IP to network bytes; null on malformed input. */
  def safeIpFromString(s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val str = s.toString
    // Reject hostnames: only digits/dots (v4) or hex/colons (v6) allowed,
    // InetAddress.getByName would otherwise resolve DNS.
    val looksV4 = str.nonEmpty && str.forall(c => c.isDigit || c == '.')
    val looksV6 = str.nonEmpty && str.forall(c =>
      c.isDigit || c == ':' || c == '.' ||
        (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))
    if (!looksV4 && !looksV6) return null
    try {
      val addr = java.net.InetAddress.getByName(str)
      addr.getAddress
    } catch {
      case _: Exception => null
    }
  }

  /** Zero all bits after prefixLen. Null on null/invalid prefix. */
  def ipTrunc(bytes: Array[Byte], prefixLen: Int): Array[Byte] = {
    if (bytes == null) return null
    val maxBits = bytes.length * 8
    if (prefixLen < 0 || prefixLen > maxBits) return null
    val out = new Array[Byte](bytes.length)
    val fullBytes = prefixLen / 8
    val remBits = prefixLen % 8
    var i = 0
    while (i < fullBytes) { out(i) = bytes(i); i += 1 }
    if (remBits > 0 && fullBytes < bytes.length) {
      val mask = (0xFF << (8 - remBits)) & 0xFF
      out(fullBytes) = (bytes(fullBytes) & mask).toByte
    }
    out
  }

  /** RFC1918 private-range test, the composed predicate the reference
    * builds from the trio (extended_ndt7_downloads.sql:61-67):
    * 10/8, 172.16/12, 192.168/16. Null (not false) on unparseable input,
    * matching the NULL-propagation of the underlying NET.* calls.
    */
  def isPrivateIp(s: UTF8String): java.lang.Boolean = {
    val b = safeIpFromString(s)
    if (b == null || b.length != 4) {
      if (b == null) null else java.lang.Boolean.FALSE
    } else {
      val b0 = b(0) & 0xFF
      val b1 = b(1) & 0xFF
      java.lang.Boolean.valueOf(
        b0 == 10 ||
        (b0 == 172 && b1 >= 16 && b1 <= 31) ||
        (b0 == 192 && b1 == 168))
    }
  }
}

/** NET.SAFE_IP_FROM_STRING(str) → binary | null. */
case class SafeIpFromString(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    NetOps.safeIpFromString(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.NetOps.safeIpFromString($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): SafeIpFromString =
    copy(child = c)
  override def prettyName: String = "safe_ip_from_string"
}

/** NET.IP_TRUNC(binary, prefixLen) → binary. */
case class IpTrunc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(bytes: Any, len: Any): Any =
    NetOps.ipTrunc(bytes.asInstanceOf[Array[Byte]], len.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, l) => {
      s"""
         |${ev.value} = graft.functions.NetOps.ipTrunc($b, $l);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IpTrunc = copy(left = l, right = r)
  override def prettyName: String = "ip_trunc"
}

/** is_private_ip(str): the RFC1918 predicate (NULL on unparseable). */
case class IsPrivateIp(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val r = NetOps.isPrivateIp(input.asInstanceOf[UTF8String])
    if (r == null) null else r.booleanValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("priv")
      s"""
         |java.lang.Boolean $tmp = graft.functions.NetOps.isPrivateIp($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.booleanValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): IsPrivateIp =
    copy(child = c)
  override def prettyName: String = "is_private_ip"
}
