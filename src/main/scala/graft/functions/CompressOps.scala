package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal — the classic boilerplate screen
  * (highly compressible text = templated/repetitive content; used in
  * the C4/Gopher-lineage pipelines alongside the rule bundles in
  * [[graft.operators.TextAnalysis]]). deflate(level 9) is bundled with
  * every JVM, deterministic for a fixed level/strategy, and fast
  * enough to run at scan speed inside codegen.
  *
  * No SQL oracle: the oracle engine has no zlib surface, so this
  * kernel is SPEC-LOCKED (separation of repetitive vs high-entropy
  * text, byte-exact determinism, edge cases) rather than
  * oracle-checked — the same documented convention as the BPE trainer.
  */
object CompressOps {

  /** deflate(9) output bytes over input bytes; empty input → 1.0.
    * Ratios well under 1 mean repetitive content; incompressible text
    * sits slightly above 1 (deflate framing overhead).
    */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(9)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length
    } finally d.end()
  }

  /** INDEPENDENT second source for the compressibility signal: a
    * self-contained LZW (variable-width codes, dictionary grown per
    * emitted code) sharing no code or algorithm family with zlib's
    * LZ77+Huffman. It exists to CROSS-CHECK [[deflateRatio]] — the one
    * spec-locked kernel with no SQL oracle: the two implementations
    * can't agree byte-for-byte (different algorithms), but on any
    * repetitiveness ladder their ratios must RANK identically and land
    * in the same analytic windows (FunctionsSpec), so a silent deflate
    * regression (level/strategy drift, a broken loop) can't hide
    * behind the spec-lock. Not a production screen — deflate is the
    * codegen'd kernel; this is the auditor.
    *
    * Ratio = emitted code bits / (8 × input bytes); empty → 1.0.
    */
  def lzwRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    // dictionary: (prefixCode << 8 | byte) -> code; codes 0..255 are
    // the byte alphabet, 256 up are learned sequences
    val dict = new java.util.HashMap[Long, Integer]()
    var next = 256
    var bits = 0L
    def width(n: Int): Int = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(n - 1, 1))
    var cur = raw(0) & 0xff
    var i = 1
    while (i < raw.length) {
      val b = raw(i) & 0xff
      val key = (cur.toLong << 8) | b
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        bits += width(next) // emit cur at the current code width
        dict.put(key, Integer.valueOf(next))
        next += 1
        cur = b
      }
      i += 1
    }
    bits += width(next) // final pending sequence
    (bits.toDouble / 8.0) / raw.length
  }
}

/** deflate_ratio(string) → double. */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    CompressOps.deflateRatio(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressOps.deflateRatio($c)")
  override protected def withNewChildInternal(c: Expression): DeflateRatioExpr =
    copy(child = c)
  override def prettyName: String = "deflate_ratio"
}
