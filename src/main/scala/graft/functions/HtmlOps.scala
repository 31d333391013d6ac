package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML main-content extraction (boilerplate removal) — rule constants
  * and the one-pass JVM kernel.
  *
  * The rules are shared three ways: the kernel below (the engine path),
  * the Column-chain reference formulation
  * (`TextAnalysis.extractMainContentHof` — parity-specced against the
  * kernel), and the generated DuckDB oracle
  * (`TextAnalysis.mainContentSqlCtes`). Every regex stays inside the
  * RE2-safe subset (no backreference/lookaround) so the DuckDB replay
  * is the same automaton; the kernel and Spark's own `regexp_replace`
  * share `java.util.regex`, so kernel↔Column parity is engine-identical
  * by construction.
  *
  * Why a kernel: the extraction is a chain of whole-document regexes
  * plus per-block transforms. As Catalyst HOFs that chain is
  * CodegenFallback — interpreted, no common-subexpression elimination —
  * and the stacked projections (n_blocks / kept / content / n_chars
  * all referencing the same upstream) re-evaluated the full regex
  * chain up to ~8× per row (measured: qQ0 1.76 s → 0.5 s class). The
  * kernel is one struct-valued expression with precompiled patterns;
  * under whole-stage codegen, subexpression elimination computes it
  * exactly once per row.
  */
object HtmlOps {

  /** `<script>...</script>` including contents (dotall). */
  val ScriptRe = "(?is)<script[^>]*>.*?</script>"

  /** `<style>...</style>` including contents. */
  val StyleRe = "(?is)<style[^>]*>.*?</style>"

  /** HTML comments `<!-- ... -->` (dotall). */
  val CommentRe = "(?s)<!--.*?-->"

  /** Block-level tags (open or close): each occurrence is a block
    * boundary for segmentation.
    */
  val BlockTagRe =
    "(?i)</?(?:p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|" +
      "blockquote|pre|section|article|aside|header|footer|nav|form)" +
      "[^>]*>|<br[^>]*>"

  /** Anchor element with plain-text content; group 1 is the anchor
    * text used for link density.
    */
  val AnchorRe = "(?is)<a[^>]*>([^<]*)</a>"

  /** Any remaining tag, stripped to a space inside each block. */
  val TagRe = "<[^>]*>"

  /** Entity subset decoded after tag-stripping, in application order
    * (`&amp;` last so `&amp;lt;` decodes to the literal `&lt;`).
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** jusText-style block gates; the density gate is an integer
    * cross-multiply (`anchor·100 ≤ text·pct`) so the boolean can never
    * straddle an engine FP difference.
    */
  val MinBlockChars = 25
  val MaxLinkDensityPct = 33

  /** Whitespace-run class for the collapse step — an EXPLICIT char
    * class instead of `\s` because the two engines disagree on `\s`:
    * java.util.regex includes U+000B (vertical tab), RE2 does not.
    * `[ \t\n\x0B\f\r]+` parses identically in both, keeping the
    * same-automaton parity claim true for this step too.
    */
  val WsRe = "[ \\t\\n\\x0B\\f\\r]+"

  /** Block separator injected at block-tag boundaries — U+001E. */
  val Sep = "\u001e"

  private val ScriptP = Pattern.compile(ScriptRe)
  private val StyleP = Pattern.compile(StyleRe)
  private val CommentP = Pattern.compile(CommentRe)
  private val BlockP = Pattern.compile(BlockTagRe)
  private val AnchorP = Pattern.compile(AnchorRe)
  private val TagP = Pattern.compile(TagRe)
  private val WsP = Pattern.compile(WsRe)

  private def decodeEntities(s: String): String = {
    var out = s
    var i = 0
    while (i < Entities.length) {
      val (f, t) = Entities(i)
      out = out.replace(f, t)
      i += 1
    }
    out
  }

  // Spark's trim() strips ' ' only (not Java trim's <= 0x20 range) and
  // length() counts code points (not UTF-16 units) — both mirrored
  // exactly so the kernel is bit-compatible with the Column chain.
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  private def cleanBlock(b: String): String =
    trimSpaces(WsP.matcher(
      decodeEntities(TagP.matcher(b).replaceAll(" "))).replaceAll(" "))

  /** One-pass extraction. Returns (n_blocks, n_kept, n_chars, content)
    * as an InternalRow — the struct the Expression below exposes.
    */
  def mainContent(html: UTF8String): InternalRow = {
    val doc = html.toString
    val stripped = BlockP.matcher(
      CommentP.matcher(
        StyleP.matcher(
          ScriptP.matcher(doc).replaceAll(" ")).replaceAll(" "))
        .replaceAll(" ")).replaceAll(Sep)
    val blocks = stripped.split(Sep, -1)
    var nBlocks = 0L
    var nKept = 0L
    val content = new java.lang.StringBuilder(doc.length / 2)
    var i = 0
    while (i < blocks.length) {
      val raw = blocks(i)
      val t = cleanBlock(raw)
      val tLen = cp(t)
      if (tLen > 0) nBlocks += 1
      if (tLen >= MinBlockChars) {
        var aLen = 0L
        val m = AnchorP.matcher(raw)
        while (m.find()) {
          aLen += cp(trimSpaces(
            WsP.matcher(decodeEntities(m.group(1))).replaceAll(" ")))
        }
        if (aLen * 100 <= tLen * MaxLinkDensityPct) {
          if (nKept > 0) content.append(' ')
          content.append(t)
          nKept += 1
        }
      }
      i += 1
    }
    val c = content.toString
    InternalRow(nBlocks, nKept, cp(c), UTF8String.fromString(c))
  }
}

/** html_main_content(string) → struct(n_blocks, n_kept, n_chars,
  * content): the whole extraction as ONE codegen-able expression, so
  * downstream projections referencing several fields trigger
  * whole-stage-codegen subexpression elimination instead of
  * re-running the regex chain per field.
  */
case class HtmlMainContentExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("content", StringType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    HtmlOps.mainContent(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlOps.mainContent($c)")
  override protected def withNewChildInternal(c: Expression): HtmlMainContentExpr =
    copy(child = c)
  override def prettyName: String = "html_main_content"
}
