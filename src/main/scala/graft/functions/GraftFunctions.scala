package graft.functions


import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Session-level registration of graft's native expressions, exposing them
  * to both SQL text and the Column API (via `call_function`, the public
  * route to a registered expression — avoids depending on non-public
  * Column-construction internals).
  */
object GraftFunctions {

  // Sessions already registered on. Keyed weakly so a dropped session
  // doesn't leak; checking our own record (rather than
  // FunctionRegistry.functionExists) means a future Spark builtin that
  // happens to collide with a graft name can't silently shadow ours —
  // first registerAll on a session always installs graft's builders.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** The full (name → expression builder) surface, shared by
    * [[registerAll]] (manual, per-session) and
    * `graft.plans.GraftExtensions` (`injectFunction`, the idiomatic
    * `spark.sql.extensions` route — sessions built with the extension
    * need no registration call at all).
    */
  private[graft] val builders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "safe_ip_from_string" -> (es => SafeIpFromString(es.head)),
    "ip_trunc" -> (es => IpTrunc(es(0), es(1))),
    "is_private_ip" -> (es => IsPrivateIp(es.head)),
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "sorted_intersect_size" -> (es => SortedIntersectSizeExpr(es(0), es(1))),
    "simhash60" -> (es => SimHash60Expr(es.head)),
    "cuts_bucket" -> (es => CutsBucketExpr(es(0), es(1))),
    "minhash_sig" -> (es => MinHashSigExpr(es(0),
      es(1).eval().asInstanceOf[Int])),
    "shingle_hash_set" -> (es => ShingleHashSetExpr(es(0),
      es(1).eval().asInstanceOf[Int])),
    "token_hashes" -> (es => TokenHashesExpr(es.head)),
    "word_ngrams" -> (es => WordNgramsExpr(es(0),
      es(1).eval().asInstanceOf[Int])),
    "html_main_content" -> (es => HtmlMainContentExpr(es.head)),
    "jaro_winkler" -> (es => JaroWinklerExpr(es(0), es(1))),
    "deflate_ratio" -> (es => DeflateRatioExpr(es.head)),
    "nfc_normalize" -> (es => NfcNormalizeExpr(es.head)),
    "hilbert_xy2d" -> (es => HilbertExpr(es(0), es(1),
      es(2).eval().asInstanceOf[Int])),
    "winnow_select" -> (es => WinnowSelectExpr(es(0),
      es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])),
    "char_entropy" -> (es => CharEntropyExpr(es.head)),
    "mg_sketch" -> (es => MisraGriesSketchExpr(es(0),
      es(1).eval().asInstanceOf[Int])),
    "lexical_stats" -> (es => LexicalStatsExpr(es.head)),
    "merge_pair" -> (es => MergePairExpr(es(0),
      es(1).eval().toString, es(2).eval().toString)),
    "stop_hits" -> (es => StopHitsExpr(es(0),
      es(1).eval().toString.split(',').toSeq)),
    "vocab_encode" -> (es => VocabEncodeExpr(es(0),
      splitVocab(es(1).eval().toString))),
    "argmin_cell" -> (es => {
      import org.apache.spark.sql.catalyst.util.ArrayData
      ArgminCellExpr(es(0), es(1), Codebook.fromFlat(
        es(2).eval().asInstanceOf[ArrayData].toLongArray(),
        es(3).eval().asInstanceOf[ArrayData].toDoubleArray(),
        es(4).eval().asInstanceOf[ArrayData].toDoubleArray()))
    }))

  /** Idempotently register all graft expressions on the session — once
    * per session, so the per-name "function replaced" warnings from
    * createOrReplaceTempFunction can't spam stderr from every operator
    * entry point (that spam once pushed the bench's one-line JSON out of
    * a log tail).
    */
  def registerAll(spark: SparkSession): Unit = {
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) != null) return
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
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
  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("sorted_intersect_size", a, b)
  def simhash60(hashes: Column): Column =
    call_function("simhash60", hashes)
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("jaro_winkler", a, b)
  def deflateRatio(text: Column): Column =
    call_function("deflate_ratio", text)
  def nfcNormalize(text: Column): Column =
    call_function("nfc_normalize", text)
  def minhashSig(hashes: Column, numHashes: Int): Column =
    call_function("minhash_sig", hashes,
      org.apache.spark.sql.functions.lit(numHashes))
  def shingleHashSet(tokens: Column, n: Int): Column =
    call_function("shingle_hash_set", tokens,
      org.apache.spark.sql.functions.lit(n))
  def tokenHashes(tokens: Column): Column =
    call_function("token_hashes", tokens)
  def wordNgrams(text: Column, n: Int): Column =
    call_function("word_ngrams", text,
      org.apache.spark.sql.functions.lit(n))
  def htmlMainContent(html: Column): Column =
    call_function("html_main_content", html)
  def charEntropy(text: Column): Column =
    call_function("char_entropy", text)
  def mgSketch(item: Column, k: Int): Column =
    call_function("mg_sketch", item,
      org.apache.spark.sql.functions.lit(k))
  def lexicalStats(tokens: Column): Column =
    call_function("lexical_stats", tokens)
  def mergePair(symbols: Column, a: String, b: String): Column =
    call_function("merge_pair", symbols,
      org.apache.spark.sql.functions.lit(a),
      org.apache.spark.sql.functions.lit(b))
  def stopHits(tokens: Column, words: Seq[String]): Column =
    call_function("stop_hits", tokens,
      org.apache.spark.sql.functions.lit(words.mkString(",")))

  /** Vocab transport separator: U+0001 cannot appear in whitespace-split
    * tokens of ordinary text (unlike a comma, which corpus-derived vocabs
    * WILL eventually contain — "hello," is one whitespace token); a token
    * containing it is rejected loudly rather than silently shifting every
    * id after it.
    */
  private val VocabSep = '\u0001'
  private def splitVocab(s: String): Seq[String] =
    if (s.isEmpty) Seq.empty
    else s.split(VocabSep).toSeq

  /** Token-id encoding against `vocab` (id = index+1, OOV → 0). */
  def vocabEncode(tokens: Column, vocab: Seq[String]): Column = {
    require(vocab.forall(t => !t.contains(VocabSep)),
      "vocab tokens must not contain the \\u0001 transport separator")
    call_function("vocab_encode", tokens,
      org.apache.spark.sql.functions.lit(vocab.mkString(VocabSep.toString)))
  }

  /** Nearest-centroid cell id for `v` (with precomputed norm `nrm`) over a
    * small driver-built codebook; the codebook rides in as flattened array
    * literals (cids, concat'd vectors, squared norms) and is rebuilt once
    * at function resolution.
    */
  def argminCell(v: Column, nrm: Column, cids: Array[Long],
      cvs: Array[Array[Double]], cn2s: Array[Double]): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("argmin_cell", v, nrm,
      lit(cids), lit(cvs.flatten), lit(cn2s))
  }
}
