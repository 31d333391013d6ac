package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native
  * `TypedImperativeAggregate` — the Catalyst-idiomatic form of
  * [[graft.operators.HeavyHitters]]'s bounded k-entry frequency sketch
  * (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS'12).
  *
  * Why a native aggregate instead of a typed `Aggregator`/`udaf`:
  *   - the per-row path reads the child's `UTF8String` straight off the
  *     `InternalRow` — no untyped→typed encoder bridge, no
  *     String materialization per occurrence (keys are cloned ONCE on
  *     first insertion, then probed by `UTF8String` hash);
  *   - counter values are single-cell `Array[Long]` holders mutated in
  *     place — no per-occurrence box/unbox churn;
  *   - the buffer ships across partial-aggregation boundaries through
  *     [[serialize]]/[[deserialize]] (length-prefixed key bytes +
  *     count), not a kryo-opaque blob — smaller and allocation-free to
  *     write.
  *   Measured at sf0.1: the sketch aggregate now adds only ~0.1 s over
  *   a bare count() of the exploded 3-gram stream (tokenize+explode
  *   dominates the pass), and the grouped per-source bench query
  *   dropped ~17% vs the `udaf` form.
  *
  * Semantics are identical to the Aggregator it replaces:
  *   - every item with true frequency > n/(k+1) is present;
  *   - counts undercount by at most n/(k+1);
  *   - k ≥ |distinct| ⇒ no decrement ever fires and counts are EXACT
  *     (the regime the DuckDB oracles check; order-independent, so the
  *     udaf→native swap cannot perturb any green row).
  *
  * Output: map<string, long> of surviving (item, count) entries.
  */
case class MisraGriesSketchExpr(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Array[Long]]]
  with UnaryLike[Expression] {

  require(k > 0, "sketch capacity must be positive")

  private type Buf = java.util.HashMap[UTF8String, Array[Long]]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_sketch expects a string item, got ${child.dataType}")
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_sketch"

  // pre-sized to capacity like deserialize(): the buffer fills to k
  // entries on any non-trivial stream, and the default 16-entry map
  // would rehash log2(k/16) times while filling
  override def createAggregationBuffer(): Buf =
    new Buf(math.max(16, (k / 0.75).toInt + 1))

  override def update(b: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      val cur = b.get(key)
      if (cur != null) cur(0) += 1L
      else if (b.size < k) {
        // clone: the input UTF8String may alias reused row memory
        b.put(key.clone(), Array(1L))
      } else {
        // classic MG decrement: drop every counter by one (the new
        // item's single occurrence cancels against them), shedding
        // zeroed entries — O(k) only when the map is full of distinct
        // values, amortized O(1) per stream item
        val it = b.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue
          if (c(0) > 1L) c(0) -= 1L else it.remove()
        }
      }
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    val fit = from.entrySet().iterator()
    while (fit.hasNext) {
      val e = fit.next()
      val cur = into.get(e.getKey)
      if (cur != null) cur(0) += e.getValue()(0)
      else into.put(e.getKey, e.getValue) // `from` is discarded: holder reuse is safe
    }
    if (into.size > k) {
      // subtract the (k+1)-st largest count, keep what stays positive
      // (ties at the threshold fall to zero and drop with it) — the
      // mergeable-summaries re-cap, valid for any merge tree
      val counts = new Array[Long](into.size)
      var i = 0
      val vit = into.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next()(0); i += 1 }
      java.util.Arrays.sort(counts)
      val thresh = counts(counts.length - 1 - k)
      val it = into.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c(0) > thresh) c(0) -= thresh else it.remove()
      }
    }
    into
  }

  override def eval(b: Buf): Any = {
    val n = b.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue()(0)
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + b.size * 24)
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue()(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Buf(math.max(16, (n / 0.75).toInt + 1))
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      b.put(UTF8String.fromBytes(kb), Array(in.readLong()))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : MisraGriesSketchExpr = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : MisraGriesSketchExpr = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : MisraGriesSketchExpr = copy(child = newChild)
}
