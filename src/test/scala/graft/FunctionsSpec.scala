package graft

class StringSimSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.functions.{GraftFunctions, StringSimOps}
  import org.apache.spark.unsafe.types.UTF8String

  private def jw(a: String, b: String): Double =
    StringSimOps.jaroWinkler(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("deflateRatio: separates repetitive from high-entropy text, " +
    "deterministic across partitionings, sane edges") {
    import graft.functions.CompressOps
    def ratio(s: String): Double =
      CompressOps.deflateRatio(UTF8String.fromString(s))
    val boiler = "click here to subscribe " * 50
    val rnd = new scala.util.Random(5)
    val entropy = Seq.fill(1200)(
      ('a' + rnd.nextInt(26)).toChar).mkString
    assert(ratio(boiler) < 0.1, s"boilerplate: ${ratio(boiler)}")
    assert(ratio(entropy) > 0.5, s"entropy: ${ratio(entropy)}")
    assert(ratio(boiler) < ratio(entropy) / 3)
    assert(ratio("") == 1.0)
    assert(ratio("a") > 1.0) // framing overhead dominates tiny inputs
    // column path agrees with the kernel and is partitioning-invariant
    GraftFunctions.registerAll(spark)
    val docs = Seq((1L, boiler), (2L, entropy), (3L, "short text"))
      .toDF("id", "t")
    def run(parts: Int) =
      docs.repartition(parts)
        .select(col("id"), GraftFunctions.deflateRatio(col("t")))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val one = run(1)
    assert(one == run(3))
    assert(one(1L) == ratio(boiler) && one(2L) == ratio(entropy))
  }

  test("deflateRatio cross-checked against the independent LZW second " +
    "source: identical ranking on a repetitiveness ladder, analytic " +
    "windows, RFC-1951 expansion bound") {
    import graft.functions.CompressOps
    def dr(s: String) = CompressOps.deflateRatio(UTF8String.fromString(s))
    def lr(s: String) = CompressOps.lzwRatio(UTF8String.fromString(s))
    val rnd = new scala.util.Random(7)
    // a strict repetitiveness ladder, most- to least-compressible
    val ladder = Seq(
      "a" * 4000,                                   // pure run
      "click here to subscribe " * 160,             // short boilerplate
      Seq.fill(400)(Seq("the", "cat", "sat", "on", "a", "mat", "and",
        "slept")(rnd.nextInt(8))).mkString(" "),    // tiny vocabulary
      Seq.fill(4000)(('a' + rnd.nextInt(26)).toChar).mkString, // a-z
      Seq.fill(4000)((33 + rnd.nextInt(94)).toChar).mkString)  // ascii94
    val ds = ladder.map(dr)
    val ls = ladder.map(lr)
    // both sources rank the ladder identically (strictly increasing)
    assert(ds == ds.sorted && ds.distinct == ds, s"deflate ladder: $ds")
    assert(ls == ls.sorted && ls.distinct == ls, s"lzw ladder: $ls")
    // analytic windows: a pure run is near-free under BOTH algorithms;
    // high-entropy ascii is expensive under both
    assert(ds.head < 0.02 && ls.head < 0.1, s"${ds.head} / ${ls.head}")
    assert(ds.last > 0.5 && ls.last > 0.5, s"${ds.last} / ${ls.last}")
    // RFC 1951 worst-case expansion: 5 bytes per 16 KiB block + 6 —
    // ratio can never exceed ~1.01 on a 4k input, whatever the data
    assert(ds.last <= 1.0 + (5.0 * 1 + 6.0) / 4000.0 + 1e-9)
    // edges agree with the deflate conventions
    assert(lr("") == 1.0 && lr("a") > 0.5)
  }

  test("jaroWinkler: textbook known answers, edge conventions, and " +
    "codegen path agreement") {
    // the classic Winkler examples
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("DUANE", "DWAYNE") - 0.84) < 1e-12)
    assert(jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    // DuckDB conventions (oracle compatibility): any empty -> 0
    assert(jw("", "") == 0.0 && jw("abc", "") == 0.0)
    // boost threshold: below 0.7 jaro, no prefix boost applied
    val lowJaro = jw("aXXXXXXX", "aYYYYYYY") // shared prefix, low jaro
    assert(lowJaro < 0.7 || lowJaro == 0.0)
    // Column API runs through codegen and agrees with the direct kernel
    GraftFunctions.registerAll(spark)
    val rows = Seq(("martha", "marhta"), ("duane", "dwayne"),
      ("abc", "abc"), ("abc", "")).toDF("a", "b")
      .select(col("a"), col("b"),
        GraftFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)))
    }
    // null propagation
    val n = Seq((Some("a"), Option.empty[String])).toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()(0)
    assert(n.isNullAt(0))
  }
}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._
import graft.schema.BqSchema

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  // --- SafeOps -----------------------------------------------------------

  test("safeDivide: null on zero or null denominator, ratio otherwise") {
    val df = Seq((10.0, 2.0), (1.0, 0.0), (5.0, Double.NaN))
      .toDF("x", "y")
      .select(SafeOps.safeDivide(col("x"), col("y")).as("r"))
    val rs = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rs(0).contains(5.0))
    assert(rs(1).isEmpty)
  }

  test("safeOffset/safeOrdinal/arrayLast: BigQuery index semantics") {
    val df = Seq(Seq("a", "b", "c")).toDF("arr").select(
      SafeOps.safeOffset(col("arr"), lit(0)).as("off0"),
      SafeOps.safeOffset(col("arr"), lit(9)).as("off9"),
      SafeOps.safeOrdinal(col("arr"), lit(1)).as("ord1"),
      SafeOps.safeOrdinal(col("arr"), lit(9)).as("ord9"),
      SafeOps.arrayLast(col("arr")).as("last"))
    val r = df.collect()(0)
    assert(r.getString(0) == "a") // SAFE_OFFSET is 0-based
    assert(r.isNullAt(1))
    assert(r.getString(2) == "a") // SAFE_ORDINAL is 1-based
    assert(r.isNullAt(3))
    assert(r.getString(4) == "c")
  }

  test("safeOrdinal/arrayLast property over seeded random arrays") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(25)(List.fill(1 + rnd.nextInt(20))(rnd.nextInt()))
    val df = samples.toDF("arr")
      .select(SafeOps.safeOrdinal(col("arr"), lit(1)).as("f"),
        SafeOps.arrayLast(col("arr")).as("l"))
    df.collect().zip(samples).foreach { case (r, xs) =>
      assert(r.getInt(0) == xs.head && r.getInt(1) == xs.last)
    }
  }

  // --- NetOps ------------------------------------------------------------

  private def ip(s: String): Option[Boolean] = {
    val r = Seq(s).toDF("ip")
      .select(GraftFunctions.isPrivateIp(col("ip"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getBoolean(0))
  }

  test("isPrivateIp: RFC1918 ranges and boundaries") {
    assert(ip("10.0.0.1").contains(true))
    assert(ip("10.255.255.255").contains(true))
    assert(ip("11.0.0.1").contains(false))
    assert(ip("172.15.255.255").contains(false))
    assert(ip("172.16.0.0").contains(true))
    assert(ip("172.31.255.255").contains(true))
    assert(ip("172.32.0.0").contains(false))
    assert(ip("192.168.1.1").contains(true))
    assert(ip("192.169.0.1").contains(false))
    assert(ip("8.8.8.8").contains(false))
  }

  test("isPrivateIp: null on garbage, false on IPv6") {
    assert(ip("not-an-ip").isEmpty)
    assert(ip("").isEmpty)
    assert(ip("::1").contains(false)) // parseable v6, not RFC1918 v4
  }

  test("ipTrunc zeroes bits after the prefix") {
    val df = Seq("203.119.45.77").toDF("ip").select(
      GraftFunctions.ipTrunc(
        GraftFunctions.safeIpFromString(col("ip")), lit(12)).as("t"))
    val bytes = df.collect()(0).getAs[Array[Byte]](0)
    assert(bytes.toSeq == Seq(203.toByte, 112.toByte, 0.toByte, 0.toByte))
  }

  test("ipTrunc property: truncated address has no bits past prefix") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val parts = Seq.fill(4)(rnd.nextInt(256))
      val s = parts.mkString(".")
      val parsed = NetOps.safeIpFromString(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val t = NetOps.ipTrunc(parsed, 16)
      assert(t(0) == parsed(0) && t(1) == parsed(1) &&
        t(2) == 0 && t(3) == 0)
    }
  }

  test("ipTrunc handles IPv6 (16-byte) addresses") {
    val parsed = NetOps.safeIpFromString(
      org.apache.spark.unsafe.types.UTF8String.fromString("2001:db8::ff"))
    assert(parsed != null && parsed.length == 16)
    val t = NetOps.ipTrunc(parsed, 32) // /32: keep 2001:0db8
    assert(t.take(4).toSeq ==
      Seq(0x20.toByte, 0x01.toByte, 0x0d.toByte, 0xb8.toByte))
    assert(t.drop(4).forall(_ == 0))
    // out-of-range prefix -> null
    assert(NetOps.ipTrunc(parsed, 129) == null)
  }

  test("stableRound4 fixes the decimal-string divergence case") {
    // 0.57505's nearest double is 0.57504999...; Spark round() says 0.5751
    // (shortest-string), the stable form says 0.575 (binary value) —
    // matching what any C-rounding engine computes.
    val r = Seq(0.57505).toDF("x").select(
      SafeOps.stableRound4(col("x")).as("stable"),
      round(col("x"), 4).as("spark_round")).collect()(0)
    assert(r.getDouble(0) == 0.575 && r.getDouble(1) == 0.5751)
  }

  // --- Kernel/HOF parity --------------------------------------------------

  private val sampleDocs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "a b", "", "one",
    "join filter scan merge sort window group row data value")

  test("shingle_hash_set kernel == HOF formulation") {
    val df = sampleDocs.toDF("text")
    val both = df.select(
      GraftFunctions.shingleHashSet(TextOps.tokens(col("text")), 3).as("k"),
      TextOps.shingleHashSet(col("text"), 3).as("h"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("word_ngrams kernel == shingles(tokens) HOF formulation, " +
    "including space edge cases") {
    // double/leading/trailing spaces make empty split-tokens; the
    // byte-slice kernel must reproduce them byte-for-byte, and
    // multibyte text must never be cut mid code point
    val docs = sampleDocs ++ Seq("a  b c", " x y z", "p q r ",
      "é ü 漢字 test ok", "one two", "a b c d e f")
    for (n <- Seq(2, 3, 4)) {
      val both = docs.toDF("text").select(
        GraftFunctions.wordNgrams(col("text"), n).as("k"),
        TextOps.shingles(TextOps.tokens(col("text")), n).as("h"))
      both.collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n diverged: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("simhash60 kernel == HOF formulation") {
    val df = sampleDocs.filter(_.nonEmpty).toDF("text")
    val both = df.select(
      GraftFunctions.simhash60(
        GraftFunctions.tokenHashes(TextOps.tokens(col("text")))).as("k"),
      TextOps.simhash60(
        transform(TextOps.tokens(col("text")), t => TextOps.hash32(t)))
        .as("h"))
    both.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("minhash_sig kernel == HOF formulation") {
    val df = sampleDocs.filter(_.split(" ").length >= 3).toDF("text")
    val both = df.select(
      GraftFunctions.minhashSig(
        GraftFunctions.shingleHashSet(TextOps.tokens(col("text")), 3), 16)
        .as("k"),
      TextOps.minhashSignature(TextOps.shingleHashSet(col("text"), 3), 16)
        .as("h"))
    both.collect().foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("vec_dot == zip_with/aggregate; stop_hits == filter/size") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      GraftFunctions.vecDot(col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v).as("h")).collect()(0)
    assert(r.getDouble(0) == r.getDouble(1) && r.getDouble(0) == 32.0)

    val s = Seq("the cat and the hat").toDF("text").select(
      GraftFunctions.stopHits(TextOps.tokens(col("text")),
        Seq("the", "and")).as("k")).collect()(0)
    assert(s.getInt(0) == 3)
  }

  test("char_entropy: uniform/constant/empty/null cases, codegen'd") {
    val df = Seq(("abab"), ("aaaa"), ("")).toDF("text")
      .select(GraftFunctions.charEntropy(col("text")).as("h"))
    val r = df.collect().map(_.getDouble(0))
    assert(r(0) == math.log(2.0)) // two equiprobable symbols -> ln 2
    assert(r(1) == 0.0) // constant string carries no information
    assert(r(2) == 0.0) // empty defined as 0
    val n = Seq(Option.empty[String]).toDF("text")
      .select(GraftFunctions.charEntropy(col("text"))).collect()(0)
    assert(n.isNullAt(0)) // null-safe
    // code-point semantics: a surrogate-pair emoji is ONE symbol, so
    // "ab🙂🙂" is {a:1, b:1, emoji:2} over n=4
    val u = Seq("ab🙂🙂").toDF("text")
      .select(GraftFunctions.charEntropy(col("text"))).collect()(0)
      .getDouble(0)
    val expected = math.log(4.0) -
      (1 * math.log(1.0) + 1 * math.log(1.0) + 2 * math.log(2.0)) / 4.0
    assert(u == expected)
  }

  test("lexical_stats: one-pass [n_tokens, n_types, n_hapax] kernel") {
    val df = Seq(Seq("a", "a", "b", "c"), Seq("x"), Seq.empty[String])
      .toDF("toks")
      .select(GraftFunctions.lexicalStats(col("toks")).as("st"))
    val r = df.collect().map(_.getSeq[Long](0))
    assert(r(0) == Seq(4L, 3L, 2L)) // hapax {b, c}
    assert(r(1) == Seq(1L, 1L, 1L))
    assert(r(2) == Seq(0L, 0L, 0L))
    // null array is null-safe; null ELEMENTS count as one shared type
    val n = Seq(Option.empty[Seq[String]]).toDF("toks")
      .select(GraftFunctions.lexicalStats(col("toks"))).collect()(0)
    assert(n.isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT lexical_stats(array('a', CAST(NULL AS STRING), 'a')) AS s")
      .collect()(0).getSeq[Long](0)
    assert(withNullElem == Seq(3L, 2L, 1L))
  }

  test("registered expressions are callable from SQL text") {
    val r = spark.sql(
      "SELECT is_private_ip('192.168.0.1') AS p, " +
        "vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "stop_hits(array('the', 'cat', 'the'), 'the,a') AS h").collect()(0)
    assert(r.getBoolean(0) && r.getDouble(1) == 11.0 && r.getInt(2) == 2)
  }

  test("hash32 is the md5-prefix32 value (cross-engine contract)") {
    // printf '%s' hello | md5: 5d41402abc4b2a76... -> 0x5d41402a
    val r = Seq("hello").toDF("s")
      .select(TextOps.hash32(col("s"))).collect()(0).getLong(0)
    assert(r == 0x5d41402aL)
  }

  test("sortedIntersectSize == size(array_intersect) on random sorted sets") {
    GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MaxValue))) ++
      (1 to 40).map { _ =>
        def s() = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
          .distinct.sorted
        (s(), s())
      }
    val df = cases.toDF("a", "b").select(
      GraftFunctions.sortedIntersectSize(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  // --- BqSchema -----------------------------------------------------------

  test("BqSchema parses nested/repeated/required and round-trips") {
    val json =
      """[
        |{"name":"id","type":"STRING","mode":"REQUIRED"},
        |{"name":"date","type":"DATE"},
        |{"name":"snap","type":"RECORD","mode":"REPEATED","fields":[
        |  {"name":"ts","type":"TIMESTAMP"},
        |  {"name":"value","type":"FLOAT","description":"counter"}]},
        |{"name":"count","type":"INTEGER"}
        |]""".stripMargin
    val st = BqSchema.parse(json)
    assert(st.fieldNames.toSeq == Seq("id", "date", "snap", "count"))
    assert(!st("id").nullable)
    assert(st("snap").dataType.isInstanceOf[ArrayType])
    val inner = st("snap").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(inner("ts").dataType == TimestampType)
    assert(inner("value").metadata.getString("description") == "counter")
    assert(st("count").dataType == LongType)
    // round-trip through the JSON renderer is structurally stable
    val st2 = BqSchema.parse(BqSchema.toJson(st))
    assert(st2.map(f => (f.name, f.dataType, f.nullable)) ==
      st.map(f => (f.name, f.dataType, f.nullable)))
  }

  test("BqSchema golden: the real reference table schemas parse with " +
    "full structure and round-trip") {
    def totalFields(st: StructType): Int = st.fields.map { f =>
      1 + (f.dataType match {
        case s: StructType => totalFields(s)
        case ArrayType(s: StructType, _) => totalFields(s)
        case _ => 0
      })
    }.sum
    def depth(st: StructType): Int = 1 + st.fields.map(_.dataType match {
      case s: StructType => depth(s)
      case ArrayType(s: StructType, _) => depth(s)
      case _ => 0
    }).max

    // ndt.json: the 322-line web100 schema — 9 top-level fields, 296
    // total (web100_log_entry.snap alone holds the ~250 kernel counters),
    // 4 levels deep.
    val ndt = BqSchema.parseFile("/root/reference/schema/ndt.json")
    assert(ndt.fields.length == 9, s"ndt top-level: ${ndt.fieldNames.toSeq}")
    assert(totalFields(ndt) == 296, s"ndt total fields: ${totalFields(ndt)}")
    assert(depth(ndt) == 4)
    val snap = ndt("web100_log_entry").dataType.asInstanceOf[StructType]
    assert(snap.fieldNames.contains("snap"))
    assert(ndt("anomalies").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("no_meta", "snaplog_error", "num_snaps",
        "blacklist_flags"))

    // switch.json: REPEATED RECORD time series (sample array).
    val sw = BqSchema.parseFile("/root/reference/schema/switch.json")
    assert(sw.fields.length == 9)
    val sample = sw("sample")
    assert(sample.dataType.isInstanceOf[ArrayType] &&
      sample.dataType.asInstanceOf[ArrayType]
        .elementType.isInstanceOf[StructType],
      s"sample should be REPEATED RECORD: ${sample.dataType}")

    // round-trip both goldens through the renderer
    for (st <- Seq(ndt, sw)) {
      val rt = BqSchema.parse(BqSchema.toJson(st))
      assert(rt.map(f => (f.name, f.dataType, f.nullable)) ==
        st.map(f => (f.name, f.dataType, f.nullable)))
    }
  }

  test("GraftExtensions injects the kernel surface: a fresh session " +
    "resolves graft functions in SQL with no registerAll call") {
    // newSession() builds fresh session state from the same extensions;
    // GraftFunctions.registerAll has never run on it (per-session keying)
    val s2 = spark.newSession()
    val d = s2.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 11.0)
    val ip = s2.sql("SELECT is_private_ip('10.1.2.3') AS p")
      .collect()(0).getBoolean(0)
    assert(ip)
  }

  test("cuts_bucket: upper-bound binary search equals the HOF " +
    "size(filter(cuts, c <= v)) it replaced in the quantile rescue, " +
    "on random sorted cut arrays and boundary values") {
    GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(18)
    for (trial <- 1 to 5) {
      val cuts = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong() % 1000L)
        .distinct.sorted
      // values at, between, below, and above every cut
      val vals = (cuts ++ cuts.map(_ - 1) ++ cuts.map(_ + 1) ++
        Seq(Long.MinValue + 1, Long.MaxValue)).distinct
      val got = vals.toDF("v").select(col("v"),
        call_function("cuts_bucket", col("v"), typedlit(cuts)).as("b"),
        size(filter(typedlit(cuts), c => c <= col("v")))
          .cast("long").as("ref"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"trial $trial v=${r.getLong(0)}: " +
            s"got ${r.getLong(1)} want ${r.getLong(2)}")
      }
    }
    // null value -> null bucket. This is the ONE input where the two
    // forms diverge (standard expression null-in/null-out vs the HOF
    // lambda null-dropping every element to 0) — pinned here so the
    // divergence is a documented choice, not a surprise; planBlocks'
    // vids are non-null by precondition
    val nulls = spark.sql(
      "SELECT cuts_bucket(CAST(NULL AS BIGINT), array(1L, 2L)) AS b")
      .collect()
    assert(nulls(0).isNullAt(0))
    // empty cuts -> bucket 0 for everything
    assert(spark.sql("SELECT cuts_bucket(7L, array()) AS b")
      .collect()(0).getLong(0) == 0L)
    // INT-typed inputs coerce to the declared long shapes (review r18):
    // the natural SQL literal array(1, 2) is array<int>; without the
    // declared input types codegen read 8-byte slots over 4-byte-packed
    // elements — garbage buckets with no error
    val ints = spark.sql(
      "SELECT cuts_bucket(2, array(1, 2, 5)) AS b, " +
        "cuts_bucket(0, array(1, 2, 5)) AS lo, " +
        "cuts_bucket(9, array(1, 2, 5)) AS hi").collect()(0)
    assert(ints.getLong(0) == 2L && ints.getLong(1) == 0L &&
      ints.getLong(2) == 3L, ints.toString)
  }

  test("packed-array expressions coerce INT-typed SQL literals to their " +
    "declared long/double element types (review r18): the ArrayData " +
    "readers would otherwise return garbage, not an error") {
    GraftFunctions.registerAll(spark)
    // each function: the natural int-literal call equals the explicitly
    // long/double-typed call (which was always correct)
    val r = spark.sql(
      "SELECT vec_dot(array(1, 2, 3), array(4, 5, 6)) AS dot, " +
        "sorted_intersect_size(array(1, 2, 5), array(2, 5, 9)) AS isz, " +
        "simhash60(array(1, 2)) = simhash60(array(1L, 2L)) AS sh, " +
        "minhash_sig(array(1, 2), 4) = minhash_sig(array(1L, 2L), 4) " +
        "AS mh, " +
        "hilbert_xy2d(3, 5, 4) = hilbert_xy2d(3L, 5L, 4) AS hb, " +
        "argmin_cell(array(1, 0), 1.0D, array(7L), array(1.0D, 0.0D), " +
        "array(1.0D)) AS cell").collect()(0)
    assert(r.getDouble(0) == 32.0, s"vec_dot ${r.getDouble(0)}")
    assert(r.getLong(1) == 2L, s"sorted_intersect_size ${r.getLong(1)}")
    assert(r.getBoolean(2), "simhash60 int != long form")
    assert(r.getBoolean(3), "minhash_sig int != long form")
    assert(r.getBoolean(4), "hilbert_xy2d int != long form")
    assert(r.getLong(5) == 7L, s"argmin_cell ${r.getLong(5)}")
  }
}
