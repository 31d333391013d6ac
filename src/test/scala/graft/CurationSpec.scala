package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.{Bm25, Dedup, Sampling, TextAnalysis}

/** Round-5 curation operators: URL normalization, SemDeDup, the Gopher
  * rule bundle, and the mixture planner.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def normUrl(raw: String): String =
    Seq(raw).toDF("u")
      .select(TextOps.normalizeUrl(col("u")).as("n"))
      .head().getString(0)

  test("normalizeUrl: case, default port, fragment, tracking, slash") {
    // every transformation at once
    assert(normUrl("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&id=3#f")
      == "https://www.example.com/A/b?id=3")
    // path/query case preserved, host lowered
    assert(normUrl("http://HOST.com/CaseSensitive?Q=V")
      == "http://host.com/CaseSensitive?Q=V")
    // non-default port kept
    assert(normUrl("http://host.com:8080/p/") == "http://host.com:8080/p")
    // http default port
    assert(normUrl("HTTP://host.com:80/p") == "http://host.com/p")
    // bare host with trailing slash
    assert(normUrl("https://host.com/") == "https://host.com")
    // tracking param in the middle keeps its neighbors
    assert(normUrl("https://h.co/p?a=1&utm_medium=m&b=2")
      == "https://h.co/p?a=1&b=2")
    // only tracking params -> query dropped entirely
    assert(normUrl("https://h.co/p?gclid=abc") == "https://h.co/p")
    // no-path URL: query must not be lowercased or eaten by host capture
    assert(normUrl("HTTPS://Host.co?ID=Xy") == "https://host.co?ID=Xy")
  }

  test("urlDedup groups by canonical form, keeps the min id") {
    val docs = Seq(
      (10L, "HTTP://A.com:80/x/"),
      (11L, "http://a.com/x?utm_source=s"),
      (12L, "http://a.com/x#top"),
      (13L, "http://b.com/y")).toDF("doc_id", "url")
    val r = Dedup.urlDedup(docs, "doc_id", "url")
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[String]("url_norm")).take(3).distinct.length == 1)
    assert(r.map(_.getAs[Long]("canonical")).toSeq ==
      Seq(10L, 10L, 10L, 13L))
    assert(r.map(_.getAs[Boolean]("keep")).toSeq ==
      Seq(true, false, false, true))
    assert(r.head.getAs[Long]("n_dupes") == 3L)
  }

  test("semDedup contracts a transitive duplicate chain to one doc") {
    // va ~ vb (cosine 1), vb ~ vc (cosine 1 after scaling) — all three
    // land in one component even though the pair list never scores a~c
    // directly if bucketing split them; vd is orthogonal-ish noise.
    val va = Array.tabulate(64)(i => (i % 7).toFloat + 1f)
    val vb = va.clone()
    val vc = va.map(_ * 2f) // same direction, cosine 1
    val vd = Array.tabulate(64)(i => if (i % 2 == 0) 1f else -3f)
    val df = Seq((1L, va), (2L, vb), (3L, vc), (4L, vd))
      .toDF("vec_id", "embedding")
    val r = Dedup.semDedup(df, "vec_id", "embedding",
      planes = 2, threshold = 0.95)
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("canonical")).toSeq == Seq(1L, 1L, 1L, 4L))
    assert(r.map(_.getAs[Boolean]("keep")).toSeq ==
      Seq(true, false, false, true))
  }

  test("gopherRules gates each published threshold") {
    val longGood = (Seq("the", "of") ++ Seq.fill(60)("word")).mkString(" ")
    val tooShort = "the of just a few words here"
    val noStops = Seq.fill(60)("zzz").mkString(" ")
    val longWords = (Seq("the", "of") ++
      Seq.fill(60)("supercalifragilistic")).mkString(" ")
    val df = Seq(
      (1L, longGood), (2L, tooShort), (3L, noStops), (4L, longWords))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Boolean]("keep")).toSeq ==
      Seq(true, false, false, false))
    assert(r(0).getAs[Long]("stop_hits") == 2L)
    assert(r(1).getAs[Long]("n_words") < 50)
    assert(r(2).getAs[Long]("stop_hits") == 0L)
    assert(r(3).getAs[Double]("mean_word_len") > 10.0)
    // all-alpha corpus: frac_alpha 1.0, no symbols
    assert(r.forall(_.getAs[Double]("frac_alpha") == 1.0))
    assert(r.forall(_.getAs[Double]("symbol_ratio") == 0.0))
  }

  test("Bm25.topK: tf monotone, non-matches absent, ranks contiguous") {
    val docs = Seq(
      (1L, "spark spark spark filler filler filler"),
      (2L, "spark filler filler filler filler filler"),
      (3L, "join filler filler filler filler filler"),
      (4L, "unrelated words only nothing here at all"))
      .toDF("doc_id", "text")
    val r = Bm25.topK(docs, "doc_id", "text",
      Seq("q" -> Seq("spark", "join")), k = 10)
      .orderBy("rank").collect()
    // doc 4 matches nothing
    assert(r.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L))
    assert(r.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    // same length, tf 3 beats tf 1 of the same term
    val byDoc = r.map(x => x.getAs[Long]("doc_id") ->
      x.getAs[Double]("score")).toMap
    assert(byDoc(1L) > byDoc(2L))
    // rarer term (join: df 1 vs spark: df 2) outscores at equal tf/len
    assert(byDoc(3L) > byDoc(2L))
  }

  test("Bm25.topK two-phase top-k equals the naive total order") {
    // 300 docs, skewed term mix — enough doc_ids to spread the mod-64
    // blocks; the blocked+global rank must equal sorting all scores.
    val docs = (1L to 300L).map { i =>
      val reps = (i % 7).toInt
      val body = Seq.fill(reps)("alpha") ++
        Seq.fill((i % 3).toInt)("beta") ++
        Seq.fill(5 + (i % 11).toInt)("pad")
      (i, body.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Bm25.topK(docs, "doc_id", "text",
      Seq("mix" -> Seq("alpha", "beta")), k = 7)
      .orderBy("rank")
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    // naive reference: k large enough that no block pruning happens,
    // then truncate the same total order driver-side
    val full = Bm25.topK(docs, "doc_id", "text",
      Seq("mix" -> Seq("alpha", "beta")), k = 1000)
      .select("doc_id", "score").as[(Long, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.take(7).toSeq
    assert(got == full)
  }

  test("mixturePlan: shares sum to 1, budget conserved, T flattens") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).zipWithIndex
      .map { case (src, i) => (i.toLong, src, "a b c d e") }
      .toDF("doc_id", "source", "text")
    val plan = Sampling.mixturePlan(df, "source", "text",
      temperature = 0.5, budgetTokens = 1000L)
      .orderBy("stratum").collect()
    val shares = plan.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-3)
    val targets = plan.map(_.getAs[Long]("target_toks"))
    assert(math.abs(targets.sum - 1000L) <= plan.length) // rounding slack
    // T=0.5 flattens: big source's share under its 0.9 mass share
    val big = plan.find(_.getAs[String]("stratum") == "big").get
    val small = plan.find(_.getAs[String]("stratum") == "small").get
    assert(big.getAs[Double]("share") < 0.9)
    assert(small.getAs[Double]("share") > 0.1)
    // rate·toks ≈ target; epochs = ceil(rate)
    plan.foreach { r =>
      val rate = r.getAs[Double]("rate")
      val epochs = r.getAs[Long]("epochs")
      assert(epochs == math.ceil(
        r.getAs[Long]("target_toks").toDouble /
          r.getAs[Long]("toks")).toLong)
      assert(rate >= 0.0 && epochs >= (if (rate > 0) 1L else 0L))
    }
    // T=1 is proportional
    val prop = Sampling.mixturePlan(df, "source", "text",
      temperature = 1.0, budgetTokens = 1000L)
      .orderBy("stratum").collect()
    assert(prop.find(_.getAs[String]("stratum") == "big").get
      .getAs[Double]("share") == 0.9)
  }

  test("extractMainContent: boilerplate dropped, body kept, entities " +
      "decoded, script contents (with '<') never leak") {
    val body = "This is the real article body with enough characters " +
      "to clear the minimum block length gate."
    val html =
      "<html><head><title>t</title>" +
        "<style>p { margin: 0; }</style>" +
        "<script>if (a < b) { alert(\"boilerplate\"); }</script>" +
        "</head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/x\">Docs</a></nav>" +
        "<p>" + body + "</p>" +
        "<p>Tom &amp; Jerry say &quot;hi&quot; &#39;loudly&#39; - a " +
        "second kept paragraph with entities.</p>" +
        "<div><a href=\"/buy\">A long advertisement link whose anchor " +
        "text alone exceeds the length gate easily</a></div>" +
        "<!-- hidden comment boilerplate -->" +
        "<footer><a href=\"/tos\">Terms</a> (c) corp</footer>" +
        "</body></html>"
    val out = TextAnalysis.extractMainContent(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .head()
    val content = out.getAs[String]("content")
    // body and the entity paragraph kept, decoded
    assert(content.startsWith(body))
    assert(content.contains("Tom & Jerry say \"hi\" 'loudly'"))
    // nav, ad (dropped by link density despite length), footer,
    // comment, script and style text all gone
    for (bad <- Seq("Home", "Docs", "advertisement", "Terms", "corp",
        "hidden comment", "alert", "margin"))
      assert(!content.contains(bad), s"boilerplate leaked: $bad")
    assert(out.getAs[Long]("n_kept") == 2L)
    assert(out.getAs[Long]("n_blocks") > 2L)
    assert(out.getAs[Long]("n_chars") == content.length.toLong)

    // an empty/garbage page yields zero kept blocks, not an error
    val junk = TextAnalysis.extractMainContent(
      Seq((2L, "<p>short</p><div><a href='/x'>tiny</a></div>"))
        .toDF("doc_id", "html"), "doc_id", "html").head()
    assert(junk.getAs[Long]("n_kept") == 0L)
    assert(junk.getAs[String]("content") == "")
  }

  test("c4LineFilters: terminal-punctuation/min-words/javascript line " +
    "rules and the brace/lorem/sentence page gates") {
    val good = "This is a good long sentence that ends properly.\n" +
      "no terminal punctuation on this line\n" + // dropped: no . ! ? "
      "ok.\n" +                                  // dropped: < 3 words
      "Please enable JavaScript in your browser.\n" + // dropped
      "Another valid line with enough words!\n" +
      "A third full sentence right here?\n" +
      "Fourth sentence lands safely here.\n" +
      "\"Fifth sentence closes the page.\""
    val rows = TextAnalysis.c4LineFilters(Seq(
      (1L, good),
      (2L, good + "\nlorem ipsum dolor sit amet."),
      (3L, good + "\nvar conf = { \"a\": 1 };"),
      (4L, "One good sentence here.\nAnother fine one lands!"))
      .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    val d1 = rows(0)
    assert(d1.getAs[Long]("n_lines") == 8L)
    assert(d1.getAs[Long]("n_kept_lines") == 5L)
    assert(d1.getAs[Long]("n_sentences") == 5L)
    assert(d1.getAs[Boolean]("keep_doc"))
    val clean = d1.getAs[String]("clean_text")
    assert(!clean.contains("JavaScript") && !clean.contains("ok.") &&
      !clean.contains("no terminal"))
    // lorem-ipsum and code-brace pages are dropped whole; a clean but
    // short page fails the 5-sentence gate
    assert(!rows(1).getAs[Boolean]("keep_doc"))
    assert(!rows(2).getAs[Boolean]("keep_doc"))
    assert(!rows(3).getAs[Boolean]("keep_doc") &&
      rows(3).getAs[Long]("n_kept_lines") == 2L)
  }

  test("html_main_content kernel == Column-HOF formulation on messy " +
    "markup") {
    val pages = Seq(
      "<html><body><p>plain paragraph long enough to pass the gate " +
        "today</p></body></html>",
      "<p>Tom &amp; Jerry &quot;quoted&quot; &#39;s &nbsp;entity " +
        "soup paragraph</p><nav><a href='/'>Home</a></nav>",
      "<script>a<b</script><style>x{}</style><!--c--><div>kept block " +
        "with sufficient characters present</div>",
      "<ul><li><a href='/1'>one</a></li><li>list item that is long " +
        "enough to be treated as content</li></ul>",
      "<p>unicode éü 漢字 block padded out to the " +
        "minimum content length gate</p>",
      "<p>  spaced   out   content   with   runs   of   whitespace " +
        "  everywhere  </p>",
      "no markup at all just a bare text fragment of decent length",
      "", "<p></p><div></div>",
      "<div><a href='/x'>anchor one text</a> plus surrounding prose " +
        "to dilute the link density below threshold</div>")
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "html")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSeq
    assert(
      rows(TextAnalysis.extractMainContent(pages, "doc_id", "html")) ==
        rows(TextAnalysis.extractMainContentHof(pages, "doc_id", "html")))
  }
}
