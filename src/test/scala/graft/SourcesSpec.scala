package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Readers

class SourcesSpec extends SparkTestBase {

  private val schema = graft.schema.BqSchema.parse("""[
    {"name":"id","type":"INT64","mode":"NULLABLE"},
    {"name":"name","type":"STRING","mode":"NULLABLE"},
    {"name":"score","type":"FLOAT64","mode":"NULLABLE"}]""")

  test("jsonl: declared schema, malformed lines quarantined not dropped") {
    val dir = Files.createTempDirectory("jsonl").toFile.getAbsolutePath
    val f = new java.io.File(dir, "part.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"id": 1, "name": "a", "score": 0.5}""")
    w.println("""{"id": 2, "name": "b"}""")            // missing field: fine
    w.println("""{"id": "not-a-number", "name": "c"}""") // type error
    w.println("""this is not json at all""")
    w.close()
    val df = Readers.jsonl(spark, f.getAbsolutePath, schema)
    val (clean, bad) = Readers.quarantine(df)
    assert(clean.count() == 2 && bad.count() == 2)
    assert(!clean.columns.contains(Readers.CorruptCol))
    val r1 = clean.filter(col("id") === 1L).collect()(0)
    assert(r1.getAs[String]("name") == "a" && r1.getAs[Double]("score") == 0.5)
    // the raw text of the bad lines is preserved for reprocessing
    val raw = bad.collect()
      .map(_.getAs[String]("raw_record")).mkString("\n")
    assert(raw.contains("not-a-number") && raw.contains("not json"))
  }

  test("orc: columnar round-trip with declared schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orc").toFile.getAbsolutePath
    val data = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")
    data.write.orc(s"$dir/t")
    val back = Readers.orc(spark, s"$dir/t", schema)
    assert(back.orderBy("id").collect().map(_.getAs[Long]("id")).toSeq ==
      Seq(1L, 2L))
  }

  test("csv: declared schema, header + quarantine contract") {
    val dir = Files.createTempDirectory("csv").toFile.getAbsolutePath
    val f = new java.io.File(dir, "part.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,name,score")
    w.println("1,a,0.5")
    w.println("oops,b,not-a-float")
    w.close()
    val (clean, bad) = Readers.quarantine(
      Readers.csv(spark, f.getAbsolutePath, schema))
    assert(clean.count() == 1 && bad.count() == 1)
    assert(clean.collect()(0).getAs[Long]("id") == 1L)
  }

  test("wet: crawl-archive records parse per file with headers, order, " +
    "and missing-URI capture") {
    val dir = Files.createTempDirectory("wet").toFile
    val f = new java.io.File(dir, "crawl-00000.warc.wet")
    val w = new java.io.PrintWriter(f)
    w.print(
      "WARC/1.0\r\n" +
        "WARC-Type: conversion\r\n" +
        "WARC-Target-URI: http://example.com/a\r\n" +
        "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        "Content-Length: 11\r\n" +
        "\r\n" +
        "hello world\r\n" +
        "\r\n" +
        "WARC/1.0\r\n" +
        "WARC-Type: conversion\r\n" +
        "WARC-Date: 2024-01-02T00:00:00Z\r\n" + // no URI: quarantined null
        "\r\n" +
        "second record text\nwith two lines\r\n" +
        "\r\n" +
        "WARC/1.0\r\n" +
        "WARC-Target-URI: http://example.com/c\r\n" +
        "WARC-Date: 2024-01-03T00:00:00Z\r\n" +
        "\r\n" +
        "third\r\n")
    w.close()
    val r = Readers.wet(spark, dir.getAbsolutePath + "/*.wet")
      .orderBy("rec_idx").collect()
      .map(x => (x.getLong(1), x.getString(2), x.getString(3),
        x.getString(4)))
    assert(r.length == 3)
    assert(r(0) == (0L, "http://example.com/a",
      "2024-01-01T00:00:00Z", "hello world"))
    assert(r(1)._2 == null) // missing URI captured, record kept
    assert(r(1)._4 == "second record text\nwith two lines")
    assert(r(2) == (2L, "http://example.com/c",
      "2024-01-03T00:00:00Z", "third"))
  }
}
