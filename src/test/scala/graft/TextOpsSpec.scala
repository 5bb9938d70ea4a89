package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("wordCount counts every token exactly once") {
    val docs = Tables.documents(spark, sfDir)
    val wc = TextOps.wordCount(docs, "text")
    val totalFromCounts = wc.agg(sum("cnt")).as[Long].head()
    val totalTokens = TextOps.tokens(docs, "text").count()
    assert(totalFromCounts == totalTokens)
    assert(wc.count() > 0)
    assert(wc.columns.toSeq == Seq("word", "cnt"))
  }

  test("wordCount on a tiny literal frame") {
    val df = Seq("a b  a", " b ").toDF("text")
    val got = TextOps.wordCount(df, "text")
      .orderBy("word").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L), ("b", 2L)))
  }

  test("grep finds regex matches with counts") {
    val df = Seq("spark scan span", "no match here except sx").toDF("text")
    val got = TextOps.grep(df, "text", "s[a-z]+")
      .orderBy("match").as[(String, Long)].collect().toSeq
    assert(got == Seq(("scan", 1L), ("span", 1L), ("spark", 1L), ("sx", 1L)))
  }

  test("hash60 is stable and within 60 bits") {
    val h = Seq("hello").toDF("s")
      .select(TextOps.hash60(col("s"))).as[Long].head()
    assert(h > 0 && h < (1L << 60))
    // recompute: first 15 hex chars of md5("hello") = 5d41402abc4b2a7
    assert(h == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }

  test("sentences split on ender+ws runs; indices post-filter; md5 exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One. Two sentences!  Three?? Four"),
      (2L, ". Leading ender. "),
      (3L, "")
    ).toDF("doc_id", "text")
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = graft.ops.TextOps.sentences(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    // the ender+whitespace run is the SEPARATOR (consumed — no
    // lookbehind in RE2); leading/trailing empties filtered both engines
    assert(got === Set(
      (1L, 0L, 3L, m("One")),
      (1L, 1L, 13L, m("Two sentences")),
      (1L, 2L, 5L, m("Three")),
      (1L, 3L, 4L, m("Four")),
      (2L, 0L, 13L, m("Leading ender"))))
  }
}
