package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    TextAnalysis.urlCanonicalize(urls.zipWithIndex.map(_.swap).toDF("id", "url"))
      .orderBy("id").select("canon_url").as[String].collect().toSeq

  test("RFC 3986 normalizations and tracking-param strip") {
    val got = canon(
      "HTTPS://User:pw@WWW.Example.COM:443/a//b/c/?utm_source=t&z=1&a=2#frag",
      "http://host.example.com:80/",
      "http://host.example.com:8080/x",
      "https://h.example.com/p?fbclid=abc",
      "https://h.example.com/p?b=2&a=1",
      "https://h.example.com/deep///path//x")
    assert(got == Seq(
      "https://www.example.com/a/b/c?a=2&z=1", // default port + userinfo + dup slash + trailing slash + utm + sort
      "http://host.example.com/",              // root slash survives
      "http://host.example.com:8080/x",        // non-default port kept
      "https://h.example.com/p",               // fbclid-only query vanishes
      "https://h.example.com/p?a=1&b=2",       // params sorted
      "https://h.example.com/deep/path/x"))
  }

  test("a '?' first appearing inside the fragment is not resurrected as a query") {
    val got = canon(
      "https://ex.com/app#/route?tab=1", // SPA route: no real query
      "https://ex.com/app#/route",
      "https://ex.com/app?real=1#sec?x=2")
    assert(got(0) == "https://ex.com/app")
    assert(got(0) == got(1)) // fragment-only difference -> same class
    assert(got(2) == "https://ex.com/app?real=1")
  }

  test("canonical equivalence classes collapse crawl duplicates") {
    val variants = Seq(
      "https://Site.Example.com/page?utm_campaign=x",
      "https://site.example.com:443/page",
      "https://site.example.com//page#top")
    assert(canon(variants: _*).distinct.size == 1)
  }

  test("langid mismatch rate flags the mislabeled group") {
    val docs = Seq(
      ("good", "en", "the a of and to the"),
      ("good", "en", "the of and"),
      ("bad", "en", "der die das und nicht"), // German text labeled en
      ("bad", "en", "the a of")).toDF("source", "lang", "text")
    val got = TextAnalysis.langidMismatch(docs)
      .select("source", "n_docs", "n_mismatch").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("good" -> ((2L, 0L)), "bad" -> ((2L, 1L))))
  }
}
