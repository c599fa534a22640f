package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[UrlOps]] edge semantics the synthetic registry fixture can't reach:
  * malformed inputs, root paths, duplicate params, mixed tracking ids.
  */
class UrlOpsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toDF("u")
      .select(UrlOps.canonicalUrl(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq

  "canonicalUrl" should "lowercase scheme+host and strip www + default ports" in {
    canon("HTTP://WWW.Example.COM:80/Path") shouldBe Seq(Some("http://example.com/Path"))
    canon("https://Example.com:443/") shouldBe Seq(Some("https://example.com/"))
    canon("https://example.com:8443/a") shouldBe Seq(Some("https://example.com:8443/a"))
  }

  it should "preserve path case (paths are case-sensitive)" in {
    canon("https://example.com/CaseSensitive") shouldBe
      Seq(Some("https://example.com/CaseSensitive"))
  }

  it should "drop fragments and trailing slashes, default empty path to /" in {
    canon("https://example.com/a/b/#sec") shouldBe Seq(Some("https://example.com/a/b"))
    canon("https://example.com") shouldBe Seq(Some("https://example.com/"))
    canon("https://example.com/") shouldBe Seq(Some("https://example.com/"))
  }

  it should "strip tracking params but keep order of the rest" in {
    canon("https://e.com/p?utm_source=a&b=2&a=1&fbclid=xyz&b=3&gclid=q") shouldBe
      Seq(Some("https://e.com/p?b=2&a=1&b=3"))
    // all params tracking -> no query at all
    canon("https://e.com/p?utm_a=1&utm_b=2") shouldBe Seq(Some("https://e.com/p"))
  }

  it should "yield null for non-URLs" in {
    canon("not a url", "ftp//missing.colon", "") shouldBe Seq(None, None, None)
  }

  "urlDomain" should "be the lowercased www-stripped host" in {
    Seq("HTTPS://WWW.News.Example.ORG/x", "junk").toDF("u")
      .select(UrlOps.urlDomain(col("u")))
      .collect().map(r => Option(r.getString(0))).toSeq shouldBe
      Seq(Some("news.example.org"), None)
  }
}
