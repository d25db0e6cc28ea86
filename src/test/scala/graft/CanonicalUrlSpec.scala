package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextAnalysis}

/** Canonical-URL fold + URL-keyed exact dedup units. */
class CanonicalUrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(TextAnalysis.canonicalUrlCol(col("u")).as("c"))
      .as[String].collect().toSeq

  test("folds case, www, default port, trailing slash, fragment, tracking params, param order") {
    val out = canon(
      "https://www.shop7.com/item/42?a=1&b=2",
      "HTTPS://Shop7.COM:443/item/42/?b=2&utm_source=feed&a=1#frag",
      "http://EXAMPLE.org:80/x/",
      "http://example.org/x?fbclid=abc&gclid=def")
    assert(out(0) == "https://shop7.com/item/42?a=1&b=2")
    assert(out(1) == out(0), s"messy variant did not fold: ${out(1)}")
    assert(out(2) == "http://example.org/x")
    assert(out(3) == out(2), s"tracking-only query must vanish: ${out(3)}")
  }

  test("non-default ports, path case and non-tracking params survive") {
    val out = canon(
      "https://api.host.io:8443/V1/Items?z=9&a=1",
      "https://api.host.io/V1/Items?a=1&z=9")
    assert(out(0) == "https://api.host.io:8443/v1/items?a=1&z=9"
      || out(0) == "https://api.host.io:8443/V1/Items?a=1&z=9")
    // path case is significant (RFC 3986): V1/Items must be preserved
    assert(out(0).contains("/V1/Items"), s"path case was folded: ${out(0)}")
    assert(out(1) == "https://api.host.io/V1/Items?a=1&z=9")
  }

  test("scheme-less strings pass through as lower(trim)") {
    assert(canon("  No-Scheme/Path  ") == Seq("no-scheme/path"))
  }

  test("urlExact groups messy variants under one canonical key") {
    val urls = Seq(
      (1L, "https://www.a.com/p?x=1"),
      (2L, "HTTPS://A.COM:443/p/?utm_medium=m&x=1"),
      (3L, "https://a.com/q")).toDF("doc_id", "url")
    val out = Dedup.urlExact(urls).orderBy(col("canonical_url")).collect()
    assert(out.length == 2, s"expected 2 groups: ${out.toSeq}")
    val dup = out.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dup.getAs[String]("canonical_url") == "https://a.com/p?x=1")
    assert(dup.getAs[Long]("canonical_id") == 1L)
  }
}
