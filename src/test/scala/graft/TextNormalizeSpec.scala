package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextNormalize

class TextNormalizeSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def run1(c: org.apache.spark.sql.Column): String =
    spark.range(1).select(c.as("v")).head().getString(0)

  test("nfc composes decomposed sequences and is identity on ASCII") {
    assert(run1(TextNormalize.nfc(lit("Café"))) === "Café")
    assert(run1(TextNormalize.nfc(lit("plain ascii 123!"))) === "plain ascii 123!")
    // already-composed stays composed; mixed content normalizes only what needs it
    assert(run1(TextNormalize.nfc(lit("Café ö"))) === "Café ö")
  }

  test("whitespace collapse handles tabs, newlines, runs, and ends") {
    assert(run1(TextNormalize.collapseWhitespace(lit(" a\t\tb \n c  d "))) === "a b c d")
    assert(run1(TextNormalize.collapseWhitespace(lit(""))) === "")
    assert(run1(TextNormalize.collapseWhitespace(lit(" \t\n "))) === "")
  }

  test("boilerplate strip drops matching lines only, preserving order") {
    val in = "keep one\nCopyright 2020 Acme\nkeep two\n  ALL RIGHTS RESERVED\nTerms of Service apply\nkeep three"
    assert(run1(TextNormalize.stripBoilerplate(lit(in))) ===
      "keep one\nkeep two\nkeep three")
    // non-line-start mentions survive (anchored pattern)
    assert(run1(TextNormalize.stripBoilerplate(lit("the copyright notice"))) ===
      "the copyright notice")
  }

  test("full pipeline: strip -> nfc -> fold -> collapse") {
    val in = "HELLO  World\nCopyright 2024\n\tCafé   time "
    assert(run1(TextNormalize.normalize(lit(in))) === "hello world caf\u00e9 time")
  }

  test("urlCanonicalize: every variant dimension collapses; param order kept") {
    def canon(u: String): String =
      run1(TextNormalize.urlCanonicalize(lit(u)))
    val want = "site.example.com/p/7?id=7"
    // scheme, www., host case, trailing slash, utm_ param, fragment
    assert(canon("http://site.example.com/p/7?id=7") === want)
    assert(canon("https://www.site.example.com/p/7?id=7") === want)
    assert(canon("https://SITE.Example.COM/p/7?id=7") === want)
    assert(canon("https://site.example.com/p/7/?id=7") === want)
    assert(canon("https://site.example.com/p/7?utm_source=feed&id=7") === want)
    assert(canon("https://site.example.com/p/7?id=7#top") === want)
    // non-tracking params keep their declared ORDER (no reorder surprises)
    assert(canon("https://h.io/x?b=2&utm_medium=m&a=1") === "h.io/x?b=2&a=1")
    // all params tracking -> query dropped entirely
    assert(canon("https://h.io/x?utm_a=1&utm_b=2") === "h.io/x")
    // no query, bare host, root slash stripped
    assert(canon("https://www.h.io/") === "h.io")
    // no path at all: just the host
    assert(canon("http://h.io") === "h.io")
    // scheme-LESS forms are routine in crawl data: protocol-relative and
    // bare URLs must key like their https twins, and two UNRELATED bare
    // URLs must never collapse to one empty key
    assert(canon("//www.h.io/x?id=1") === "h.io/x?id=1")
    assert(canon("b.org/y") === "b.org/y")
    assert(canon("B.ORG/y/") === "b.org/y")
    assert(canon("a.com/x") !== canon("b.org/y"))
  }

  test("piiScrub: redacts email/phone/ipv4 with typed tokens and exact counts") {
    import SparkTestSession.spark.implicits._
    import org.apache.spark.sql.functions.col
    def scrub(s: String): (String, Long, Long, Long) = {
      val r = Seq(s).toDF("t")
        .select(TextNormalize.piiScrub(col("t")).as("s"))
        .select("s.text", "s.n_email", "s.n_phone", "s.n_ip").head()
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    assert(scrub("mail a.b+c@ex-1.co.uk now") ===
      (("mail <EMAIL> now", 1L, 0L, 0L)))
    assert(scrub("call +44 123-4567 or +1 555 0100") ===
      (("call <PHONE> or <PHONE>", 0L, 2L, 0L)))
    assert(scrub("host 192.168.0.1 up") === (("host <IP> up", 0L, 0L, 1L)))
    // all three in one pass, scrub order email -> phone -> ip
    assert(scrub("x@y.io +1 555-0123 10.0.0.7") ===
      (("<EMAIL> <PHONE> <IP>", 1L, 1L, 1L)))
    // no over-redaction: bare numbers, version strings, decimals survive
    assert(scrub("v1.2 build 3.14159 qty 555 0100") ===
      (("v1.2 build 3.14159 qty 555 0100", 0L, 0L, 0L)))
    // a digit-bearing email domain is consumed by the EMAIL pass, so the
    // later ip pass cannot see its digits (ordering contract)
    assert(scrub("u@10.0.0.7.example.com") === (("<EMAIL>", 1L, 0L, 0L)))
    // dotted quad glued inside a longer dotted run stays (word boundary)
    assert(scrub("ip 10.0.0.7 ok") === (("ip <IP> ok", 0L, 0L, 1L)))
  }
}
