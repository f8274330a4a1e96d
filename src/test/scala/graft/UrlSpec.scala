package graft

import org.apache.spark.sql.functions._

import graft.pipeline.UrlCuration

/** URL curation tier (pipeline/UrlCuration): canonicalization rules on
  * hand-built cases, registered-domain extraction, canonical-URL dedup,
  * blocklist + per-domain cap, and the synth invariants the oracle
  * queries rely on (same page key ⇒ same canonical URL; distinct keys ⇒
  * distinct canonical URLs). */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), UrlCuration.canonicalizeUrl(col("url")).as("c"))
      .orderBy("id")
    df.collect().map(r => r.getString(1)).toSeq
  }

  test("canonicalizeUrl: scheme/host case, default ports, fragments") {
    assert(canon(
      "HTTP://WWW.Site0.COM:80#top",
      "https://site1.org:443/?x=1#frag",
      "http://cdn.a.net:8080/p",     // non-default port survives
      "https://a.com:80/p"            // :80 is NOT https' default
    ) == Seq(
      "http://www.site0.com/",
      "https://site1.org/?x=1",
      "http://cdn.a.net:8080/p",
      "https://a.com:80/p"))
  }

  test("canonicalizeUrl: path normalization preserves case, strips one trailing slash") {
    assert(canon(
      "http://h.com",        // empty path -> /
      "http://h.com/",       // root stays /
      "http://h.com/a/b/",   // trailing slash stripped
      "http://h.com/A/B"     // path case preserved
    ) == Seq(
      "http://h.com/", "http://h.com/",
      "http://h.com/a/b", "http://h.com/A/B"))
  }

  test("canonicalizeUrl: tracking params dropped, order preserved, bare ? dropped") {
    assert(canon(
      "http://h.com/p?utm_source=x",
      "http://h.com/p?b=2&utm_medium=y&a=1",
      "http://h.com/p?fbclid=z&gclid=g&msclkid=m&ref=r",
      "http://h.com/p?ref=keepme&refx=1" // refx is NOT tracking
    ) == Seq(
      "http://h.com/p",
      "http://h.com/p?b=2&a=1",
      "http://h.com/p",
      "http://h.com/p?refx=1"))
  }

  test("canonicalizeUrl: non-URL strings canonicalize to NULL") {
    val got = Seq((0L, "not a url"), (1L, "mailto:x@y.z"), (2L, ""))
      .toDF("id", "url")
      .select(UrlCuration.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.forall(_.isEmpty))
  }

  test("registeredDomain: eTLD+1 with two-label public suffixes") {
    val got = Seq(
      "http://www.x.co.uk/p", "https://cdn.site2.com.au:443",
      "http://a.b.c.org/", "http://single/", "http://h.com:8080/p")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), UrlCuration.registeredDomain(col("url")).as("d"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got == Seq("x.co.uk", "site2.com.au", "c.org", "single", "h.com"))
  }

  test("urlDedup: canonical-variant spellings collapse; keeper is min doc_id") {
    val docs = Seq(
      (10L, "http://h.com/a/b?utm_source=x"),
      (4L, "HTTP://H.COM:80/a/b/"),
      (7L, "http://h.com/a/b"),
      (9L, "http://other.com/x"),
      (11L, "not a url"), (12L, "also not")).toDF("doc_id", "url")
    val got = rowsOf(UrlCuration.urlDedup(docs))
    assert(got.size == 1)
    assert(got.head("url_canon") == "http://h.com/a/b")
    assert(got.head("keeper") == 4L && got.head("dups") == 3L)
  }

  test("blocklistAndCap: blocked domains vanish, per-domain cap binds deterministically") {
    val docs = (0L until 40L).map { i =>
      val dom = if (i % 2 == 0) "keep.com" else "bad.org"
      (i, s"http://www.$dom/p/$i")
    }.toDF("doc_id", "url")
    val blocked = Seq("bad.org").toDF("domain")
    val got = UrlCuration.blocklistAndCap(docs, blocked, k = 5)
    val rows = rowsOf(got.select("doc_id", "domain"))
    assert(rows.forall(_("domain") == "keep.com"))
    assert(rows.size == 5)
    // rerun = identical draw (deterministic scrambled-id order)
    val again = rowsOf(UrlCuration.blocklistAndCap(docs, blocked, k = 5)
      .select("doc_id", "domain"))
    assert(rows.map(_("doc_id")).toSet == again.map(_("doc_id")).toSet)
  }

  test("domainPrior: exact per-domain mean joined back, corpus columns preserved") {
    val docs = Seq(
      (1L, "http://www.a.com/x", 10L),
      (2L, "http://cdn.a.com/y", 20L),   // same registered domain
      (3L, "https://b.org/z", 7L),
      (4L, "not a url", 99L))            // dropped (no domain)
      .toDF("doc_id", "url", "score")
    val got = rowsOf(
      graft.pipeline.UrlCuration.domainPrior(docs, col("score")))
      .map(r => r("doc_id") -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)("domain") == "a.com" && got(1L)("n_domain_docs") == 2L)
    assert(got(1L)("domain_mean") == 15.0 && got(2L)("domain_mean") == 15.0)
    assert(got(3L)("domain_mean") == 7.0)
    assert(got(1L)("score") == 10L) // input columns survive the rejoin
  }

  test("domainPrior: null scores are excluded from the mean, not counted as zero") {
    // a.com has scores (10, null, 20): mean must be 15 (over the two
    // scored docs), NOT 10 (sum/count(*) — the r14 ADVICE bias);
    // b.org is entirely unscored -> null mean, still counted in n_docs
    val docs = Seq(
      (1L, "http://a.com/x", Some(10L)),
      (2L, "http://a.com/y", None),
      (3L, "http://a.com/z", Some(20L)),
      (4L, "https://b.org/w", None))
      .toDF("doc_id", "url", "score")
    val got = rowsOf(
      graft.pipeline.UrlCuration.domainPrior(docs, col("score")))
      .map(r => r("doc_id") -> r).toMap
    assert(got(1L)("n_domain_docs") == 3L)
    assert(got(1L)("domain_mean") == 15.0)
    assert(got(2L)("domain_mean") == 15.0) // the unscored doc still gets the prior
    assert(got(4L)("n_domain_docs") == 1L)
    assert(got(4L)("domain_mean") == null)
  }

  test("synthUrl: same page key collides after canonicalization, distinct keys never do") {
    val urls = spark.range(0, 290).toDF("doc_id")
      .select(col("doc_id"),
        UrlCuration.canonicalizeUrl(
          UrlCuration.synthUrl(col("doc_id"))).as("c"))
    val rows = urls.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.forall(_._2 != null))
    val byKey = rows.groupBy(_._1 % 29).view.mapValues(_.map(_._2).distinct)
    // every doc with the same page key canonicalizes identically
    assert(byKey.values.forall(_.size == 1))
    // and distinct page keys yield distinct canonical URLs
    assert(byKey.values.flatten.toSeq.distinct.size == 29)
  }
}
