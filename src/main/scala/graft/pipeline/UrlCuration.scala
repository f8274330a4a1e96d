package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level corpus curation: canonicalization, registered-domain
  * extraction, domain blocklists, per-domain caps, and canonical-URL
  * dedup — the web-crawl curation stages (RefinedWeb/FineWeb-style URL
  * filtering, CCNet's per-domain sampling) that run BEFORE content
  * dedup, because the cheapest duplicate is the one you never fetch or
  * score: the same page crawled twice under tracking-parameter or
  * trailing-slash variants collapses here for the cost of a projection.
  *
  * Scale shape: every transform in this file is a per-row projection
  * (regex over one short string — no shuffle, no state), so the tier is
  * map-only until the final dedup/cap aggregation, which groups on the
  * canonical URL / registered domain. Domains are a bounded key space
  * (millions, not documents), and the blocklist is broadcast-sized by
  * nature.
  *
  * Every rule is dual-defined — as Spark `Column`s here and as DuckDB
  * SQL fragments ([[canonSql]], [[domainSql]]) built from the SAME
  * regexes — so the whole tier is hash-checked end to end by the oracle
  * gate (the regex subset used is common to Java regex and RE2: no
  * lookaround, no backreferences).
  *
  * The testdata `documents` table has no URL column, so [[synthUrls]]
  * derives a deterministic URL per document (the [[graft.core.FlowSynth]]
  * convention), exercising every canonicalization rule: mixed-case
  * schemes/hosts, default and explicit ports, empty/slash/case path
  * variants, tracking parameters in every position, fragments, and
  * two-label public suffixes.
  */
object UrlCuration {

  /** Capturing parse of an absolute URL: (1) scheme, (2) host[:port],
    * (3) path, (4) query (no '?'), fragment discarded. Groups that do
    * not participate extract as '' in both Spark and DuckDB. */
  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** Tracking parameters dropped by canonicalization (utm_*, click ids,
    * bare ref) — matched against one `k=v` (or bare `k`) query element. */
  private val TrackingRe = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"

  /** Two-label public suffixes recognized by [[registeredDomain]]. A
    * full public-suffix list is a broadcast dictionary in production;
    * the set here is the contract the oracle mirrors. */
  val twoLabelSuffixes: Seq[String] = Seq("co.uk", "com.au", "co.jp", "org.uk")

  // ----- canonicalization -------------------------------------------------

  /** Canonical form of an absolute URL:
    *   - scheme and host lowercased;
    *   - default port stripped (`:80` for http, `:443` for https);
    *   - empty path → `/`; one trailing slash stripped from non-root
    *     paths (path case is preserved — it is significant);
    *   - tracking parameters removed (order of the surviving parameters
    *     preserved; `?` dropped when none survive);
    *   - fragment dropped.
    * Non-URL strings (no scheme) canonicalize to NULL. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val hostport = lower(regexp_extract(url, UrlRe, 2))
    val rawPath = regexp_extract(url, UrlRe, 3)
    val qs = regexp_extract(url, UrlRe, 4)
    val hp = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val path = when(rawPath === "" || rawPath === "/", lit("/"))
      .otherwise(regexp_replace(rawPath, "/$", ""))
    val kept = array_join(
      filter(split(qs, "&"), x => !x.rlike(TrackingRe) && x =!= ""), "&")
    when(scheme === "", lit(null).cast("string")).otherwise(
      concat(scheme, lit("://"), hp, path,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }

  /** Registered domain (eTLD+1 against [[twoLabelSuffixes]]) of an
    * absolute URL: last two host labels, or last three when the last two
    * are a listed public suffix. NULL for non-URLs. */
  def registeredDomain(url: Column): Column = {
    val host = regexp_replace(
      lower(regexp_extract(url, UrlRe, 2)), ":[0-9]+$", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    // get() (0-based) stays null-safe under ANSI where a short host
    // would make element_at(-3) throw
    val lastK = (k: Int) => concat_ws(".",
      (k to 1 by -1).map(i => get(labels, n - i)): _*)
    when(host === "", lit(null).cast("string"))
      .when(lastK(2).isin(twoLabelSuffixes: _*) && n >= 3, lastK(3))
      .when(n >= 2, lastK(2))
      .otherwise(host)
  }

  // ----- curation operators ----------------------------------------------

  /** Canonical-URL dedup: one row per canonical URL that has duplicates,
    * with the kept document (lowest doc_id — deterministic, engine-
    * portable) and the duplicate count. The groupBy key is the canonical
    * string; counts partial-aggregate map-side. Rows whose URL does not
    * canonicalize (NULL) never collide. */
  def urlDedup(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .withColumn("url_canon", canonicalizeUrl(col(urlCol)))
      .filter(col("url_canon").isNotNull)
      .groupBy("url_canon")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("dups"))
      .filter(col("dups") > 1)

  /** Blocklist + per-domain cap: drop documents whose registered domain
    * is blocked (broadcast anti-join — a blocklist is dictionary-sized),
    * then keep at most `k` documents per surviving domain, drawn by the
    * deterministic scrambled-id order (the [[Curation.sampleExactPerSource]]
    * convention: per-group window top-k plans as WindowGroupLimit — a
    * partial per-partition top-k, no global sort). */
  def blocklistAndCap(docs: DataFrame, blocked: DataFrame, k: Int,
                      urlCol: String = "url"): DataFrame = {
    val withDomain = docs
      .withColumn("domain", registeredDomain(col(urlCol)))
      .filter(col("domain").isNotNull)
    withDomain
      .join(broadcast(blocked), Seq("domain"), "left_anti")
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("domain")
          .orderBy(Similarity.idScramble(col("doc_id")).asc,
            col("doc_id").asc)))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Domain-level prior joined back to documents: per registered domain,
    * the document count and the mean of `score` — the "judge the page by
    * its site" signal (domain-level quality priors gate low-information
    * pages whose own text scores fine, and rescue short pages on strong
    * domains). Emits every input column plus `domain`, `n_domain_docs`,
    * `domain_mean` (round-6). `n_domain_docs` counts ALL the domain's
    * documents; `domain_mean` averages over the NON-NULL scores only —
    * a null score means "unscored", and counting it in the denominator
    * would silently bias every mixed domain's mean toward zero (a
    * domain with no scored documents gets a null mean, loud the way
    * this repo's validators are).
    *
    * Scale: one aggregate on the bounded domain key space, then the
    * priors (domain-count-sized) broadcast back onto the corpus — the
    * corpus never shuffles. The score column keeps its own type (no
    * silent cast): pass an INTEGER-typed score (token counts, micro-unit
    * fixed-point scores) when the mean must be engine-exact — the sum is
    * then exact and the single division deterministic; a double score
    * gives an ordinary float mean. */
  def domainPrior(docs: DataFrame, score: Column,
                  urlCol: String = "url"): DataFrame = {
    val withDomain = docs
      .withColumn("domain", registeredDomain(col(urlCol)))
      .filter(col("domain").isNotNull)
      .withColumn("__score", score)
    val priors = withDomain
      .groupBy("domain")
      .agg(count(lit(1)).as("n_domain_docs"),
        round(sum("__score").cast("double") / count(col("__score")), 6)
          .as("domain_mean"))
    withDomain.join(broadcast(priors), Seq("domain")).drop("__score")
  }

  // ----- deterministic URL synthesis (testdata has no URL column) ---------

  /** Deterministic per-document URL covering every canonicalization
    * rule. Structure: a page-identity key `k = doc_id % 29` decides the
    * SEMANTIC coordinates (scheme kind, host, port, path, surviving
    * query), while `doc_id` itself picks among canon-EQUIVALENT surface
    * variants of each (case, default ports, tracking params, trailing
    * slash, fragments) — so every document with the same `k`
    * canonicalizes to the same URL and the dedup/cap operators see real
    * duplicate mass (≈ docs/29 per canonical URL) at every SF, while
    * the canonical space stays all-distinct across `k` (the moduli used
    * are coprime far past 29). Dual-defined: [[urlSql]] is the same
    * arithmetic in DuckDB. */
  def synthUrl(docId: Column): Column = {
    val d = docId
    val k = d % 29
    val s = (c: Column) => c.cast("string")
    val isHttps = k % 2 === 1
    val scheme = when(isHttps, when(d % 3 === 2, "HTTPS").otherwise("https"))
      .otherwise(when(d % 3 === 2, "HTTP").otherwise("http"))
    val port = when(k % 7 === 0, lit(":8080")).otherwise(
      when(d % 3 === 0, when(isHttps, ":443").otherwise(":80"))
        .otherwise(""))
    val sub = when(k % 3 === 0, when(d % 2 === 0, "www.").otherwise("WWW."))
      .when(k % 3 === 1, "").otherwise("cdn.")
    val core = concat(lit("site"), s(k % 17))
    val tld = when(k % 5 === 0, ".com").when(k % 5 === 1, ".org")
      .when(k % 5 === 2, ".co.uk").when(k % 5 === 3, ".net")
      .otherwise(".com.au")
    val path = when(k % 4 === 0, when(d % 2 === 0, lit("")).otherwise(lit("/")))
      .when(k % 4 === 1,
        when(d % 2 === 0, lit("/a/b")).otherwise(lit("/a/b/")))
      .when(k % 4 === 2, concat(lit("/P/"), s(k % 7)))
      .otherwise(concat(lit("/p/"), s(k % 7)))
    val query = when(k % 4 === 0,
        when(d % 2 === 0, lit("")).otherwise(lit("?utm_source=x")))
      .when(k % 4 === 1, concat(lit("?id="), s(k % 13),
        when(d % 2 === 1, "&utm_campaign=z").otherwise("")))
      .when(k % 4 === 2, when(d % 2 === 0, lit("?a=1&b=2"))
        .otherwise(lit("?a=1&utm_medium=y&b=2")))
      .otherwise(when(d % 2 === 0, lit("?fbclid=abc"))
        .otherwise(lit("?gclid=g")))
    val frag = when(d % 5 === 0, lit("#top"))
      .when(d % 5 === 1, concat(lit("#s"), s(d % 4)))
      .otherwise(lit(""))
    concat(scheme, lit("://"), sub, core, tld, port, path, query, frag)
  }

  /** `documents` + a deterministic `url` column. */
  def synthUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", synthUrl(col("doc_id")))

  // ----- DuckDB twins ------------------------------------------------------

  /** DuckDB expression for [[synthUrl]] over column `doc_id`. */
  val urlSql: String = {
    val d = "doc_id"
    val k = s"($d%29)"
    s"""((CASE WHEN $k%2 = 1
       |   THEN CASE WHEN $d%3 = 2 THEN 'HTTPS' ELSE 'https' END
       |   ELSE CASE WHEN $d%3 = 2 THEN 'HTTP' ELSE 'http' END END) ||
       | '://' ||
       | (CASE WHEN $k%3 = 0 THEN CASE WHEN $d%2 = 0 THEN 'www.' ELSE 'WWW.' END
       |       WHEN $k%3 = 1 THEN '' ELSE 'cdn.' END) ||
       | 'site' || ($k%17) ||
       | (CASE $k%5 WHEN 0 THEN '.com' WHEN 1 THEN '.org' WHEN 2 THEN '.co.uk' WHEN 3 THEN '.net' ELSE '.com.au' END) ||
       | (CASE WHEN $k%7 = 0 THEN ':8080'
       |       WHEN $d%3 = 0 THEN CASE WHEN $k%2 = 1 THEN ':443' ELSE ':80' END
       |       ELSE '' END) ||
       | (CASE WHEN $k%4 = 0 THEN CASE WHEN $d%2 = 0 THEN '' ELSE '/' END
       |       WHEN $k%4 = 1 THEN CASE WHEN $d%2 = 0 THEN '/a/b' ELSE '/a/b/' END
       |       WHEN $k%4 = 2 THEN '/P/' || ($k%7)
       |       ELSE '/p/' || ($k%7) END) ||
       | (CASE WHEN $k%4 = 0 THEN CASE WHEN $d%2 = 0 THEN '' ELSE '?utm_source=x' END
       |       WHEN $k%4 = 1 THEN '?id=' || ($k%13) || CASE WHEN $d%2 = 1 THEN '&utm_campaign=z' ELSE '' END
       |       WHEN $k%4 = 2 THEN CASE WHEN $d%2 = 0 THEN '?a=1&b=2' ELSE '?a=1&utm_medium=y&b=2' END
       |       ELSE CASE WHEN $d%2 = 0 THEN '?fbclid=abc' ELSE '?gclid=g' END END) ||
       | (CASE WHEN $d%5 = 0 THEN '#top' WHEN $d%5 = 1 THEN '#s' || ($d%4) ELSE '' END))"""
      .stripMargin.replace("\n", "")
  }

  /** DuckDB expression canonicalizing URL expression `u` — the exact
    * [[canonicalizeUrl]] rules with the same regexes. */
  def canonSql(u: String): String = {
    // UrlRe embeds verbatim: the escapes used (\? and char classes) mean
    // the same thing to RE2 and Java regex
    val scheme = s"lower(regexp_extract($u, '$UrlRe', 1))"
    val hostport = s"lower(regexp_extract($u, '$UrlRe', 2))"
    val rawPath = s"regexp_extract($u, '$UrlRe', 3)"
    val qs = s"regexp_extract($u, '$UrlRe', 4)"
    // COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
    // array_join is '' — and the NULL would swallow the whole || chain
    val kept = s"coalesce(array_to_string(list_filter(string_split($qs, '&'), " +
      s"x -> NOT regexp_matches(x, '$TrackingRe') AND x <> ''), '&'), '')"
    s"""(CASE WHEN $scheme = '' THEN NULL ELSE
       | $scheme || '://' ||
       | (CASE WHEN $scheme = 'http' THEN regexp_replace($hostport, ':80$$', '')
       |       WHEN $scheme = 'https' THEN regexp_replace($hostport, ':443$$', '')
       |       ELSE $hostport END) ||
       | (CASE WHEN $rawPath IN ('', '/') THEN '/'
       |       ELSE regexp_replace($rawPath, '/$$', '') END) ||
       | (CASE WHEN $kept = '' THEN '' ELSE '?' || $kept END)
       | END)""".stripMargin.replace("\n", "")
  }

  /** DuckDB expression for [[registeredDomain]] of URL expression `u`. */
  def domainSql(u: String): String = {
    val host = s"regexp_replace(lower(regexp_extract($u, '$UrlRe', 2)), ':[0-9]+$$', '')"
    val suffixes = twoLabelSuffixes.map(s => s"'$s'").mkString(", ")
    s"""(CASE WHEN $host = '' THEN NULL
       | WHEN array_to_string((string_split($host, '.'))[-2:], '.') IN ($suffixes)
       |      AND len(string_split($host, '.')) >= 3
       |   THEN array_to_string((string_split($host, '.'))[-3:], '.')
       | WHEN len(string_split($host, '.')) >= 2
       |   THEN array_to_string((string_split($host, '.'))[-2:], '.')
       | ELSE $host END)""".stripMargin.replace("\n", "")
  }
}
