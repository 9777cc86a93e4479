package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-curation step before URL-level dedup
  * and per-domain caps ([[graft.operators.sampling.GroupCap]]): the same
  * page is crawled as `HTTPS://WWW.Site.COM:443/a/?utm_source=x&b=2&a=1`
  * and `https://site.com/a?a=1&b=2`, and without canonicalization both
  * survive URL dedup and domain statistics double-count.
  *
  * Rules (the common-crawl-style conservative set — nothing that can
  * change what the URL dereferences to):
  *   - drop the fragment (`#...` never reaches the server);
  *   - lowercase the scheme and host (RFC 3986 §6.2.2.1), NEVER the path
  *     or query (case-significant on most servers);
  *   - strip a leading `www.` and the scheme's default port
  *     (`:80` http / `:443` https);
  *   - strip one trailing slash from a non-root path, drop a bare `/`;
  *   - drop tracking parameters (`utm_*`, `gclid`, `fbclid`, `ref`,
  *     `msclkid`), sort the survivors (param order is not semantic),
  *     re-join; an emptied query drops its `?`.
  *   - `domain` = the last two host labels (a pragmatic registrable-domain
  *     approximation; a public-suffix list is a lookup table the caller
  *     can join on top).
  *
  * Everything is per-row `regexp_extract`/`filter`/`array_sort` codegen —
  * ZERO shuffle at any corpus size; regexes avoid lookahead/backrefs so
  * Java regex (Spark) and RE2 (DuckDB oracles) read them identically.
  * No direct reference counterpart (the reference's crawler fetches but
  * never canonicalizes); training-data-pipeline extension per the
  * builder prompt.
  */
object UrlOps {

  private val trackingRe = "^(utm_|gclid=|fbclid=|ref=|msclkid=)"

  /** The canonical URL as a Column expression. */
  def canonicalCol(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val host0 = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val path = regexp_extract(pathq, "^([^?]*)", 1)
    val pathNorm = when(path === "/", lit(""))
      .otherwise(regexp_replace(path, "/$", ""))
    val query = regexp_extract(pathq, "\\?(.*)", 1)
    val params = filter(split(query, "&"),
      x => x =!= "" && !x.rlike(trackingRe))
    val sortedQ = array_join(array_sort(params), "&")
    // a scheme-less string is not a URL: only the fragment strip applies
    // (deterministic pass-through beats inventing a "://host" form)
    when(scheme === "", noFrag).otherwise(
      concat(scheme, lit("://"), host, pathNorm,
        when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ))))
  }

  /** Canonical host (lowercased, no www., no default port). */
  def hostCol(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host0 = regexp_replace(hostport, "^www\\.", "")
    when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
  }

  /** Last-two-label registrable-domain approximation of the canonical host.
    * The canonical host keeps NON-default ports (`site.com:8080`), so the
    * port is stripped here before the end-anchored label match — otherwise
    * the `:` blocks the match and every ported host groups under `''` in
    * downstream per-domain caps.
    */
  def domainCol(c: Column): Column =
    regexp_extract(regexp_replace(hostCol(c), ":\\d+$", ""),
      "([^.:]+\\.[^.:]+)$", 1)

  /** Adds `url_canon`, `host`, `domain` next to `urlCol`; all other
    * columns pass through. Null URLs yield null outputs.
    */
  def canonicalize(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("url_canon", canonicalCol(col(urlCol)))
      .withColumn("host", hostCol(col(urlCol)))
      .withColumn("domain", domainCol(col(urlCol)))
}
