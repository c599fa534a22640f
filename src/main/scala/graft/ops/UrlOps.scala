package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation: the same page arrives
  * under `HTTP://WWW.Site.COM:80/a/?utm_source=x` and
  * `http://site.com/a` — URL-keyed dedup, per-domain caps, and domain
  * blocklists all need one canonical key first (every CommonCrawl-
  * derived pipeline has this step; see e.g. the C4/RefinedWeb/FineWeb
  * writeups).
  *
  * Rules applied (the conservative, semantics-preserving set):
  *  - scheme and host lowercase; leading `www.` dropped from the host;
  *  - default ports stripped (`:80` for http, `:443` for https), other
  *    ports kept;
  *  - fragment dropped (never sent to the server);
  *  - tracking parameters removed: any `utm_*`, plus `fbclid`/`gclid`;
  *    remaining parameters keep their original order (reordering
  *    changes semantics for duplicate keys);
  *  - trailing `/` dropped from a non-root path; empty path becomes `/`.
  *
  * Everything is built from portable string primitives (regexp_extract /
  * filter / array_join — all codegen'd; the same chain is expressible in
  * any engine with RE2-class regex, which is what makes the query
  * oracle-checkable). Malformed URLs (no scheme://host match) yield
  * null canonical/domain — curation treats them as a quality signal,
  * not an error.
  */
object UrlOps {

  /** scheme://host[:port][path][?query][#fragment] splitter — groups:
    * 1 scheme, 2 host, 3 port, 4 path, 5 query.
    */
  private val UrlRe =
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/:?#]+)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  private def part(u: Column, group: Int): Column = {
    val x = regexp_extract(u, UrlRe, group)
    when(x === "", lit(null)).otherwise(x)
  }

  /** Canonical form per the object rules; null for non-URLs. */
  def canonicalUrl(u: Column): Column = {
    val scheme = lower(part(u, 1))
    val host = regexp_replace(lower(part(u, 2)), "^www\\.", "")
    val port = part(u, 3)
    val keepPort = port.isNotNull &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val rawPath = part(u, 4)
    val path = when(rawPath.isNull, lit("/"))
      .otherwise(when(rawPath =!= "/",
        regexp_replace(rawPath, "/$", "")).otherwise(rawPath))
    val kept = filter(split(part(u, 5), "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=")))
    val query = when(part(u, 5).isNull || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(scheme.isNull || host.isNull, lit(null)).otherwise(
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path, query))
  }

  /** Registrable-domain key (host, lowercased, `www.` stripped) — the
    * per-domain cap / blocklist join key. Null for non-URLs.
    */
  def urlDomain(u: Column): Column =
    regexp_replace(lower(part(u, 2)), "^www\\.", "")
}
