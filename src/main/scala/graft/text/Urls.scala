package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed deduplication — the first step of
  * every web-corpus pipeline (C4 and CCNet deduplicate crawl snapshots
  * by canonical URL before any content-level dedup runs).
  *
  * Reference adjacency: the reference's web utilities stop at fetching
  * (`gofast/dataops/management.py:849` scrape); canonical-URL identity
  * is a scale addition the north-star corpus work needs.
  *
  * Scale design: normalization is a chained codegen
  * `regexp_extract`/`regexp_replace` projection — stream-composable,
  * whole-stage codegen, no UDF. Dedup is one groupBy on the canonical
  * URL (map-side combine); the canonical form is computed once in the
  * same stage as the shuffle write. Every pattern sticks to the
  * Java-regex/RE2 shared syntax so external engines replay it
  * verbatim.
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.\\-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)"
  private val TrackRe = "([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*"

  /** Canonical form of a URL:
    *  - fragment dropped (`#…` never reaches the server);
    *  - scheme and host lowercased (case-insensitive per RFC 3986),
    *    path/query case preserved;
    *  - leading `www.` and the scheme's default port (`:80` http,
    *    `:443` https) stripped from the host;
    *  - tracking parameters removed (`utm_*`, `fbclid`, `gclid`)
    *    wherever they sit in the query, separators re-tidied
    *    (`&&`→`&`, `?&`→`?`, dangling `?`/`&` dropped);
    *  - one trailing PATH slash stripped (the query is split off
    *    first, so a query value ending in `/` is never touched).
    *
    * A value that does not parse as `scheme://…` is returned trimmed
    * but otherwise untouched — garbage in a URL column should stay
    * visibly garbage, not silently mutate. */
  def normalizeUrl(u: Column): Column = {
    val t = trim(u)
    val noFrag = regexp_replace(t, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val hostPort = lower(regexp_extract(noFrag, HostRe, 1))
    val tail = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*", "")
    val noWww = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    // path and query normalize independently: slash rules must never
    // rewrite a query value, ampersand rules must never touch a path
    val path = regexp_extract(tail, "^[^?]*", 0)
    val query = regexp_replace(tail, "^[^?]*", "")
    val noTrack = regexp_replace(query, TrackRe, "$1")
    // adjacent removed params leave doubled separators — collapse
    // runs first, then the ?-& boundary, then anything left dangling
    val tidyQ = regexp_replace(regexp_replace(
      regexp_replace(noTrack, "&&+", "&"), "\\?&", "?"), "[?&]$", "")
    val noSlash = regexp_replace(path, "/$", "")
    when(scheme =!= "", concat(scheme, lit("://"), host, noSlash, tidyQ))
      .otherwise(t)
  }

  /** One row per canonical URL: the kept (minimum) id, the duplicate
    * count, and the canonical form itself. The groupBy partial-
    * aggregates map-side, so the shuffle carries one row per distinct
    * canonical URL, not per crawl record. */
  def urlDupGroups(df: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    df.select(col(idCol), normalizeUrl(col(urlCol)).as("url_norm"))
      .groupBy("url_norm")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** The deduplicated frame itself: for each canonical URL keep the
    * row with the smallest id. Implemented as the dup-group aggregate
    * joined back on (canonical, id) — an equi-join Catalyst can
    * broadcast or co-shuffle, never a window over raw crawl order. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    // withColumn REPLACES an existing column, so the scratch canonical
    // column gets a name guaranteed absent from the caller's schema
    val normC = Iterator.iterate("url_norm")(_ + "_")
      .dropWhile(df.columns.toSet).next()
    val withNorm = df.withColumn(normC, normalizeUrl(col(urlCol)))
    val keep = withNorm.groupBy(normC)
      .agg(min(col(idCol)).as(idCol))
    withNorm.join(keep, Seq(normC, idCol)).drop(normC)
  }
}
