package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL operators for web-corpus curation — the RefinedWeb/C4-shaped
  * front door that runs BEFORE any text op: a crawl's document identity
  * is its URL, and the first three decisions a curation pipeline makes
  * (is this a duplicate fetch? which site does it come from? is the
  * site blocklisted?) are URL-string decisions.
  *
  * Everything here is anchored-regex + array arithmetic over the URL
  * string — RE2-common patterns, no lookarounds, no host-language URL
  * parser — so the exact rules replay in any engine (the
  * [[TextAnalysis.htmlVisibleLines]] portability discipline) and the
  * expressions stay inside whole-stage codegen: the whole lane is pure
  * map-side work, corpus-linear with zero shuffle.
  */
object Web {

  /** Lowercased host of an absolute URL (`scheme://host[/…]`); empty
    * string when the URL has no scheme-host shape.
    */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))

  /** Path component (leading `/…`, before `?`/`#`); empty for a bare
    * host URL.
    */
  def urlPath(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  /** Raw query string (between `?` and `#`/end), without the `?`. */
  def urlQuery(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** The canonical form under which duplicate fetches collapse — the
    * standard crawl-dedup normalization:
    *  1. host lowercased, leading `www.` stripped;
    *  2. fragment dropped;
    *  3. tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
    *     `ref`) — they vary per referral, never per document;
    *  4. remaining parameters sorted by name (param order is
    *     presentation, not identity);
    *  5. trailing slash stripped from the path;
    *  6. scheme normalized to https (http/https serve the same
    *     document on the modern web).
    * Two URLs with equal canonical forms are the same fetch target;
    * exact dedup on this column is the crawl-frontier dedup every
    * pipeline runs before fetching, and again before ingestion.
    */
  def urlCanonicalize(url: Column): Column = {
    val host = regexp_replace(urlHost(url), "^www\\.", "")
    val path = regexp_replace(urlPath(url), "/$", "")
    val params = filter(split(urlQuery(url), "&"),
      p => !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=") && p =!= "")
    val sortedQ = concat_ws("&", array_sort(params))
    concat(lit("https://"), host, path,
      when(length(sortedQ) > 0, concat(lit("?"), sortedQ))
        .otherwise(lit("")))
  }

  /** Second-level registries (public-suffix-list-lite) under which the
    * registrable domain spans THREE labels — the handful that cover the
    * overwhelming majority of multi-label suffixes in a web corpus. A
    * production deployment swaps in the full Mozilla PSL as a broadcast
    * lookup; the RULE (longest matching suffix + one label) is what this
    * operator pins.
    */
  val secondLevelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.br", "com.au", "co.jp",
      "co.in", "com.mx", "co.za", "com.cn")

  /** Registrable ("registered") domain of a host: the last two labels,
    * or the last three when the final two are a known second-level
    * registry ([[secondLevelSuffixes]]) — `a.b.example.com` →
    * `example.com`, `news.bbc.co.uk` → `bbc.co.uk`. Hosts with fewer
    * labels pass through unchanged. Callers strip `www.` first if they
    * want the [[urlCanonicalize]] identity. This is the grouping key for
    * per-site statistics and blocklists — a crawl blocklist names
    * registrable domains, not hosts.
    */
  def registeredDomain(host: Column): Column = {
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last2.isin(secondLevelSuffixes: _*) && last3 =!= "", last3)
      .when(last2 =!= "", last2)
      .otherwise(host)
  }
}
