package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    *
    * Edge rules (round-10 ADVICE closure): tracking parameters match
    * with OR without a value (`?fbclid` is as much tracking noise as
    * `?fbclid=x`), and a URL with no scheme-host shape (schemeless or
    * relative) canonicalizes to NULL — collapsing every malformed input
    * onto one shared `https://` key would silently merge unrelated
    * documents in dedup, the exact failure the canonical key exists to
    * prevent. Callers treat NULL as "not a fetchable absolute URL".
    */
  def urlCanonicalize(url: Column): Column = {
    val rawHost = urlHost(url)
    val host = regexp_replace(rawHost, "^www\\.", "")
    val path = regexp_replace(urlPath(url), "/$", "")
    val params = filter(split(urlQuery(url), "&"),
      p => !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)(=|$)") && p =!= "")
    val sortedQ = concat_ws("&", array_sort(params))
    when(length(rawHost) === 0, lit(null).cast("string"))
      .otherwise(concat(lit("https://"), host, path,
        when(length(sortedQ) > 0, concat(lit("?"), sortedQ))
          .otherwise(lit(""))))
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

  /** A public-suffix-list-SHAPED rule table (Mozilla-PSL subset, plain
    * rules only — no wildcard/exception entries): the generic and
    * country TLDs, the com/org/net/edu/gov/ac/co/mil second-level
    * registries across the major ccTLDs, and a handful of real 3-label
    * registries (US school districts, AU state education domains). A
    * production deployment replaces this Seq with the full published
    * list — [[registeredDomainPsl]]'s longest-matching-suffix RULE is
    * what the operator pins, and it is the PSL algorithm's.
    */
  val pslSuffixes: Seq[String] = {
    val tlds = Seq("com", "org", "net", "edu", "gov", "mil", "int",
      "info", "biz", "io", "ai", "dev", "app", "co", "uk", "br", "au",
      "jp", "in", "mx", "za", "cn", "ar", "tr", "fr", "de", "it", "nl",
      "es", "pt", "ru", "pl", "se", "no", "fi", "dk", "ch", "at", "be",
      "cz", "gr", "hu", "ie", "il", "kr", "nz", "sg", "th", "tw", "ua",
      "vn", "us", "ca", "eu")
    val second = for {
      a <- Seq("com", "org", "net", "edu", "gov", "ac", "co", "mil")
      c <- Seq("uk", "br", "au", "jp", "in", "mx", "za", "cn", "ar",
        "tr", "nz", "sg", "il", "kr", "th", "tw", "ua", "vn")
    } yield s"$a.$c"
    val third = Seq("k12.ca.us", "k12.ny.us", "k12.tx.us", "cc.ca.us",
      "lib.ca.us", "act.edu.au", "nsw.edu.au", "vic.edu.au", "qld.edu.au",
      "wa.edu.au")
    // the published list's two other rule FORMS, with their canonical
    // examples: a wildcard ('every label directly under ck is a public
    // suffix') and its exception ('except www.ck, which is registrable')
    val special = Seq("*.ck", "!www.ck", "*.kawasaki.jp", "*.kitakyushu.jp")
    tlds ++ second ++ third ++ special
  }

  /** Table-driven registrable domain — the FULL PSL algorithm over a
    * broadcast rule table instead of [[registeredDomain]]'s literal
    * second-level list. `psl` is one `suffix` string column carrying
    * rules in the published list's own syntax: plain rules
    * (`co.uk`), wildcard rules (`*.ck` — every label directly under
    * ck is a public suffix), and exception rules (`!www.ck` — www.ck
    * is registrable despite the wildcard). Matching per the PSL spec:
    *  - a rule matches when the host ends with its labels (the
    *    wildcard's `*` matching exactly one extra label);
    *  - if ANY exception rule matches it prevails; otherwise the
    *    matching rule with the LONGEST effective suffix wins;
    *  - the registrable domain is the effective public suffix plus one
    *    label (for an exception, the exception's own labels — its
    *    suffix is the rule minus the leading label);
    *  - a host that IS a public suffix has no registrable domain →
    *    NULL (it isn't a registration, it's a registry);
    *  - a host matching NO rule falls to the prevailing `*` default
    *    (last label is the suffix) → registrable = last two labels,
    *    NULL for a single-label host.
    * Returns (id, host, registered_domain).
    *
    * Scale shape: candidates are a ≤4-wide map-side explode (array
    * slices of the split host — codegen'd, no regex; rule KEYS are ≤4
    * labels, covering ≤5-label effective suffixes via wildcards), rule
    * normalization is column ops over the broadcast table (the full
    * Mozilla PSL is ~10k rows — kilobytes), and the winner fold is one
    * groupBy(id) max(struct) with map-side partials: one shuffle row
    * per host, the [[Geo.nearestCentroid]] argmin discipline.
    * Corpus-linear at any host cardinality.
    */
  def registeredDomainPsl(hosts: DataFrame, id: Column, host: Column,
                          psl: DataFrame): DataFrame = {
    // normalize rules: (key = literal label tail to equi-join on,
    // kind 0 = plain / 1 = wildcard / 2 = exception)
    val rules = psl.select(col("suffix").as("__rule"))
      .select(
        when(col("__rule").startsWith("!"), expr("substring(__rule, 2)"))
          .when(col("__rule").startsWith("*."),
            expr("substring(__rule, 3)"))
          .otherwise(col("__rule")).as("__key"),
        when(col("__rule").startsWith("!"), lit(2))
          .when(col("__rule").startsWith("*."), lit(1))
          .otherwise(lit(0)).as("__kind"))
    val h = hosts.select(id.as("__id"), host.as("__host"))
    val labels = split(col("__host"), "\\.")
    val n = size(labels)
    def lastK(k: Int): Column = concat_ws(".", slice(labels, -k, k))
    // per host, the last-k label tails with one and two more labels
    // (reg1 serves plain hits, reg2 wildcard hits, the tail itself
    // exception hits)
    val cands = h.select(col("__id"),
        explode(filter(array((1 to 4).map { k =>
          struct(lit(k).as("k"),
            when(n >= k, lastK(k)).otherwise(lit(null)).as("key"),
            when(n >= k + 1, lastK(k + 1)).otherwise(lit(null)).as("reg1"),
            when(n >= k + 2, lastK(k + 2)).otherwise(lit(null)).as("reg2"))
        }: _*), c => c.getField("key").isNotNull)).as("__c"))
      .select(col("__id"), col("__c.k").as("__k"),
        col("__c.key").as("__key"), col("__c.reg1").as("__reg1"),
        col("__c.reg2").as("__reg2"))
    // a wildcard rule only matches when the host HAS the extra label
    // (the tail alone is not a wildcard match)
    val hits = cands.join(broadcast(rules), Seq("__key"))
      .filter(col("__kind") =!= 1 || col("__reg1").isNotNull)
      .select(col("__id"),
        (col("__kind") === 2).cast("int").as("__exc"),
        // effective public-suffix length: plain k, wildcard k+1,
        // exception k−1 (only orders among same-priority hits)
        (col("__k") + when(col("__kind") === 1, 1)
          .when(col("__kind") === 2, -1).otherwise(0)).as("__efflen"),
        when(col("__kind") === 0, col("__reg1"))
          .when(col("__kind") === 1, col("__reg2"))
          .otherwise(col("__key")).as("__reg"))
      .groupBy(col("__id"))
      .agg(max(struct(col("__exc"), col("__efflen"), col("__reg")))
        .as("__best"))
      .select(col("__id"), col("__best.__exc").as("__bexc"),
        col("__best.__reg").as("__breg"))
    h.join(hits, Seq("__id"), "left")
      .select(col("__id").as("id"), col("__host").as("host"),
        when(col("__bexc").isNotNull, col("__breg")) // hit; NULL if host IS a suffix
          .otherwise(when(n >= 2, lastK(2))) // the PSL '*' default rule
          .as("registered_domain"))
  }
}
