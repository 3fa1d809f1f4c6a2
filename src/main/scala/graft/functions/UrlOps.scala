package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation — the filtering stage between the crawl container
  * ([[graft.connectors.Warc]]) and the text pipeline: C4 deduplicates
  * by URL, RefinedWeb filters against domain blocklists and strips
  * tracking noise before content ever parses. All built on Spark's
  * native `try_parse_url`/string expressions — scan-local, codegen'd, no
  * UDFs, so the gates add zero exchanges to a crawl scan (the q130
  * plan argument).
  */
object UrlOps {

  /** Lowercased registrable host ("www." stripped): the blocklist and
    * per-domain-cap key. NULL for unparseable URLs. */
  def urlDomain(url: Column): Column = {
    val host = lower(try_parse_url(url, lit("HOST")))
    when(host.startsWith("www."), expr_stripWww(host)).otherwise(host)
  }

  private def expr_stripWww(host: Column): Column =
    host.substr(lit(5), length(host))

  /** Canonical form for URL-level dedup (C4's unit): lowercase
    * scheme+host, DEFAULT port stripped (`:80` under http, `:443`
    * under https — a NON-default port names a different server and
    * survives), query and fragment dropped, trailing slash trimmed
    * (except the bare root). Two crawls of
    * `HTTP://www.X.org:80/a/?utm=1#top` and `http://x.org/a` collide;
    * `http://x.org:8080/a` does not. */
  def urlCanonical(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))
    val host = urlDomain(url)
    // HOST never carries the port — recover it from AUTHORITY
    // (userinfo@host:port) and keep it unless it is the scheme default
    val port = regexp_extract(
      coalesce(try_parse_url(url, lit("AUTHORITY")), lit("")),
      ":(\\d+)$", 1)
    val portSfx = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = coalesce(try_parse_url(url, lit("PATH")), lit(""))
    val path = when(path0 =!= "/" && path0.endsWith("/"),
        path0.substr(lit(1), length(path0) - 1))
      .otherwise(path0)
    when(host.isNull || scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portSfx,
        when(path === "/", lit("")).otherwise(path)))
  }

  /** Keep the FIRST crawl of each canonical URL — C4's URL dedup —
    * via `row_number` over (orderCol asc NULLS LAST, urlCol): exactly
    * one survivor per canonical key even when order values TIE (two
    * fetches in the same snapshot share a WARC date — a min-equality
    * filter would keep both) or are NULL (a min-equality filter would
    * drop the row). Rows with unparseable URLs pass through untouched
    * (they cannot collide) — and they BYPASS the window entirely: the
    * frame is split and only the parseable side is ranked, because a
    * `when(isNull, 1)` guard does not stop Catalyst from routing every
    * NULL-canonical row through the Window operator's single NULL
    * partition (at crawl scale, 0.1% unparseable of 10^10 URLs is 10^7
    * rows in one sort task — the capPerDomain split shape, applied
    * here too; review-found). Parseable per-key groups are crawl-dup
    * counts — small by nature — so the keep-first window on that side
    * is the P8/q82 shape.
    *
    * CALLER CONTRACT — persist expensive inputs: the null-bypass split
    * means BOTH branches re-evaluate `df`'s lineage (they share no
    * scan), so an un-persisted expensive input (a WARC parse, a REST
    * capture) pays its source cost twice, and a NON-DETERMINISTIC
    * input can diverge between the branches (a row flipping sides
    * would be dropped or doubled). Persist/localCheckpoint upstream —
    * as [[graft.tools.CrawlIngest]] does — before calling. */
  def dedupByUrl(df: DataFrame, urlCol: String, orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u_canon"))
      .orderBy(col(orderCol).asc_nulls_last, col(urlCol))
    val withCanon = df.withColumn("__u_canon", urlCanonical(col(urlCol)))
    val kept = withCanon.filter(col("__u_canon").isNotNull)
      .withColumn("__u_rk", row_number().over(w))
      .filter(col("__u_rk") === 1)
      .drop("__u_rk")
    kept.unionByName(withCanon.filter(col("__u_canon").isNull))
      .drop("__u_canon")
  }

  /** Cap pages PER DOMAIN (RefinedWeb's over-represented-host guard:
    * one forum mirror must not dominate the corpus): each domain keeps
    * at most `k` rows, chosen by the salted deterministic draw — the
    * skew-safe two-level rank of [[TextOps.stratifiedTake]], so a
    * million-page domain never funnels through one task. Rows with
    * unparseable URLs pass through (no domain to cap).
    *
    * Same caller contract as [[dedupByUrl]]: the null-bypass split's
    * two branches re-evaluate the input lineage — persist expensive or
    * non-deterministic inputs before calling. */
  def capPerDomain(df: DataFrame, urlCol: String, idCol: String, k: Int,
                   salt: String = "domain-cap"): DataFrame = {
    val withDom = df.withColumn("__u_dom", urlDomain(col(urlCol)))
    val capped = TextOps.stratifiedTake(
      withDom.filter(col("__u_dom").isNotNull), Seq("__u_dom"),
      idCol, k, salt)
    capped.unionByName(withDom.filter(col("__u_dom").isNull))
      .drop("__u_dom")
  }

  /** Drop rows whose domain (or any parent domain: `ads.x.org` matches
    * a blocklisted `x.org`) is blocklisted. The blocklist is
    * config-sized — it broadcasts; matching is a left-anti join on the
    * EXPLODED suffix set (a domain has ≤ ~6 labels, so the expansion
    * is a small constant, never a per-row loop over the list). */
  def dropBlockedDomains(df: DataFrame, urlCol: String,
                         blocklist: DataFrame): DataFrame = {
    // suffix set excludes the bare TLD (a blocklist never means "all
    // of .org"); greatest(0, …) guards the single-label host, where a
    // raw size−2 = −1 would make sequence() count DOWN
    val suffixes = df.withColumn("__u_dom", urlDomain(col(urlCol)))
      .withColumn("__u_sfx",
        explode_outer(expr(
          """transform(
            |  sequence(0, greatest(0, size(split(__u_dom, '\\.')) - 2)),
            |  i -> array_join(slice(split(__u_dom, '\\.'), i + 1,
            |         size(split(__u_dom, '\\.')) - i), '.'))""".stripMargin)))
    val blocked = suffixes
      .join(broadcast(blocklist.select(lower(col("domain")).as("__u_sfx"))),
        Seq("__u_sfx"), "left_semi")
      .select(col(urlCol)).distinct()
    df.join(blocked, Seq(urlCol), "left_anti")
  }
}
