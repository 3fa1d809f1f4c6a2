package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Corpus-level text operators added in round 11: C4-style line dedup,
  * temperature mixture weights, distinct-n diversity, Zipf slope. */
class TextCorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gateOnce: value-identical to the direct keep gate, kernel bound once") {
    // gateOnce (r17) exists so a FILTER evaluates a stats kernel once
    // per row instead of once per referenced field (FilterExec has no
    // subexpression elimination; probe-measured 8.7 s vs 1.8 s on the
    // repetition gate at sf0.1). Equivalence on the real fixture corpus
    // across all four gate families, including NULL text. (No
    // empty-string row: a ZERO-WORD doc divides by zero in gopherKeep's
    // mean-word-length ratio under ANSI — identically in the direct and
    // bound forms, a pre-existing property of the published ratio rules;
    // q137 and the ingest tail-inject or pre-filter such docs.)
    val docs = Tables.load(spark, sf001, "documents")
      .select($"doc_id", $"text")
      .unionByName(Seq((-1L, null: String)).toDF("doc_id", "text"))
    def rows(c: org.apache.spark.sql.Column): Seq[Long] =
      docs.filter(c === 1).select($"doc_id").as[Long].collect().toSeq.sorted
    assert(
      rows(TextOps.gateOnce(TextOps.repetitionStats($"text"),
        TextOps.repetitionKeep)) ===
      rows(TextOps.repetitionKeep(TextOps.repetitionStats($"text"))))
    assert(
      rows(TextOps.gateOnce(TextOps.gopherStats($"text"),
        TextOps.gopherKeep(_, 5L, 100000L))) ===
      rows(TextOps.gopherKeep(TextOps.gopherStats($"text"), 5L, 100000L)))
    assert(
      rows(TextOps.gateOnce(TextOps.codeStats($"text"),
        TextOps.stackCodeKeep)) ===
      rows(TextOps.stackCodeKeep(TextOps.codeStats($"text"))))
    assert(
      rows(TextOps.gateOnce(TextOps.licenseDetect($"text"),
        TextOps.licenseKeep)) ===
      rows(TextOps.licenseKeep(TextOps.licenseDetect($"text"))))
    // the per-field values agree too, not just the final decision
    val both = docs.select(
      TextOps.repetitionKeep(TextOps.repetitionStats($"text")).as("a"),
      TextOps.gateOnce(TextOps.repetitionStats($"text"),
        TextOps.repetitionKeep).as("b"))
    assert(both.filter(!($"a" <=> $"b")).count() === 0)
  }

  test("gateOnce: PLAN-SHAPE pin - exactly one kernel per gate filter") {
    // gateOnce works because no current Catalyst rule expands a lambda
    // variable — an optimizer NON-guarantee (VERDICT r17 #3). If a
    // future Spark adds HOF inlining, the 13×-per-row kernel
    // re-evaluation would come back SILENTLY: the value-equality spec
    // above pins results, not evaluation count. This spec makes the
    // regression loud by counting kernel invocations in the OPTIMIZED
    // filter condition. The direct (unbound) forms are asserted
    // multiplied, proving the counter can tell the two shapes apart —
    // if Spark ever grows cross-conjunct subexpression elimination in
    // filters, that assertion (not the gateOnce one) goes red, which is
    // the signal gateOnce can be retired.
    val docs = Tables.load(spark, sf001, "documents")
      .select($"doc_id", $"text")
    def kernelCount(gate: org.apache.spark.sql.Column,
                    kernel: String): Int = {
      val plan = docs.filter(gate === 1).queryExecution.optimizedPlan
      val conds = plan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.toString
      }
      assert(conds.nonEmpty, "expected a Filter in the optimized plan")
      val needle = kernel + "("
      conds.map { c =>
        var i = c.indexOf(needle); var n = 0
        while (i >= 0) { n += 1; i = c.indexOf(needle, i + 1) }
        n
      }.sum
    }
    assert(kernelCount(TextOps.gateOnce(TextOps.repetitionStats($"text"),
      TextOps.repetitionKeep), "repetition_stats") === 1)
    assert(kernelCount(TextOps.gateOnce(TextOps.gopherStats($"text"),
      TextOps.gopherKeep(_, 5L, 100000L)), "gopher_stats") === 1)
    assert(kernelCount(TextOps.gateOnce(TextOps.codeStats($"text"),
      TextOps.stackCodeKeep), "code_stats") === 1)
    // direct forms: one kernel copy per referenced field (13 / 8 / 5)
    assert(kernelCount(TextOps.repetitionKeep(
      TextOps.repetitionStats($"text")), "repetition_stats") === 13)
    assert(kernelCount(TextOps.gopherKeep(
      TextOps.gopherStats($"text"), 5L, 100000L), "gopher_stats") > 1)
    assert(kernelCount(TextOps.stackCodeKeep(
      TextOps.codeStats($"text")), "code_stats") > 1)
  }

  test("lineDedup: first corpus-wide occurrence survives, docs reassemble") {
    val docs = Seq(
      (0L, ""),               // empty text = one empty line, first occurrence
      (1L, "a b c x y z"),    // both lines first occurrences
      (2L, "a b c q"),        // line 0 duplicates doc 1, trailing partial "q"
      (3L, "x y z"),          // duplicates doc 1's second line
      (4L, "a b c x y z")     // every line already seen -> empty doc
    ).toDF("doc_id", "text")
    val out = TextOps.lineDedup(docs, "doc_id", "text", lineTokens = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out === Seq(
      (0L, "", 1L, 1L),            // the empty line is ITS OWN first occurrence
      (1L, "a b c x y z", 2L, 2L),
      (2L, "q", 2L, 1L),
      (3L, "", 1L, 0L),
      (4L, "", 2L, 0L)))
  }

  test("UrlOps: canonicalization, URL dedup, parent-domain blocklist") {
    import graft.functions.UrlOps
    val urls = Seq(
      (1L, "HTTP://www.X.org:80/a/?utm=1#top"),
      (2L, "http://x.org/a"),                 // canonical twin of 1
      (3L, "https://x.org/a"),                // different scheme: distinct
      (4L, "http://x.org/"),                  // bare root keeps its slash… trimmed to host
      (5L, "http://ads.tracker.net/pixel"),
      (6L, "http://sub.ads.tracker.net/p"),   // parent-domain match
      (7L, "http://nottracker.net/fine"),     // suffix must match on LABELS
      (8L, "not a url")
    ).toDF("id", "url")
    val canon = urls.select($"id", UrlOps.urlCanonical($"url").as("c"))
      .as[(Long, String)].collect().toMap
    assert(canon(1L) === "http://x.org/a" && canon(2L) === "http://x.org/a")
    assert(canon(3L) === "https://x.org/a")
    assert(canon(4L) === "http://x.org")
    assert(canon(8L) === null)
    // C4's URL dedup: first crawl (min id) of each canonical URL wins;
    // unparseable URLs pass through
    val kept = UrlOps.dedupByUrl(urls, "url", "id")
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L, 5L, 6L, 7L, 8L))
    // blocklist drops the domain AND its subdomains, never a
    // same-suffix different label, never the bare TLD
    val bl = Seq("Tracker.NET").toDF("domain")
    val surv = UrlOps.dropBlockedDomains(urls, "url", bl)
      .select($"id").as[Long].collect().toSet
    assert(surv === Set(1L, 2L, 3L, 4L, 7L, 8L))
    // review findings, pinned: (a) a NON-default port names a
    // different server — it survives canonicalization and never
    // collides with the default-port twin; (b) tied order values keep
    // exactly ONE row; (c) a NULL order value must not drop the row
    val ports = Seq((1L, "http://x.org:8080/a"), (2L, "http://x.org/a"),
      (3L, "https://x.org:443/a")).toDF("id", "url")
    val pc = ports.select($"id", UrlOps.urlCanonical($"url"))
      .as[(Long, String)].collect().toMap
    assert(pc(1L) === "http://x.org:8080/a")
    assert(pc(2L) === "http://x.org/a")
    assert(pc(3L) === "https://x.org/a")
    val tied = Seq(
      (1L, "http://t.org/p", "2024-03-01"),
      (2L, "http://www.t.org/p", "2024-03-01"),   // same snapshot date
      (3L, "http://u.org/q", null.asInstanceOf[String])
    ).toDF("id", "url", "crawl_date")
    val tkept = UrlOps.dedupByUrl(tied, "url", "crawl_date")
      .select($"id").as[Long].collect().toSet
    assert(tkept.intersect(Set(1L, 2L)).size === 1,
      s"tied order values must keep exactly one: $tkept")
    assert(tkept.contains(3L), "NULL order value must not drop the row")
    // the skew guard is STRUCTURAL: unparseable rows bypass the window
    // (an isnotnull filter sits under it), so the Window operator never
    // sorts the crawl's every-bad-URL rows in one NULL partition
    // (asserted on the analyzed plan: over a LocalRelation fixture the
    // optimizer folds the filter into the scan itself — equally good)
    val dq = UrlOps.dedupByUrl(urls, "url", "id").queryExecution
    val danalyzed = dq.analyzed.toString
    assert(danalyzed.contains("Union"), danalyzed)
    assert(danalyzed.contains("isnotnull(__u_canon"), danalyzed)
    assert(dq.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.forall(_.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("isnotnull(__u_canon") => f
    }.nonEmpty), danalyzed)
    // per-domain cap: k survivors per domain (deterministic draw),
    // other domains and unparseable URLs untouched
    val many = ((1L to 10L).map(i => (i, s"http://big.org/p$i")) ++
      Seq((90L, "http://small.org/x"), (91L, "bad url")))
      .toDF("id", "url")
    val cappedIds = UrlOps.capPerDomain(many, "url", "id", k = 3)
      .select($"id").as[Long].collect().toSet
    assert(cappedIds.count(_ <= 10L) === 3, cappedIds.toString)
    assert(cappedIds.contains(90L) && cappedIds.contains(91L))
    val again2 = UrlOps.capPerDomain(many, "url", "id", k = 3)
      .select($"id").as[Long].collect().toSet
    assert(again2 === cappedIds, "the cap draw must be deterministic")
  }

  test("lexiconHits / dropByLexicon: boundary-exact multi-pattern gate (Aho-Corasick)") {
    import graft.functions.TextOps
    val docs = Seq(
      (1L, "The CLASS is large"),            // "ass" inside a word: NO hit
      (2L, "what an ass... Big  Table stuff"), // word + phrase (case/punct-proof)
      (3L, "bigtable is one word"),          // phrase must not match joined
      (4L, "ass ass ass"),                   // DISTINCT entries, not occurrences
      (5L, "perfectly clean text")
    ).toDF("doc_id", "text")
    val lex = Seq("ass", "Big Table")
    val hits = docs.select($"doc_id", TextOps.lexiconHits($"text", lex).as("h"))
      .as[(Long, Int)].collect().toMap
    assert(hits === Map(1L -> 0, 2L -> 2, 3L -> 0, 4L -> 1, 5L -> 0), hits)
    assert(TextOps.dropByLexicon(docs, "text", lex)
      .select($"doc_id").as[Long].collect().toSet === Set(1L, 3L, 5L))

    // shared-prefix entries exercise the automaton's fail links: after
    // " big deal" fails out of " big table", " table " must still fire
    val lex2 = Seq("big table", "big deal", "table")
    val t2 = Seq((1L, "a big deal on the table"), (2L, "one big table here"))
      .toDF("doc_id", "text")
    val h2 = t2.select($"doc_id", TextOps.lexiconHits($"text", lex2).as("h"))
      .as[(Long, Int)].collect().toMap
    assert(h2 === Map(1L -> 2, 2L -> 2), h2) // doc 2: "big table" AND "table"

    // randomized parity against an independent contains-per-entry
    // reference (fixed seed -> deterministic fixture)
    val rnd = new scala.util.Random(136)
    val vocab = Vector("ass", "class", "big", "table", "deal", "data", "x9")
    val lex3 = Seq("ass", "big table", "deal")
    def norm(s: String) = " " + s.toLowerCase.replaceAll("[^a-z0-9]+", " ") + " "
    val texts = (1 to 60).map(i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val expected = texts.map { case (id, t) =>
      id -> lex3.count(e => norm(t).contains(" " + e.toLowerCase + " "))
    }.toMap
    val got = texts.toDF("doc_id", "text")
      .select($"doc_id", TextOps.lexiconHits($"text", lex3).as("h"))
      .as[(Long, Int)].collect().toMap
    assert(got === expected)

    // the gate is scan-local: no Exchange anywhere in the plan
    val plan = docs.select(TextOps.lexiconHits($"text", lex))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("licenseDetect: SPDX beats prose, BSD clause split, permissive keep set") {
    def det(texts: (String, String)*): Unit = {
      val got = texts.map(_._1).toDF("t")
        .select(TextOps.licenseDetect($"t")).as[String].collect()
      got.zip(texts).foreach { case (g, (t, want)) =>
        assert(g === want, s"text: $t")
      }
    }
    det(
      // an SPDX tag is the machine declaration — it wins even when a
      // DIFFERENT license's prose follows
      ("// SPDX-License-Identifier: GPL-3.0-only\n" +
        "Permission is hereby granted, free of charge", "gpl-3.0-only"),
      ("Permission is hereby granted, free of charge, to any person",
        "mit"),
      ("Licensed under the Apache License, Version 2.0", "apache-2.0"),
      // the 3-clause discriminator is the "neither the name" clause
      ("Redistribution and use in source and binary forms; " +
        "Neither the name of X may be used", "bsd-3-clause"),
      ("Redistribution and use in source and binary forms is permitted",
        "bsd-2-clause"),
      ("under the GNU General Public License, version 3", "gpl-3.0"),
      ("under the GNU General Public License, version 2", "gpl-2.0"),
      ("subject to the Mozilla Public License, v. 2.0", "mpl-2.0"),
      ("Permission to use, copy, modify, and/or distribute this", "isc"),
      ("no license text at all", "none"))
    // keep = The Stack's permissive set; copyleft AND none both fail
    val keeps = Seq("mit", "apache-2.0", "bsd-3-clause", "gpl-3.0",
        "none", "isc").toDF("l")
      .select($"l", TextOps.licenseKeep($"l").as("k"))
      .as[(String, Int)].collect().toMap
    assert(keeps === Map("mit" -> 1, "apache-2.0" -> 1,
      "bsd-3-clause" -> 1, "isc" -> 1, "gpl-3.0" -> 0, "none" -> 0))
    // scan-local: no Exchange in the gate's plan
    val plan = Seq("x").toDF("t")
      .select(TextOps.licenseKeep(TextOps.licenseDetect($"t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("licenseDetect/licenseKeep: SPDX dual-license expressions resolve") {
    // the full expression is captured — not truncated to its first id
    val det = Seq(
      "// SPDX-License-Identifier: MIT OR GPL-2.0-only\ncode",
      "// SPDX-License-Identifier: (MIT OR Apache-2.0) AND ISC\ncode",
      "// SPDX-License-Identifier: Apache-2.0 WITH LLVM-exception\ncode",
      // operators are case-sensitive UPPERCASE per the SPDX spec:
      // tag-adjacent prose must never be swallowed into the expression
      "// SPDX-License-Identifier: MIT and the following text\ncode",
      "// SPDX-License-Identifier: GPL-2.0-or-later\ncode")
      .toDF("t").select(TextOps.licenseDetect($"t")).as[String].collect()
    assert(det.toSeq === Seq(
      "mit or gpl-2.0-only",
      "mit or apache-2.0 and isc",
      "apache-2.0 with llvm-exception",
      "mit",
      "gpl-2.0-or-later"))
    // keep policy: OR keeps iff ANY side is permissive, AND-only iff
    // ALL are, WITH rides its license, unknown ids reject
    val keeps = Seq(
      "mit or gpl-2.0-only" -> 1,
      "gpl-2.0-only or gpl-3.0-only" -> 0,
      "apache-2.0 and mit" -> 1,
      "apache-2.0 and gpl-3.0-only" -> 0,
      "apache-2.0 with llvm-exception" -> 1,
      "gpl-2.0-only with classpath-exception" -> 0,
      "mit or apache-2.0 and isc" -> 1,
      "gpl-2.0-or-later" -> 0,
      "licenseref-custom-internal" -> 0)
    val got = keeps.map(_._1).toDF("l")
      .select($"l", TextOps.licenseKeep($"l").as("k"))
      .as[(String, Int)].collect().toMap
    keeps.foreach { case (l, want) => assert(got(l) === want, l) }
  }

  test("repoLicenseTable + licenseInherit: blobs name the repo, files " +
    "inherit, in-file overrides, broadcast join") {
    val mitText = "Permission is hereby granted, free of charge, to anyone"
    val gplText = "under the GNU General Public License, version 3"
    val apacheText = "Licensed under the Apache License, Version 2.0"
    val files = Seq(
      // repo a: root LICENSE blob (MIT prose)
      ("a", "LICENSE", mitText),
      ("a", "src/x.py", "def f(): pass"),
      // repo b: COPYING blob (GPL-3) + one file with an in-file
      // permissive SPDX override
      ("b", "COPYING", gplText),
      ("b", "src/y.py", "def g(): pass"),
      ("b", "src/z.py", "# SPDX-License-Identifier: Apache-2.0\npass"),
      // repo c: unlicensed
      ("c", "src/w.py", "def h(): pass"),
      // repo d: TWO license blobs -> lexicographically smallest id wins
      ("d", "LICENSE.md", mitText),
      ("d", "COPYING.txt", apacheText),
      ("d", "lib/v.py", "def v(): pass"),
      // a nested path named license is NOT a repo-root blob basename
      // miss: basename match is on the last path segment only
      ("a", "docs/license-notes/readme.py", gplText))
      .toDF("repo", "path", "text")
    val repoLic = TextOps.repoLicenseTable(files, "repo", "path", "text")
      .as[(String, String)].collect().toMap
    assert(repoLic === Map("a" -> "mit", "b" -> "gpl-3.0",
      "d" -> "apache-2.0"))
    val eff = TextOps.licenseInherit(files, TextOps.repoLicenseTable(
        files, "repo", "path", "text"), "repo", "text")
      .select($"path", $"license", $"inherited",
        TextOps.licenseKeep($"license").as("keep"))
      .as[(String, String, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(eff("src/x.py") === (("mit", 1, 1)), "inherits the repo MIT")
    assert(eff("src/y.py") === (("gpl-3.0", 1, 0)), "inherits copyleft")
    assert(eff("src/z.py") === (("apache-2.0", 0, 1)),
      "in-file SPDX overrides the repo's GPL")
    assert(eff("src/w.py") === (("none", 0, 0)), "unlicensed repo")
    assert(eff("lib/v.py") === (("apache-2.0", 1, 1)),
      "two blobs resolve to the lex-smallest id")
    assert(eff("LICENSE") === (("mit", 0, 1)),
      "the blob itself carries in-file evidence")
    assert(eff("docs/license-notes/readme.py")._1 === "gpl-3.0",
      "nested gpl text is in-file evidence for that file only")
    // the inherit join is the broadcast state-join shape
    val plan = TextOps.licenseInherit(files, TextOps.repoLicenseTable(
        files, "repo", "path", "text"), "repo", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("htmlToText / htmlMainContent: extraction, entities, link-density boilerplate") {
    val html =
      """<html><head><title>T</title>
        |<style>.x { color: red }</style>
        |<script>var a = "<p>not text</p>";</script></head>
        |<body>
        |<!-- navigation -->
        |<div><a href="/">Home</a> | <a href="/about">About</a> | <a href="/contact">Contact us</a></div>
        |<h1>City &amp; River</h1>
        |<p>The history of the city begins at the river &#8212; a long
        |story of growth &lt;unescaped&gt; and change.</p>
        |<p>Read <a href="/more">more about the history</a> in our archive
        |of documents and maps.</p>
        |<ul><li><a href="/a">Link a</a></li><li><a href="/b">Link b</a></li></ul>
        |<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>
        |</body></html>""".stripMargin
    val df = Seq(Tuple1(html)).toDF("html")
    val raw = df.select(TextOps.htmlToText($"html")).as[String].head()
    val rawLines = raw.split("\n").toSeq
    // script/style/comment content gone; entities decoded; tags stripped
    assert(!raw.contains("color: red") && !raw.contains("not text"))
    assert(!raw.contains("navigation"))
    assert(rawLines.contains("City & River"))
    assert(raw.contains("the river — a long story"))
    assert(raw.contains("<unescaped>"))
    assert(rawLines.head === "T") // title text flows through raw mode
    // main-content mode: the nav bar (all-anchor), the link list and
    // the footer drop; the two real paragraphs survive — including the
    // one with an inline anchor (its density is under the threshold)
    val main = df.select(TextOps.htmlMainContent($"html"))
      .as[String].head().split("\n").toSeq
    assert(main.exists(_.startsWith("The history of the city")), main)
    assert(main.exists(_.startsWith("Read more about the history")), main)
    assert(!main.exists(_.contains("Home")), main)
    assert(!main.exists(_.contains("Link a")), main)
    assert(!main.exists(_.contains("Terms")), main)
    assert(main.contains("City & River"),
      "3-word heading (the decoded & counts) meets minWords = 3")
    assert(!main.contains("T"), "1-word title is under minWords")
    // malformed input degrades, never throws
    val edge = Seq("<p>ok", "text < 5 and > 3", "<a href='x'", "&#xZZ; &bad;")
      .toDF("html").select(TextOps.htmlToText($"html")).as[String].collect()
    assert(edge(0) === "ok")
    assert(edge(1) === "text < 5 and > 3")
    assert(edge(2) === "")
    assert(edge(3) === "&#xZZ; &bad;")
    // SQL surface parity — the bare 0.5 literal folds as Decimal and
    // must be accepted (the first cut needed a CAST workaround)
    graft.expressions.GraftExtensions.install(spark)
    df.createOrReplaceTempView("html_docs")
    val viaSql = spark.sql(
      "SELECT html_text(html, 3, 0.5) FROM html_docs")
      .as[String].head()
    assert(viaSql === df.select(TextOps.htmlMainContent($"html"))
      .as[String].head())
    // review findings, pinned: (a) legacy UPPERCASE close tags must
    // not swallow the document; (b) '>' inside a quoted attribute must
    // not cut the tag and leak the attribute tail
    val upper = "<SCRIPT>var a=1;</SCRIPT><p>real content stays here</p>"
    assert(Seq(Tuple1(upper)).toDF("h")
      .select(TextOps.htmlToText($"h")).as[String].head()
      === "real content stays here")
    val quoted = "<img alt=\"cats > dogs\" src=x><p>after image</p>" +
      "<a onclick=\"if(a>b)f()\" href=x>link text</a>"
    val qout = Seq(Tuple1(quoted)).toDF("h")
      .select(TextOps.htmlToText($"h")).as[String].head()
    assert(!qout.contains("dogs\"") && !qout.contains("b)f()"), qout)
    assert(qout.split("\n").toSeq === Seq("after image", "link text"), qout)
    // and the anchor tracking survives the quoted '>': the link line
    // is all-anchor, so the density filter still drops it
    val qmain = Seq(Tuple1(quoted)).toDF("h")
      .select(TextOps.htmlMainContent($"h", minWords = 2,
        maxLinkDensity = 0.3)).as[String].head()
    assert(qmain === "after image", qmain)
  }

  test("lineRebuild kernel is value-identical to the HOF mask it replaced") {
    // round 12: the rebuild mask is the fused two-pointer ChunkRebuild
    // (O(chunks + drops)); the retired HOF encoding stays as the
    // parity/probe twin. Edge coverage: untouched doc (byte-identical
    // pass-through), all lines dropped (empty string, not a dropped
    // row), out-of-range and duplicate drop offsets (ignored
    // idempotently — !array_contains semantics), first/last drops.
    val docs = Seq(
      (0L, "a b c d e f g h i"),  // 3 lines of 3
      (1L, "p q r s t u"),        // 2 lines
      (2L, "x y z"),              // 1 line
      (3L, "k l m n o")           // 2 lines (trailing partial)
    ).toDF("doc_id", "text")
    val dropped = Seq(
      (0L, 0L), (0L, 2L),          // first + last of doc 0
      (1L, 0L), (1L, 1L),          // ALL of doc 1
      (3L, 1L), (3L, 1L), (3L, 9L) // duplicate + out-of-range on doc 3
    ).toDF("doc_id", "__ld_idx")
    val kernel = TextOps.lineRebuild(docs, dropped, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    val hof = TextOps.lineRebuildHof(docs, dropped, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(kernel.map(r => (r._1, r._2)) === hof.map(r => (r._1, r._2)),
      s"kernel ${kernel.toSeq} vs HOF ${hof.toSeq}")
    assert(kernel.map(r => (r._1, r._2)).toSeq === Seq(
      (0L, "d e f"), (1L, ""), (2L, "x y z"), (3L, "k l m")))
    // interpreted eval agrees too (the kernel is also the fallback path)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = TextOps.lineRebuild(docs, dropped, "doc_id", "text", 3)
        .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
      assert(interp === kernel)
    } finally spark.conf.unset("spark.sql.codegen.wholeStage")
    // INT-typed drop offsets (posexplode's position type — the real
    // pipeline's shape; reading an int array through getLong was the
    // first cut's bug, caught by the lineDedup fixtures)
    val droppedInt = Seq((0L, 0), (0L, 2), (1L, 0), (1L, 1))
      .toDF("doc_id", "__ld_idx")
    val kernelInt = TextOps.lineRebuild(docs, droppedInt, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(kernelInt.map(r => (r._1, r._2)).toSeq === Seq(
      (0L, "d e f"), (1L, ""), (2L, "x y z"), (3L, "k l m n o")))
  }

  test("lineDedup: intra-document repeats keep only the earliest segment") {
    val docs = Seq((7L, "p q r p q r p q")).toDF("doc_id", "text")
    // lines: "p q r", "p q r", "p q" -> second drops, partial tail distinct
    val out = TextOps.lineDedup(docs, "doc_id", "text", lineTokens = 3)
      .as[(Long, String, Long, Long)].head()
    assert(out === ((7L, "p q r p q", 3L, 2L)))
  }

  test("lineDedup plan: no Window, and NO text column in any Exchange") {
    // AQE off: the exchange inventory is a STATIC plan property, and
    // AdaptiveSparkPlanExec hides exchanges from tree collection until
    // execution
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
      val df = TextOps.lineDedup(docs, "doc_id", "text")
      val plan = df.queryExecution.executedPlan.toString
      // keep-first is the min-priority AGGREGATE, never a window over
      // the line hash — a window would sort the viral key in one task
      assert(!plan.contains("Window"), plan)
      // the q113 contract: corpus text never crosses an exchange — only
      // (id, idx, hash, priority) and the dropped-offset summaries move
      val exchanged = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.child.output.map(_.name)
      }.flatten
      assert(exchanged.nonEmpty)
      assert(!exchanged.exists(n => n == "text" || n.contains("__ld_seg") ||
          n.contains("__ld_chunks") || n.contains("text_dedup")),
        s"text-bearing column in a shuffle: $exchanged")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("lineDedup: id contract enforced — type at analysis, range at scan") {
    val strId = Seq(("k1", "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.lineDedup(strId, "doc_id", "text", lineTokens = 3)
    }
    assert(e.getMessage.contains("integral"))
    // in-range 64-bit ids work; an id at 2^42 would overflow the
    // priority encoding and must die loudly, not mis-order silently
    val big = Seq(((1L << 42) - 1, "a b c"), (1L << 42, "x y z"))
      .toDF("doc_id", "text")
    val ok = TextOps.lineDedup(big.filter($"doc_id" < (1L << 42)),
      "doc_id", "text", lineTokens = 3).collect()
    assert(ok.length === 1)
    val err = intercept[Exception] {
      TextOps.lineDedup(big, "doc_id", "text", lineTokens = 3).collect()
    }
    assert(err.getMessage.contains("2^42") ||
      Option(err.getCause).exists(_.getMessage.contains("2^42")), err.getMessage)
  }

  test("lineDedup: reserved temp column rejected") {
    val bad = Seq((1L, "a", "x")).toDF("doc_id", "text", "__ld_h")
    val e = intercept[IllegalArgumentException] {
      TextOps.lineDedup(bad, "doc_id", "text")
    }
    assert(e.getMessage.contains("__ld_h"))
  }

  test("temperatureWeights: tau=0.5 flattens 9:1 token mass to 3:1") {
    val docs = Seq(("A", 9L), ("B", 1L)).toDF("source", "n_tok")
    val out = TextOps.temperatureWeights(docs, "source", col("n_tok"))
      .orderBy("source")
      .select("source", "mass", "p", "w", "boost")
      .as[(String, Long, Double, Double, Double)].collect()
    val Seq(a, b) = out.toSeq
    assert(a._1 == "A" && a._2 == 9L && math.abs(a._3 - 0.9) < 1e-15)
    // sqrt(0.9) : sqrt(0.1) = 3 : 1 exactly (0.9/0.1 = 9, sqrt exact ratio)
    assert(math.abs(a._4 - 0.75) < 1e-12 && math.abs(b._4 - 0.25) < 1e-12)
    assert(math.abs(a._5 - 0.75 / 0.9) < 1e-12)  // head downsampled
    assert(math.abs(b._5 - 2.5) < 1e-12)         // tail upsampled 2.5x
  }

  test("temperatureWeights: tau=1 is natural sampling, tau=0 is uniform") {
    val docs = Seq(("A", 3L), ("B", 1L), ("C", 4L)).toDF("source", "n_tok")
    val nat = TextOps.temperatureWeights(docs, "source", col("n_tok"), tau = 1.0)
      .select("source", "p", "w").as[(String, Double, Double)].collect()
    nat.foreach { case (_, p, w) => assert(math.abs(p - w) < 1e-12) }
    val uni = TextOps.temperatureWeights(docs, "source", col("n_tok"), tau = 0.0)
      .select("w").as[Double].collect()
    uni.foreach(w => assert(math.abs(w - 1.0 / 3) < 1e-12))
  }

  test("ngramDiversity: exact distinct-1/distinct-2 per source") {
    val docs = Seq(
      ("s1", "a b a"), ("s1", "a"),  // uni [a,b,a,a]; bi ["a b","b a"]
      ("s2", "x")                     // one token, NO bigrams
    ).toDF("source", "text")
    val out = TextOps.ngramDiversity(docs, "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Double, Long, Long, Option[Double])].collect()
    assert(out(0) === (("s1", 4L, 2L, 0.5, 2L, 2L, Some(1.0))))
    assert(out(1) === (("s2", 1L, 1L, 1.0, 0L, 0L, None)))
  }

  test("q128 diversity sketch: merged estimate lands in the 3-sigma bound") {
    val df = graft.queries.TrainingData
      .defs("q128_diversity_sketch")(spark, sf001)
      .as[(String, Long, Long, Int)].collect()
    assert(df.nonEmpty)
    df.foreach { case (src, exact, total, inBound) =>
      assert(exact > 0 && total >= exact)
      assert(inBound === 1, s"sketch out of bound for $src (exact=$exact)")
    }
  }

  test("zipfSlope: two-point regression is exact; degenerate group null") {
    val docs = Seq(
      ("en", "a a a a b b c"), // a=4 b=2 c=1; top-2: (1,4),(2,2)
      ("de", "z z")            // one distinct token -> slope undefined
    ).toDF("lang", "text")
    // topN=2: slope through (ln1,ln4),(ln2,ln2) = (ln2-ln4)/ln2 = -1 exactly
    val out = TextOps.zipfSlope(docs, "lang", "text", topN = 2)
      .orderBy("lang")
      .as[(String, Long, Option[Double])].collect()
    assert(out(0) === (("de", 1L, None)))
    assert(out(1) === (("en", 2L, Some(-1.0))))
  }

  test("zipfSlope: closed form matches an independent local regression") {
    val docs = Seq(("en", "w w w w w w x x x y y z")).toDF("lang", "text")
    // counts w=6 x=3 y=2 z=1 -> ranks 1..4
    val pts = Seq((1.0, 6.0), (2.0, 3.0), (3.0, 2.0), (4.0, 1.0))
      .map { case (r, c) => (math.log(r), math.log(c)) }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val expected = BigDecimal((n * sxy - sx * sy) / (n * sxx - sx * sx))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextOps.zipfSlope(docs, "lang", "text")
      .as[(String, Long, Double)].head()
    assert(got._1 == "en" && got._2 == 4L && got._3 === expected)
  }
}
