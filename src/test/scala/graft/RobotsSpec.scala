package graft

import graft.frontier.Robots
import graft.frontier.Robots.Group
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt parsing + matching per RFC 9309 (groups, longest-match
  * precedence, wildcards, end anchor, crawl-delay extension).
  */
class RobotsSpec extends AnyFunSuite {

  private val body =
    """# robots for example.test
      |User-agent: otherbot
      |Disallow: /
      |
      |User-agent: *
      |Crawl-delay: 0.25
      |Disallow: /private/
      |Disallow: /p/1
      |Allow: /p/12
      |Disallow: /tmp*.bak$
      |
      |User-agent: graftbot
      |User-agent: graftbot-image
      |Disallow: /only-graft
      |Crawl-delay: 2
      |""".stripMargin

  test("groups parse with shared user-agents, comments stripped") {
    val gs = Robots.parse(body)
    assert(gs.length == 3)
    assert(gs(0) == Group(Vector("otherbot"), Vector(), Vector("/"), None))
    assert(gs(1).crawlDelayMs.contains(250L))
    assert(gs(2).agents == Vector("graftbot", "graftbot-image"))
    assert(gs(2).crawlDelayMs.contains(2000L))
  }

  test("group selection: longest prefix match, * fallback (§2.2.1)") {
    val gs = Robots.parse(body)
    assert(Robots.select(gs, "GraftBot/1.0").get.disallow == Vector("/only-graft"))
    assert(Robots.select(gs, "graftbot-image/2").get.agents.contains("graftbot-image"))
    assert(Robots.select(gs, "randombot").get.crawlDelayMs.contains(250L)) // *
    assert(Robots.select(Seq(gs(0)), "randombot").isEmpty) // no * group
  }

  test("longest-match precedence: allow beats shorter disallow, tie → allow (§2.2.2)") {
    val g = Robots.select(Robots.parse(body), "randombot").get
    assert(!Robots.isAllowed(g, "/p/10"))      // /p/1 disallows
    assert(Robots.isAllowed(g, "/p/120"))      // /p/12 allow is longer
    assert(Robots.isAllowed(g, "/p/2"))        // no rule matches
    assert(!Robots.isAllowed(g, "/private/x"))
    val tie = Group(Vector("*"), Vector("/a"), Vector("/a"), None)
    assert(Robots.isAllowed(tie, "/ab")) // equal length → allow
  }

  test("wildcards and end anchor (§2.2.3)") {
    val g = Robots.select(Robots.parse(body), "randombot").get
    assert(!Robots.isAllowed(g, "/tmp/x.bak"))   // /tmp*.bak$ matches
    assert(!Robots.isAllowed(g, "/tmpfile.bak"))
    assert(Robots.isAllowed(g, "/tmp/x.bak.old")) // anchor: not at end
    assert(Robots.matchLen("/a*x$", "/axbx") == 5) // suffix placement, not greedy
    assert(Robots.matchLen("/a*x$", "/axb") == -1)
    assert(Robots.matchLen("/*$", "/anything") == 3)
    assert(Robots.matchLen("/exact$", "/exact") == 7)
    assert(Robots.matchLen("/exact$", "/exactly") == -1)
  }

  test("lenient inputs: empty Disallow matches nothing; rules before any UA go to *") {
    val g1 = Robots.select(Robots.parse("User-agent: *\nDisallow:\n"), "x").get
    assert(Robots.isAllowed(g1, "/anything"))
    val g2 = Robots.select(Robots.parse("Disallow: /secret\n"), "x").get
    assert(!Robots.isAllowed(g2, "/secret/a") && Robots.isAllowed(g2, "/ok"))
    assert(Robots.verdict(null, "x", "/p", 500L) == (true, 500L))
    assert(Robots.verdict("junk line\n%%%\n", "x", "/p", 500L) == (true, 500L))
  }

  test("multiple matching groups MERGE their rules (RFC 9309 §2.2.1)") {
    // two `User-agent: *` blocks: both blocks' rules must apply
    val twoStar = Robots.parse(
      "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\nCrawl-delay: 3\n")
    val g = Robots.select(twoStar, "anybot").get
    assert(!Robots.isAllowed(g, "/a/x") && !Robots.isAllowed(g, "/b/x"))
    assert(Robots.isAllowed(g, "/c"))
    assert(g.crawlDelayMs.contains(3000L))
    // stray rules before any User-agent line (implicit * group) must NOT
    // shadow a later explicit `User-agent: *` group — they merge
    val implicitStar = Robots.parse(
      "Disallow: /early\n\nUser-agent: *\nDisallow: /late\nAllow: /early/ok\n")
    val g2 = Robots.select(implicitStar, "anybot").get
    assert(!Robots.isAllowed(g2, "/early/x") && !Robots.isAllowed(g2, "/late/x"))
    assert(Robots.isAllowed(g2, "/early/ok"))
    // merge is per chosen token: two graftbot groups merge, but the
    // shorter-prefix match and * groups stay out of the merged set
    val specific = Robots.parse(
      "User-agent: graftbot\nDisallow: /g1\n\nUser-agent: graftbot\nDisallow: /g2\n" +
        "\nUser-agent: graft\nDisallow: /short\n\nUser-agent: *\nDisallow: /star\n")
    val g3 = Robots.select(specific, "graftbot/1.0").get
    assert(!Robots.isAllowed(g3, "/g1") && !Robots.isAllowed(g3, "/g2"))
    assert(Robots.isAllowed(g3, "/short") && Robots.isAllowed(g3, "/star"))
  }

  test("applyRawRobots: broadcast cache, allowed rows + delay, absent host allowed") {
    import TestSpark.spark
    import spark.implicits._
    val frontier = Seq(
      ("a.test", "/p/10"), ("a.test", "/p/120"), ("a.test", "/ok"),
      ("b.test", "/p/10"), // no robots for b.test → allowed, default delay
      ("c.test", "/x"))    // robots without * group → allowed (no group selected)
      .toDF("host", "path")
    val robots = Seq(
      ("a.test", body),
      ("c.test", "User-agent: otherbot\nDisallow: /\n")).toDF("host", "body")
    val out = Robots.applyRawRobots(frontier, robots, "graftbot-image/2.0", 1000L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    // graftbot-image group for a.test: only /only-graft disallowed, delay 2000
    assert(out == Seq(
      ("a.test", "/ok", 2000L), ("a.test", "/p/10", 2000L), ("a.test", "/p/120", 2000L),
      ("b.test", "/p/10", 1000L), ("c.test", "/x", 1000L)))
    // forcing the DISTRIBUTED path (size threshold 0) must give the same
    // rows in the same column order — no driver collect of the bodies
    val dist = Robots.applyRawRobots(frontier, robots, "graftbot-image/2.0", 1000L,
      maxBroadcastBytes = 0L)
    assert(dist.columns.toSeq == Seq("host", "path", "crawl_delay_ms"))
    assert(dist.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq == out)
    // and with a default-delay host whose group DISALLOWS: both paths drop it
    val f2 = Seq(("a.test", "/only-graft/secret")).toDF("host", "path")
    assert(Robots.applyRawRobots(f2, robots, "graftbot/1.0", 9L).count() == 0)
    assert(Robots.applyRawRobots(f2, robots, "graftbot/1.0", 9L, 0L).count() == 0)
    // knownBytes bypass: the caller-supplied size picks the path without
    // a count job; rows identical either way
    val kb = Robots.applyRawRobots(frontier, robots, "graftbot-image/2.0", 1000L,
      knownBytes = Some(1L))
    assert(kb.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq == out)
  }

  test("rawRobotsStage: one crawl-lifetime stage, equal to per-call form on both paths") {
    import TestSpark.spark
    import spark.implicits._
    val frontier = Seq(
      ("a.test", "/p/10"), ("a.test", "/ok"), ("b.test", "/p/10"))
      .toDF("host", "path")
    val robots = Seq(("a.test", body)).toDF("host", "body")
    val want = Robots.applyRawRobots(frontier, robots, "graftbot-image/2.0", 1000L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    // broadcast stage (size probe runs ONCE at construction)
    val stageB = Robots.rawRobotsStage(robots, "graftbot-image/2.0", 1000L)
    // distributed stage (threshold forced)
    val stageD = Robots.rawRobotsStage(robots, "graftbot-image/2.0", 1000L,
      maxBroadcastBytes = 0L)
    for (stage <- Seq(stageB, stageD); _ <- 1 to 2) { // reusable across rounds
      assert(stage(frontier).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq == want)
    }
  }
}
