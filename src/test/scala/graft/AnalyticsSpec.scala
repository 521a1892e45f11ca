package graft

import graft.analytics._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (String, Long, String, String)*) =
    rows.toDF("visitorid", "epoch", "event", "itemid")
      .selectExpr("visitorid", "CAST(epoch AS TIMESTAMP) AS event_time", "event", "itemid")

  test("funnel counts membership, not order (reference quirk A4)") {
    // session is [purchase, view] — out of funnel order, still counts for both
    val df = events(
      ("u1", 100L, "purchase", "i1"),
      ("u1", 200L, "view", "i2"))
    val out = Funnel.counts(Sessionize(df), Seq("view", "click", "purchase")).collect().head
    assert(out.getAs[Long]("n_view") === 1L)
    assert(out.getAs[Long]("n_click") === 0L)
    assert(out.getAs[Long]("n_purchase") === 1L)
  }

  test("ordered funnel requires step order; membership funnel does not") {
    // session is [purchase, view]: membership counts both; ordered counts only view
    val df = events(
      ("u1", 100L, "purchase", "i1"),
      ("u1", 200L, "view", "i2"))
    val ordered = Funnel.orderedCounts(Sessionize(df), Seq("view", "click", "purchase"))
      .collect().head
    assert(ordered.getAs[Long]("n_view") === 1L)
    assert(ordered.getAs[Long]("n_click") === 0L)
    assert(ordered.getAs[Long]("n_purchase") === 0L)  // purchase BEFORE view -> not counted
    // full in-order journey counts all three
    val ok = events(("u2", 1L, "view", "a"), ("u2", 2L, "click", "b"), ("u2", 3L, "purchase", "c"))
    val o2 = Funnel.orderedCounts(Sessionize(ok), Seq("view", "click", "purchase")).collect().head
    assert((o2.getAs[Long]("n_view"), o2.getAs[Long]("n_click"), o2.getAs[Long]("n_purchase")) === ((1L, 1L, 1L)))
  }

  test("user path is ordered by event_time with event-name tiebreak (struct sort)") {
    val df = events(
      ("u1", 100L, "view", "i1"),
      ("u1", 100L, "addtocart", "i2"),  // same ts: 'addtocart' < 'view'
      ("u1", 50L, "purchase", "i3"))
    val path = UserPaths(Sessionize(df)).collect().head.getSeq[String](2)
    assert(path === Seq("purchase", "addtocart", "view"))
  }

  test("bounce is per-minute single-event visitors, not per-session (A8 quirk)") {
    val df = events(
      ("u1", 0L, "view", "i1"),      // minute 0: u1 bounces (1 event)
      ("u2", 10L, "view", "i2"),     // minute 0: u2 has 2 events -> no bounce
      ("u2", 20L, "click", "i3"),
      ("u1", 65L, "view", "i4"))     // minute 1: u1 bounces again
    val out = MinuteStats.bounceRate(df).orderBy("minute").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("bounces") === 1L)
    assert(out(0).getAs[Long]("total_users") === 2L)
    assert(out(0).getAs[Double]("bounce_rate") === 0.5)
    assert(out(1).getAs[Long]("bounces") === 1L)
  }

  test("activeUsers counts distinct visitors per minute") {
    val df = events(
      ("u1", 0L, "view", "i1"), ("u1", 5L, "view", "i2"), ("u2", 9L, "view", "i3"))
    val out = MinuteStats.activeUsers(df).collect().head
    assert(out.getAs[Long]("active_users") === 2L)
  }

  test("topItemsRanked keeps k per minute with deterministic tiebreak") {
    val df = events(
      ("u1", 0L, "view", "b"), ("u2", 1L, "view", "b"),
      ("u3", 2L, "view", "a"), ("u4", 3L, "view", "c"))
    val out = Items.topItemsRanked(df, 2).orderBy("rank").collect()
    assert(out.map(_.getAs[String]("itemid")).toSeq === Seq("b", "a")) // count desc, then id asc
  }

  test("ohlcResample: open/close by event time with event_id tiebreak, high/low/volume") {
    import spark.implicits._
    // bucket 0-300 s: three events, two at the SAME timestamp (tie broken
    // by event_id); bucket 300-600 s: one event
    val df = Seq(
      (2L, 10L * 1000000000L, "view", 5.0),
      (1L, 10L * 1000000000L, "view", 7.0),  // same ts, lower event_id → open
      (3L, 250L * 1000000000L, "view", 1.0), // latest → close
      (9L, 400L * 1000000000L, "view", 4.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = MinuteStats.ohlcResample(df).orderBy("bucket_start").collect()
    assert(out.length === 2)
    val b0 = out.head
    assert(b0.getAs[Long]("bucket_start") === 0L)
    assert(b0.getAs[Double]("open_value") === 7.0)  // event_id 1 wins the ts tie
    assert(b0.getAs[Double]("close_value") === 1.0)
    assert(b0.getAs[Double]("high_value") === 7.0 && b0.getAs[Double]("low_value") === 1.0)
    assert(b0.getAs[Long]("n_events") === 3L && b0.getAs[Double]("sum_value") === 13.0)
    assert(out(1).getAs[Long]("bucket_start") === 300L)
  }

  test("minuteAnomaly: exact z-scores from integer count moments") {
    // three minutes with counts 1, 2, 3 → mean 2, var (1+0+1)/3, std sqrt(2/3)
    val df = events(
      ("u1", 10L, "view", "i1"),
      ("u1", 70L, "view", "i2"), ("u2", 80L, "view", "i3"),
      ("u1", 130L, "view", "i4"), ("u2", 140L, "view", "i5"), ("u3", 150L, "view", "i6"))
    val out = MinuteStats.minuteAnomaly(df).orderBy("minute").collect()
    val std = math.sqrt(14.0 / 3.0 - 4.0)
    assert(out.map(_.getAs[Long]("events_count")).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Double]("z")).toSeq === Seq(-1.0 / std, 0.0, 1.0 / std))
    assert(out.forall(_.getAs[Double]("stddev_pop") === std))
  }

  test("gapHistogram: integer minute buckets with cap, exact shares") {
    // gaps for u1: 30 s (bucket 0), 90 s (bucket 1), 4000 s (capped → 60)
    val df = events(
      ("u1", 0L, "view", "a"), ("u1", 30L, "view", "b"),
      ("u1", 120L, "view", "c"), ("u1", 4120L, "view", "d"))
    val got = Sessionize.gapHistogram(Sessionize(df)).orderBy("gap_minutes").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((0, 1L, 1.0 / 3.0), (1, 1L, 1.0 / 3.0), (60, 1L, 1.0 / 3.0)))
  }

  test("minuteAnomaly: perfectly uniform traffic yields NULL z, not a division error") {
    val df = events(
      ("u1", 10L, "view", "i1"), ("u1", 70L, "view", "i2"), ("u1", 130L, "view", "i3"))
    val out = MinuteStats.minuteAnomaly(df).collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[Double]("stddev_pop") === 0.0))
    assert(out.forall(r => r.isNullAt(r.fieldIndex("z"))))
  }

  test("itemCooccurrence: pair counts, per-item totals, lift") {
    // users 1,2 share items {10,20}; user 3 has {10,30} → only (10,20) has 2 users
    val ev = Seq(
      (1L, """{"k": 10}"""), (1L, """{"k": 20}"""), (1L, """{"k": 10}"""),
      (2L, """{"k": 10}"""), (2L, """{"k": 20}"""),
      (3L, """{"k": 10}"""), (3L, """{"k": 30}"""), (4L, "{}")
    ).toDF("user_id", "props")
    val out = Cooccur.itemCooccurrence(ev).collect()
    assert(out.length === 1)
    val r = out.head
    // lift = both·N / (users1·users2) = 2·3 / (3·2) = 1.0
    assert((r.getAs[Long]("k1"), r.getAs[Long]("k2"), r.getAs[Long]("both_users"),
      r.getAs[Long]("users1"), r.getAs[Long]("users2"), r.getAs[Double]("lift")) ===
      ((10L, 20L, 2L, 3L, 2L, 1.0)))
  }

  test("itemCooccurrence: per-user item cap keeps the smallest ids") {
    val ev = Seq(
      (1L, """{"k": 10}"""), (1L, """{"k": 20}"""), (1L, """{"k": 30}"""),
      (2L, """{"k": 10}"""), (2L, """{"k": 20}"""), (2L, """{"k": 30}"""))
      .toDF("user_id", "props")
    // cap 2 → both users keep {10,20}; (10,30)/(20,30) disappear
    val got = Cooccur.itemCooccurrence(ev, maxItemsPerUser = 2)
      .select("k1", "k2").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((10L, 20L)))
  }

  test("abTestEngagement: totals add up, means and z-sign are consistent") {
    // per-user event counts 1 or 2 — variance within each hash variant
    val df = events((1 to 40).flatMap { i =>
      Seq((s"u$i", 100L + i, "view", s"v$i")) ++
        (if (i % 3 == 0) Seq((s"u$i", 200L + i, "purchase", s"p$i")) else Nil)
    }: _*)
    val r = graft.relational.Relational.abTestEngagement(df).collect()
    assert(r.length === 1)
    val row = r.head
    val (n0, s0, n1, s1) = (row.getAs[Long]("n0"), row.getAs[Long]("s0"),
      row.getAs[Long]("n1"), row.getAs[Long]("s1"))
    assert(n0 + n1 === 40L)
    assert(s0 + s1 === 53L) // 40 views + 13 purchases
    assert(row.getAs[Double]("mean0") === s0.toDouble / n0.toDouble)
    assert(row.getAs[Double]("mean1") === s1.toDouble / n1.toDouble)
    val z = row.getAs[Double]("z")
    assert(math.signum(z) === math.signum(s0.toDouble / n0 - s1.toDouble / n1))
  }

  test("ewmaMinuteCounts: exact left-to-right fold per (event, day)") {
    // one event-type, one day, minute counts [1, 2, 3]
    val df = events(
      ("u1", 10L, "view", "i1"),
      ("u1", 70L, "view", "i2"), ("u2", 80L, "view", "i3"),
      ("u1", 130L, "view", "i4"), ("u2", 140L, "view", "i5"), ("u3", 150L, "view", "i6"))
    val out = MinuteStats.ewmaMinuteCounts(df).collect()
    assert(out.length === 1)
    // fold: 0 → .2·1 → .2·2+.8·.2 → .2·3+.8·(…)
    val expected = List(1.0, 2.0, 3.0).foldLeft(0.0)((acc, x) => 0.2 * x + 0.8 * acc)
    assert(out.head.getAs[Int]("n_minutes") === 3)
    assert(out.head.getAs[Double]("ewma") === expected)
  }

  test("windowFunnel: strict order, strict time increase, window anchored on first step") {
    val df = events(
      // u1: full chain inside window
      ("u1", 100L, "view", "a"), ("u1", 200L, "click", "b"), ("u1", 300L, "purchase", "c"),
      // u2: click before view → depth 1 (strictly-after rule)
      ("u2", 100L, "view", "d"), ("u2", 50L, "click", "e"),
      // u3: purchase outside the 1800 s window of first view → depth 2
      ("u3", 100L, "view", "f"), ("u3", 200L, "click", "g"), ("u3", 2000L, "purchase", "h"),
      // u4: purchase without click → depth 1 (ordered, unlike membership funnel)
      ("u4", 100L, "view", "i"), ("u4", 200L, "purchase", "j"),
      // u5: no view at all → absent from output
      ("u5", 100L, "click", "k"))
    val got = Funnel.windowFunnel(df).orderBy("visitorid").collect()
      .map(r => (r.getAs[String]("visitorid"), r.getAs[Int]("depth"))).toSeq
    assert(got === Seq(("u1", 3), ("u2", 1), ("u3", 2), ("u4", 1)))
  }

  test("revenueConcentration: monotone cumulative share, consistent top-80 flag") {
    val out = graft.relational.Relational
      .revenueConcentration(spark, "/root/testdata/sf0.001").orderBy("rank").collect()
    assert(out.nonEmpty)
    val shares = out.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-9)
    // revenue is ranked descending
    val revs = out.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(out.forall(r =>
      (r.getAs[Int]("in_top80") == 1) == (r.getAs[Double]("cum_share") <= 0.8)))
  }

  test("windowFunnel property: equals the brute-force chain on random event streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genEvs: Gen[List[(Int, Long, String)]] = for {
      n <- Gen.choose(5, 60)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1, 6)
        t <- Gen.choose(1L, 5000L)
        e <- Gen.oneOf("view", "click", "purchase")
      } yield (u, t, e))
    } yield evs
    val W = 1800L
    (0 until 10).foreach { i =>
      val evs = genEvs(Gen.Parameters.default, Seed(11L + i)).getOrElse(Nil).distinct
      val df = events(evs.zipWithIndex.map { case ((u, t, e), idx) =>
        (s"u$u", t, e, s"i$idx") }: _*)
      val got = Funnel.windowFunnel(df).collect()
        .map(r => r.getAs[String]("visitorid") -> r.getAs[Int]("depth")).toMap
      val want = evs.groupBy(_._1).flatMap { case (u, es) =>
        val views = es.filter(_._3 == "view").map(_._2)
        if (views.isEmpty) None
        else {
          val t1 = views.min
          val t2 = es.filter(e => e._3 == "click" && e._2 > t1 && e._2 <= t1 + W)
            .map(_._2).minOption
          val t3 = t2.flatMap(c => es.filter(e =>
            e._3 == "purchase" && e._2 > c && e._2 <= t1 + W).map(_._2).minOption)
          Some(s"u$u" -> (if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1))
        }
      }
      assert(got === want, s"iteration $i")
    }
  }

  test("newVsReturning: first-seen day is new, later active days return") {
    val day = 86400L
    val df = events(
      ("u1", 10L, "view", "a"), ("u1", 20L, "view", "b"), // day 0, counted once
      ("u1", day + 10L, "view", "c"), // day 1 returning
      ("u2", day + 20L, "view", "d")) // day 1 new
    val got = Cohorts.newVsReturning(df).orderBy("day").collect()
      .map(r => (r.getAs[Long]("active_visitors"), r.getAs[Long]("new_visitors"),
        r.getAs[Long]("returning_visitors"))).toSeq
    assert(got === Seq((1L, 1L, 0L), (2L, 1L, 1L)))
  }

  test("funnelDropoff: reached counts are cumulative-from-depth, rates exact") {
    // same fixture as the windowFunnel test: depths 3, 1, 2, 1
    val df = events(
      ("u1", 100L, "view", "a"), ("u1", 200L, "click", "b"), ("u1", 300L, "purchase", "c"),
      ("u2", 100L, "view", "d"), ("u2", 50L, "click", "e"),
      ("u3", 100L, "view", "f"), ("u3", 200L, "click", "g"), ("u3", 2000L, "purchase", "h"),
      ("u4", 100L, "view", "i"), ("u4", 200L, "purchase", "j"))
    val got = Funnel.funnelDropoff(df).orderBy("step").collect()
    assert(got.map(r => (r.getAs[Int]("step"), r.getAs[Long]("reached"))).toSeq ===
      Seq((1, 4L), (2, 2L), (3, 1L)))
    assert(got.head.getAs[Double]("conversion_rate") === 0.5)
    assert(got(1).getAs[Double]("conversion_rate") === 0.5)
    assert(got(2).isNullAt(got(2).fieldIndex("conversion_rate")))
  }

  test("Profiler.profile: exact per-column row/null/distinct counts in one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (None, Some("a")), (Some(2L), Some("b"))
    ).toDF("num", "str")
    val got = graft.relational.Profiler.profile(df).orderBy("column_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(("num", 4L, 1L, 2L), ("str", 4L, 1L, 2L)))
  }

  test("conversionLatency: first-view to first-purchase, floor seconds") {
    val df = events(
      ("u1", 100L, "view", "i1"), ("u1", 50L, "purchase", "i0"), // purchase BEFORE view → dropped
      ("u2", 100L, "view", "i2"), ("u2", 400L, "purchase", "i3"),
      ("u2", 900L, "purchase", "i4"), // later purchase ignored (first wins)
      ("u3", 100L, "view", "i5")) // never converts → dropped
    val out = Funnel.conversionLatency(df).collect()
    assert(out.map(r => (r.getAs[String]("visitorid"),
      r.getAs[Long]("seconds_to_convert"))).toSeq === Seq(("u2", 300L)))
  }
}
