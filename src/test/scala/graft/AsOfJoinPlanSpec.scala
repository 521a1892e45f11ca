package graft

import graft.operators.{AsOfJoin, RangeJoin}

/** The custom sort-merge as-of operator vs the union+window composition,
  * plus the binned range join's boundary behavior. */
class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  test("range join: inclusive window bounds, cross-bin matches, no duplicate pairs") {
    // window = 100s; bins are 100s wide
    val left = Seq(("u1", ts(250), "e1")).toDF("k", "t", "ev")
    val right = Seq(
      ("u1", ts(150), "exact-lower"),   // t - 100: included (>=)
      ("u1", ts(149), "below"),         // just outside
      ("u1", ts(199), "cross-bin"),     // bin 1, left is bin 2 - found via replica
      ("u1", ts(250), "exact-upper"),   // == t: included (<=)
      ("u1", ts(251), "above"),         // future: excluded
      ("u2", ts(200), "other-key"))
      .toDF("k", "t", "what")
    val got = RangeJoin(left,
        right.withColumnRenamed("k", "rk").withColumnRenamed("t", "rt"),
        "k", "rk", "t", "rt", windowSeconds = 100)
      .select($"what").collect().map(_.getString(0)).sorted
    assert(got === Array("cross-bin", "exact-lower", "exact-upper"))
  }

  test("range join left-outer fused aggregation: replicas collapse, unmatched rows keep n=0") {
    import org.apache.spark.sql.functions.{count, max}
    val left = Seq(("u1", ts(250), "e1"), ("u3", ts(999), "e2")).toDF("k", "t", "ev")
    val right = Seq(("u1", ts(200), 7L), ("u1", ts(240), 9L)).toDF("rk", "rt", "okey")
    val got = RangeJoin.leftJoinReplicated(left, right, "k", "rk", "t", "rt",
        windowSeconds = 100)
      .groupBy($"ev").agg(count($"okey").as("n"), max($"okey").as("mx"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    // e1 matched both orders exactly once despite its two bin replicas;
    // e2 (no right rows at all) still surfaces, with a zero count
    assert(got === Map("e1" -> ((2L, 9L)), "e2" -> ((0L, -1L))))
  }

  test("fused range-join query scans the events table exactly once") {
    val df = graft.relational.Relational.eventsWithRecentOrders(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val eventScans = plan.linesIterator
      .count(l => l.contains("FileScan") && l.contains("events"))
    assert(eventScans === 1, plan.take(2000))
  }

  test("range join rejects mixed time types (misaligned bin axes) with a clear error") {
    val left = Seq(("u1", ts(250), "e1")).toDF("k", "t", "ev")
    val right = Seq(("u1", ts(150), "r1")).toDF("rk", "rt", "what")
      .withColumn("rt", $"rt".cast("timestamp_ntz")) // NTZ vs left's instant
    val e = intercept[IllegalArgumentException] {
      RangeJoin(left, right, "k", "rk", "t", "rt", windowSeconds = 100)
    }
    assert(e.getMessage.contains("share one timestamp type"))
  }

  private def frames() = {
    val left = Seq(
      ("u1", ts(100), "e1"), ("u1", ts(300), "e2"), ("u1", ts(500), "e3"),
      ("u2", ts(250), "e4"),
      ("u3", ts(999), "e5")) // u3 has no right rows at all
      .toDF("k", "t", "ev")
    val right = Seq(
      ("u1", ts(90), "r1"), ("u1", ts(300), "r2"), ("u1", ts(450), "r3"),
      ("u2", ts(260), "r4")) // after u2's only left row
      .toDF("k", "t", "payload")
    (left, right)
  }

  test("exec output survives collect() without a projection on top (UnsafeRow contract)") {
    val (left, right) = frames()
    val exec = AsOfJoin.planBased(
      left, right.withColumnRenamed("k", "rk").withColumnRenamed("t", "rt"),
      "k", "rk", "t", "rt")
    // no select(): collect casts rows to UnsafeRow internally
    assert(exec.collect().length === 5)
    // downstream aggregation must not re-shuffle (partitioning forwarded)
    val agg = exec.groupBy("k").count()
    val nExchanges = agg.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(nExchanges <= 2, agg.queryExecution.executedPlan.toString.take(800))
  }

  test("mismatched time types are rejected, not silently compared") {
    val (left, right) = frames()
    val dateRight = right.withColumnRenamed("k", "rk")
      .withColumn("rt", org.apache.spark.sql.functions.col("t").cast("date"))
    val ex = intercept[Exception] {
      AsOfJoin.planBased(left, dateRight, "k", "rk", "t", "rt").collect()
    }
    assert(ex.getMessage.contains("share a type") || ex.getMessage.contains("long-backed"),
      ex.getMessage)
  }

  test("range join: null times on either side match nothing") {
    val left = Seq(
      ("u1", Some(ts(250)), "e1"),
      ("u1", None: Option[java.sql.Timestamp], "e2")) // null left time
      .toDF("k", "t", "ev")
    val right = Seq(
      ("u1", Some(ts(200)), "in-window"),
      ("u1", None: Option[java.sql.Timestamp], "null-time")) // null right time
      .toDF("k", "t", "what")
    val got = RangeJoin(left,
        right.withColumnRenamed("k", "rk").withColumnRenamed("t", "rt"),
        "k", "rk", "t", "rt", windowSeconds = 100)
      .select($"ev", $"what").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("e1", "in-window"))) // null times drop out of the inner join
  }

  test("null times/keys never match: SQL equality semantics, not null==null grouping") {
    val left = Seq(
      (Some("u1"), Some(ts(100)), "e1"),
      (Some("u1"), None: Option[java.sql.Timestamp], "e2"), // null left time
      (None: Option[String], Some(ts(100)), "e3"))          // null left KEY
      .toDF("k", "t", "ev")
    val right = Seq(
      (Some("u1"), None: Option[java.sql.Timestamp], "r0"), // null right time: would sort first and wrongly win as "epoch 0"
      (Some("u1"), Some(ts(90)), "r1"),
      (None: Option[String], Some(ts(90)), "r2"))           // null right KEY: must never match e3
      .toDF("k", "t", "payload")
    for (df <- Seq(
        AsOfJoin.planBased(left, right.withColumnRenamed("k", "rk").withColumnRenamed("t", "rt"),
          "k", "rk", "t", "rt").select($"ev", $"payload"),
        AsOfJoin(left, right, "k", "k", "t", "t").select($"ev", $"asof.payload"))) {
      val got = df.collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toMap
      assert(got === Map("e1" -> "r1", "e2" -> null, "e3" -> null))
    }
  }

  test("plan-based exec selects the custom operator and matches the composition") {
    val (left, right) = frames()
    val exec = AsOfJoin.planBased(
      left, right.withColumnRenamed("k", "rk").withColumnRenamed("t", "rt"),
      "k", "rk", "t", "rt")
    // nodeName renders as "AsOfJoin" (case-class name minus Exec)
    assert(exec.queryExecution.executedPlan.toString.contains("AsOfJoin "))
    val got = exec.select($"ev", $"payload").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toMap
    // e1@100 -> r1@90; e2@300 -> r2@300 (inclusive <=); e3@500 -> r3@450;
    // e4@250 -> no right row yet -> null; e5 -> no rows for key -> null
    assert(got === Map("e1" -> "r1", "e2" -> "r2", "e3" -> "r3",
      "e4" -> null, "e5" -> null))

    val comp = AsOfJoin(left, right, "k", "k", "t", "t")
      .select($"ev", $"asof.payload").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(comp === got)
  }
}
