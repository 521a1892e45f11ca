package graft

import graft.ext.TopK

/** Scale-pattern evidence: bounded-state heavy hitters and bucketed
  * (shuffle-free) joins. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("space-saving top-k is exact when capacity covers the hot keys") {
    // skewed stream: key i appears (20 - i) times
    val items = (0 until 20).flatMap(i => Seq.fill(20 - i)(s"k$i"))
    val ds = spark.sparkContext.parallelize(scala.util.Random.shuffle(items), 4).toDS()
    val got = TopK.heavyHitters(ds, k = 5, capacity = 64)
    val want = items.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (key, c) => (-c, key) }.take(5)
    assert(got === want)
  }

  test("bucketed tables join without a shuffle exchange") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables between JVMs but their files
    // persist in the warehouse dir — remove stale locations
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // co-bucketed on the join key: sort-merge join with NO exchange
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"), plan.take(500))
      assert(joined.count() === lineitem.count()) // every lineitem has its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
