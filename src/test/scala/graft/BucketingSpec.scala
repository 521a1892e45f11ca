package graft

import org.apache.spark.sql.functions._

import graft.ext.Bucketing

class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed join plan has no Exchange: co-located SortMergeJoin") {
    val li = spark.table(Bucketing.bucketedTable(spark, sf, "lineitem", "l_orderkey"))
      .select(col("l_orderkey"), col("l_extendedprice"))
    val o = spark.table(Bucketing.bucketedTable(spark, sf, "orders", "o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val joined = li.hint("merge").join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
  }

  test("bucketed join result equals the plain shuffled join") {
    val got = Bucketing.bucketedJoinRevenue(spark, sf)
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val want = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("existing bucketed files re-register without a rewrite and keep the no-shuffle join") {
    val t = Bucketing.bucketedTable(spark, sf, "orders", "o_orderkey")
    val path = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-bucketed/$t")
    def newestMtime = path.listFiles().map(_.lastModified).max
    val before = newestMtime
    // a fresh session forgets the in-memory catalog entry but not the
    // files; dropping the EXTERNAL table simulates that here
    spark.sql(s"DROP TABLE $t")
    assert(path.exists(), "external table drop must keep the data files")
    val t2 = Bucketing.bucketedTable(spark, sf, "orders", "o_orderkey")
    assert(t2 === t && spark.catalog.tableExists(t))
    assert(newestMtime === before, "re-registration must not rewrite files")
    // the DDL-registered table still carries the bucket spec: joining it
    // against the bucketed lineitem stays Exchange-free
    val li = spark.table(Bucketing.bucketedTable(spark, sf, "lineitem", "l_orderkey"))
      .select(col("l_orderkey"))
    val o = spark.table(t2).select(col("o_orderkey"), col("o_orderpriority"))
    val plan = li.hint("merge").join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"), plan)
  }

  test("bucketed tables are written once per session and fingerprint-keyed") {
    val t1 = Bucketing.bucketedTable(spark, sf, "orders", "o_orderkey")
    val t2 = Bucketing.bucketedTable(spark, sf, "orders", "o_orderkey")
    assert(t1 === t2 && spark.catalog.tableExists(t1))
    // a different dataset path yields a different table (fingerprint in the name)
    val other = Bucketing.bucketedTable(spark, "/root/testdata/sf0.01", "orders", "o_orderkey")
    assert(other !== t1)
  }
}
