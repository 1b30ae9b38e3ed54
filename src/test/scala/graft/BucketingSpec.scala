package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Co-located joins over bucketed tables: the join on the bucket key must
  * not shuffle either side. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join on the bucket key is exchange-free on both sides") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong, i * 1.5))
      .toDF("k", "id", "v")
    val dims = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", "k", 8, sortCols = Seq("k"))
    Bucketing.writeBucketed(dims, "b_dims", "k", 8, sortCols = Seq("k"))
    try {
      // disable auto-broadcast so the join would otherwise need a shuffle
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Bucketing.table(spark, "b_facts")
          .join(Bucketing.table(spark, "b_dims"), "k")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        assert(joined.count() == 1000)
        // aggregation on the bucket key also reuses the bucketing
        val agg = Bucketing.table(spark, "b_facts").groupBy("k").agg(sum("v"))
        assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
          "group-by on bucket key still shuffles")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
