package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** The SQL-facing surface: a user of the engine can point spark.sql at the
  * same tables (temp views) and registered native functions and get results
  * identical to the DataFrame API formulations. */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def view(name: String): Unit =
    Tables.load(spark, sf, name).createOrReplaceTempView(name)

  test("TPC-H-style aggregation via spark.sql equals the DataFrame plan") {
    view("lineitem")
    val sql = spark.sql(
      """SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val df = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(graft.functions.ExactAgg.sumD(col("l_quantity")).as("qty"))
      .orderBy("l_returnflag").collect()
    assert(sql.toSeq == df.toSeq)
  }

  test("registered native functions are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT slugify('São Paulo') AS slug,
        |  hamming64('ffffffffffffffff', '0000000000000000') AS h""".stripMargin).head()
    assert(r.getString(0) == "sao-paulo")
    assert(r.getLong(1) == 64L)
  }

  test("window + join SQL matches the DataFrame formulation") {
    view("orders"); view("customer")
    val sql = spark.sql(
      """SELECT * FROM (
        | SELECT c_mktsegment, o_orderkey,
        |  row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin).collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val df = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
      .orderBy("c_mktsegment", "rk").collect()
    assert(sql.toSeq == df.toSeq)
  }
}
