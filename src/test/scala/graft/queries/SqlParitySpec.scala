package graft.queries

import graft.SparkSpec

/** The engine is equally drivable through plain `spark.sql` — the same
  * queries expressed as SQL text over registered views must produce exactly
  * the DataFrame-API results (Catalyst resolves both to the same plans).
  */
class SqlParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def register(): Unit =
    Seq("lineitem", "orders", "customer", "part", "region", "nation", "supplier")
      .foreach(t => spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t))

  "spark.sql" should "match the DataFrame API for a scan+filter query" in {
    register()
    val sql = spark.sql(
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE lower(o_orderstatus) = 'f' ORDER BY o_orderkey""".stripMargin).collect()
    val api = Q.qFilterEq(spark, dir).collect()
    sql shouldBe api
  }

  it should "match the DataFrame API for the lookup join query" in {
    register()
    val sql = spark.sql(
      """SELECT o_orderkey, c_mktsegment
        |FROM orders LEFT JOIN (SELECT DISTINCT c_custkey, c_mktsegment FROM customer) d
        |  ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin).collect()
    val api = Q.qJoinLookupLeft(spark, dir).collect()
    sql shouldBe api
  }

  it should "match the deterministic mode-per-key composition" in {
    register()
    val sql = spark.sql(
      """SELECT c_mktsegment, c_nationkey AS mode_nationkey, cnt
        |FROM (SELECT c_mktsegment, c_nationkey, count(*) AS cnt,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY count(*) DESC, c_nationkey ASC) AS rn
        |      FROM customer WHERE c_nationkey IS NOT NULL
        |      GROUP BY c_mktsegment, c_nationkey)
        |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin).collect()
    val api = Q.qAggModePerKey(spark, dir).collect()
    sql shouldBe api
  }
}
