package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class IoSpec extends SparkSpec {
  import spark.implicits._

  "Sources.catalog" should "list files recursively with name/extension/size metadata" in {
    val root = Files.createTempDirectory("graft_catalog").toFile
    val sub = new java.io.File(root, "nested/deeper"); sub.mkdirs()
    Files.writeString(new java.io.File(root, "PUA_2026.xlsx").toPath, "aaa")
    Files.writeString(new java.io.File(sub, "cert_CPA_bw.csv").toPath, "bbbb")

    val cat = Sources.catalog(spark, root.getAbsolutePath)
    cat.columns shouldBe Array("file_name", "path", "extension", "size", "modified_at")
    val rows = cat.orderBy("file_name").collect()
    rows.map(_.getString(0)) shouldBe Array("PUA_2026.xlsx", "cert_CPA_bw.csv")
    rows.map(_.getString(2)) shouldBe Array(".xlsx", ".csv")
    rows.map(_.getLong(3)) shouldBe Array(3L, 4L)
  }

  it should "support the reference's regex file-pick composed on top (F1/F2/O1)" in {
    val root = Files.createTempDirectory("graft_pick").toFile
    Seq("a_PUA_x.xlsx", "b_CPA_y.xlsx", "notes.txt").foreach(n =>
      Files.writeString(new java.io.File(root, n).toPath, "z"))
    val picked = Sources.catalog(spark, root.getAbsolutePath)
      .filter(col("file_name").rlike("(?i)(^|[\\s_])CPA([\\s_]|$)") &&
        col("extension").isin(".xlsx", ".xls"))
      .orderBy("path").limit(1)
    picked.collect().map(_.getString(0)) shouldBe Array("b_CPA_y.xlsx")
  }

  "Sources.csv + Sinks.singleCsv" should "round-trip with an explicit schema" in {
    val dir = Files.createTempDirectory("graft_csv").toString
    val df = Seq((1L, "a", "2026-01-01"), (2L, "b", "bogus"))
      .toDF("id", "name", "when_str")
    Sinks.singleCsv(df, s"$dir/out")

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("when_str", StringType)))
    val back = Sources.csv(spark, s"$dir/out", schema)
    back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((1L, "a"), (2L, "b"))
    // single-file parity: exactly one part file (reference writes one CSV)
    new java.io.File(s"$dir/out").listFiles().count(_.getName.endsWith(".csv")) shouldBe 1
  }

  "Sinks.parquet" should "write partitioned output" in {
    val dir = Files.createTempDirectory("graft_pq").toString
    val df = Seq((1, "A"), (2, "B"), (3, "A")).toDF("id", "part_key")
    Sinks.parquet(df, s"$dir/out", partitionBy = Seq("part_key"))
    val back = spark.read.parquet(s"$dir/out")
    back.count() shouldBe 3
    new java.io.File(s"$dir/out").listFiles().map(_.getName)
      .count(_.startsWith("part_key=")) shouldBe 2
  }

  "Sinks.bucketedTable" should "join two co-bucketed tables with zero exchanges" in {
    import spark.implicits._
    val facts = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val dims = (1 to 50).map(i => (i.toLong, s"d$i")).toDF("k", "d")
    // the metastore is per-JVM but table locations persist on disk; clear
    // leftovers from prior runs or saveAsTable fails with LOCATION_ALREADY_EXISTS
    Seq("bt_facts", "bt_dims").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Sinks.bucketedTable(facts, "bt_facts", "k", 4)
    Sinks.bucketedTable(dims, "bt_dims", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val joined = spark.table("bt_facts").join(spark.table("bt_dims"), "k")
      joined.count() shouldBe 50
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange" // bucket layout replaces the shuffle
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  "jsonLines" should "round-trip with an explicit schema and trap corrupt rows" in {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Sinks.jsonLines(df, s"$dir/out")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val back = Sources.jsonLines(spark, s"$dir/out", schema)
    back.orderBy("id").as[(Long, String)].collect() shouldBe Array(1L -> "a", 2L -> "b")

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "bad.json"), "{\"id\": 1, \"name\": \"x\"}\nnot json\n")
    // Spark refuses to evaluate plans that touch ONLY the corrupt-record
    // column (count() does) — collect the full rows instead
    val rows = Sources.jsonLines(spark, s"$dir/bad.json",
        schema.add("_corrupt_record", StringType))
      .select("id", "name", "_corrupt_record").collect()
    rows.length shouldBe 2
    rows.count(_.getAs[String]("_corrupt_record") != null) shouldBe 1
  }

  "Sources.orc + Sinks.orc" should "round-trip, partitioned, with pushdown surviving" in {
    val dir = Files.createTempDirectory("graft_orc").toString
    val df = Seq((1L, "A", 10L), (2L, "B", 20L), (3L, "A", 30L))
      .toDF("id", "part_key", "v")
    Sinks.orc(df, s"$dir/out", partitionBy = Seq("part_key"))
    val back = Sources.orc(spark, s"$dir/out")
    back.count() shouldBe 3
    back.filter(org.apache.spark.sql.functions.col("part_key") === "A")
      .select("id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)
    // partition pruning: the filtered scan should touch only the A partition
    val plan = back
      .filter(org.apache.spark.sql.functions.col("part_key") === "A")
      .queryExecution.executedPlan.toString
    withClue(plan) { plan should include("PartitionFilters: [") }
  }

  "Sources.text" should "read line-per-row and wholetext-per-file" in {
    val dir = Files.createTempDirectory("graft_txt")
    Files.writeString(dir.resolve("a.txt"), "line one\nline two\n")
    Files.writeString(dir.resolve("b.txt"), "solo doc\n")
    val lines = Sources.text(spark, dir.toString)
    lines.count() shouldBe 3
    val docs = Sources.text(spark, dir.toString, wholetext = true)
      .collect().map(_.getString(0)).sorted
    docs.length shouldBe 2
    docs.exists(_.contains("line one\nline two")) shouldBe true
  }

  "Sinks.stampedName" should "format the reference's MMDDYYYY stamp" in {
    Sinks.stampedName("PreTAM_PUA", java.time.LocalDate.of(2026, 8, 12), "csv") shouldBe
      "PreTAM_PUA_08122026.csv"
  }
}
