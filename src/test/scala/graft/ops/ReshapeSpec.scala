package graft.ops

import graft.SparkSpec

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  "renameAll" should "rename present columns and ignore absent ones (pandas rename)" in {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = Reshape.renameAll(df, Map("a" -> "A", "zzz" -> "Z"))
    out.columns shouldBe Array("A", "b")
  }

  "selectExisting" should "keep request order, dropping absent names" in {
    val df = Seq((1, "x", true)).toDF("a", "b", "c")
    Reshape.selectExisting(df, Seq("c", "missing", "a")).columns shouldBe Array("c", "a")
  }

  "orderedProjectWithNulls" should "emit the mapped layout with null-injected columns" in {
    val df = Seq((7, "n")).toDF("src_id", "src_name")
    val out = Reshape.orderedProjectWithNulls(df,
      Seq("ID" -> "src_id", "MIDDLE" -> "absent", "NAME" -> "src_name"))
    out.columns shouldBe Array("ID", "MIDDLE", "NAME")
    val r = out.collect().head
    (r.getInt(0), r.isNullAt(1), r.getString(2)) shouldBe ((7, true, "n"))
    out.schema("MIDDLE").dataType.typeName shouldBe "string"
  }

  "trimHeaders" should "strip header whitespace" in {
    val df = Seq((1, 2)).toDF(" a ", "b\t")
    Reshape.trimHeaders(df).columns shouldBe Array("a", "b")
  }

  "unionHarmonize" should "align by name and null-fill missing columns" in {
    val a = Seq((1, "x")).toDF("id", "only_a")
    val b = Seq(2, 3).toDF("id")
    val out = Reshape.unionHarmonize(Seq(a, b)).orderBy("id")
    out.count() shouldBe 3
    out.collect().map(r => r.isNullAt(1)) shouldBe Array(false, true, true)
  }
}
