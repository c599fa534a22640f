package graft.io

import java.nio.file.Files

import graft.SparkSpec

/** [[Xls]] — the dependency-free BIFF8 (.xls) source. Round-trip through
  * our own writer (the JDK ships no .xls writer — same fixture posture
  * as parseMp3's hand-assembled headers: the PUBLIC [MS-CFB]/[MS-XLS]
  * layouts are the ground truth, and reader and writer are independent
  * encodings of them), plus hand-built records for the cell types the
  * writer doesn't emit (NUMBER, RK, MULRK, BOOLERR) and totality fuzz.
  */
class XlsSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t.xls").toString

  "Xls" should "round-trip an all-string frame through write + read" in {
    val df = Seq(
      ("U1", "BW", "2026-01-15"),
      ("U2", "MN", ""),
      ("Ü3", "日本語", "naïve")) // non-ASCII through UTF-16LE SST
      .toDF("UIN", "Pay ID", "Calc Date")
    val path = tmp("graft_xls_rt")
    Xls.write(df, path)
    val back = Xls.read(spark, path)
    back.columns.toSeq shouldBe Seq("UIN", "Pay ID", "Calc Date")
    back.collect().map(_.toSeq).toSet shouldBe
      df.collect().map(_.toSeq).toSet
  }

  it should "use the CFB mini stream below the 4096-byte cutoff and the FAT above" in {
    val small = Seq(("a", "b")).toDF("c1", "c2")
    val pSmall = tmp("graft_xls_small")
    Xls.write(small, pSmall)
    Xls.read(spark, pSmall).count() shouldBe 1L
    // ~200 distinct 30-char strings -> SST alone > 4096 bytes (UTF-16)
    val big = (0 until 200).map(i => (s"key_$i" * 5, s"val_$i" * 5))
      .toDF("k", "v")
    val pBig = tmp("graft_xls_big")
    Xls.write(big, pBig)
    val back = Xls.read(spark, pBig)
    back.count() shouldBe 200L
    back.orderBy("k").collect().map(_.getString(0)).toSeq shouldBe
      big.orderBy("k").collect().map(_.getString(0)).toSeq
  }

  it should "decode NUMBER, RK, MULRK and BOOLERR cells from hand-built records" in {
    // hand-assemble a worksheet with every numeric record family, per
    // [MS-XLS] layouts — independent of the writer, which emits only SST
    // strings
    val bo = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bo.write(v & 0xFF); bo.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    def rec(id: Int)(body: => Unit): Unit = {
      val mark = new java.io.ByteArrayOutputStream()
      val saved = bo.toByteArray; bo.reset(); body
      val b = bo.toByteArray; bo.reset(); bo.write(saved, 0, saved.length)
      w16(id); w16(b.length); bo.write(b, 0, b.length); mark.size()
    }
    def bof(dt: Int): Unit = rec(0x0809) {
      w16(0x0600); w16(dt); w16(0); w16(0); w32(0); w32(0)
    }
    // globals: BOF, BOUNDSHEET (position back-patched), SST(header), EOF
    bof(0x0005)
    val bsAt = bo.size()
    rec(0x0085) { w32(0); w16(0); bo.write(2); bo.write(0)
      bo.write('h'); bo.write('x') }
    rec(0x00FC) { w32(2); w32(2)
      w16(1); bo.write(0); bo.write('n') // compressed "n"
      w16(1); bo.write(0); bo.write('m') }
    rec(0x000A) {}
    val sheetAt = bo.size()
    bof(0x0010)
    rec(0x00FD) { w16(0); w16(0); w16(0); w32(0) } // header A1 = "n"
    rec(0x00FD) { w16(0); w16(1); w16(0); w32(1) } // header B1 = "m"
    rec(0x0203) { w16(1); w16(0); w16(0) // NUMBER A2 = 2.5
      val bits = java.lang.Double.doubleToLongBits(2.5)
      (0 until 8).foreach(j => bo.write(((bits >> (8 * j)) & 0xFF).toInt)) }
    rec(0x027E) { w16(1); w16(1); w16(0); w32((100 << 2) | 0x02) } // RK B2 = 100
    rec(0x00BD) { w16(2); w16(0) // MULRK A3:B3 = -7, 1.23 (int/100)
      w16(0); w32((-7 << 2) | 0x02)
      w16(0); w32((123 << 2) | 0x03)
      w16(1) }
    rec(0x0205) { w16(3); w16(0); w16(0); bo.write(1); bo.write(0) } // TRUE A4
    rec(0x000A) {}
    val wb = bo.toByteArray
    // back-patch the BOUNDSHEET stream position
    wb(bsAt + 4) = (sheetAt & 0xFF).toByte
    wb(bsAt + 5) = ((sheetAt >> 8) & 0xFF).toByte
    wb(bsAt + 6) = ((sheetAt >> 16) & 0xFF).toByte
    wb(bsAt + 7) = ((sheetAt >> 24) & 0xFF).toByte

    val dir = Files.createTempDirectory("graft_xls_num")
    val path = dir.resolve("n.xls").toString
    Files.write(java.nio.file.Paths.get(path), Xls.cfbWrap("Workbook", wb))
    val back = Xls.read(spark, path).orderBy("n").collect()
      .map(r => (r.getString(0), r.getString(1)))
    back.toSet shouldBe Set(
      ("2.5", "100"), // NUMBER keeps its decimal; RK int renders bare
      ("-7", "1.23"), // MULRK: signed int RK + div-100 RK
      ("TRUE", null)) // BOOLERR
  }

  it should "decode FORMULA cells through their cached results" in {
    // pd.read_excel surfaces the last-calculated value of a formula cell,
    // never the formula text — [MS-XLS] 2.4.127 FORMULA carries the cached
    // number inline (or a 0xFFFF-sentinel for bool/error/string, the
    // string arriving in the trailing 2.4.268 STRING record)
    val bo = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bo.write(v & 0xFF); bo.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    def rec(id: Int)(body: => Unit): Unit = {
      val saved = bo.toByteArray; bo.reset(); body
      val b = bo.toByteArray; bo.reset(); bo.write(saved, 0, saved.length)
      w16(id); w16(b.length); bo.write(b, 0, b.length)
    }
    def bof(dt: Int): Unit = rec(0x0809) {
      w16(0x0600); w16(dt); w16(0); w16(0); w32(0); w32(0)
    }
    // formula tail after the 8-byte num: grbit(2) + chn(4) + cce(2)=0
    def formulaTail(): Unit = { w16(0); w32(0); w16(0) }
    bof(0x0005)
    val bsAt = bo.size()
    rec(0x0085) { w32(0); w16(0); bo.write(2); bo.write(0)
      bo.write('h'); bo.write('x') }
    rec(0x00FC) { w32(1); w32(1)
      w16(1); bo.write(0); bo.write('k') } // header column "k"
    rec(0x000A) {}
    val sheetAt = bo.size()
    bof(0x0010)
    rec(0x00FD) { w16(0); w16(0); w16(0); w32(0) } // header A1 = "k"
    rec(0x0006) { w16(1); w16(0); w16(0) // A2: cached number 41.5
      val bits = java.lang.Double.doubleToLongBits(41.5)
      (0 until 8).foreach(j => bo.write(((bits >> (8 * j)) & 0xFF).toInt))
      formulaTail() }
    rec(0x0006) { w16(2); w16(0); w16(0) // A3: cached string "net pay"
      bo.write(0x00); bo.write(0); bo.write(0); bo.write(0)
      bo.write(0); bo.write(0); w16(0xFFFF)
      formulaTail() }
    rec(0x0207) { w16(7); bo.write(0) // compressed STRING "net pay"
      "net pay".foreach(c => bo.write(c.toInt)) }
    rec(0x0006) { w16(3); w16(0); w16(0) // A4: cached boolean TRUE
      bo.write(0x01); bo.write(0); bo.write(1); bo.write(0)
      bo.write(0); bo.write(0); w16(0xFFFF)
      formulaTail() }
    rec(0x0006) { w16(4); w16(0); w16(0) // A5: cached error #DIV/0! -> null
      bo.write(0x02); bo.write(0); bo.write(0x07); bo.write(0)
      bo.write(0); bo.write(0); w16(0xFFFF)
      formulaTail() }
    rec(0x0006) { w16(5); w16(0); w16(0) // A6: cached empty string
      bo.write(0x03); bo.write(0); bo.write(0); bo.write(0)
      bo.write(0); bo.write(0); w16(0xFFFF)
      formulaTail() }
    rec(0x000A) {}
    val wb = bo.toByteArray
    wb(bsAt + 4) = (sheetAt & 0xFF).toByte
    wb(bsAt + 5) = ((sheetAt >> 8) & 0xFF).toByte
    wb(bsAt + 6) = ((sheetAt >> 16) & 0xFF).toByte
    wb(bsAt + 7) = ((sheetAt >> 24) & 0xFF).toByte

    val dir = Files.createTempDirectory("graft_xls_formula")
    val path = dir.resolve("f.xls").toString
    Files.write(java.nio.file.Paths.get(path), Xls.cfbWrap("Workbook", wb))
    val back = Xls.read(spark, path).collect().map(_.getString(0))
    // the error row holds no decoded cell, so (like any all-empty row)
    // it does not materialize — pd.read_excel parity would give NaN there
    back.toSeq shouldBe Seq("41.5", "net pay", "TRUE", "")
  }

  it should "round-trip date-formatted cells as ISO strings (r17 date parity)" in {
    // pd.read_excel surfaces date-FORMATTED numeric cells as datetimes;
    // the adapter's parity contract is ISO strings the E7 coercion parses
    // (round-16 verdict item 3). Writer emits NUMBER + date XF; reader
    // walks XF/FORMAT and renders ISO.
    val df = Seq(
      ("U1", "2026-01-15", "plain"),
      ("U2", "2024-07-04 08:30:00", "2026-02-01"), // datetime + date-in-string-col
      ("U3", "not a date", "x")) // unparseable stays a string cell
      .toDF("UIN", "Calc Date", "Note")
    val path = tmp("graft_xls_dates")
    Xls.write(df, path, dateColumns = Set("Calc Date"))
    val back = Xls.read(spark, path).orderBy("UIN").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    back.toSeq shouldBe Seq(
      ("U1", "2026-01-15", "plain"),
      ("U2", "2024-07-04 08:30:00", "2026-02-01"),
      ("U3", "not a date", "x"))
  }

  it should "detect CUSTOM date formats and honor Date1904 (hand-built records)" in {
    // reader-only path the writer doesn't emit: a FORMAT record defining a
    // custom date code, an XF referencing it, and the 1904 epoch flag
    val bo = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bo.write(v & 0xFF); bo.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    def rec(id: Int)(body: => Unit): Unit = {
      val saved = bo.toByteArray; bo.reset(); body
      val b = bo.toByteArray; bo.reset(); bo.write(saved, 0, saved.length)
      w16(id); w16(b.length); bo.write(b, 0, b.length)
    }
    def bof(dt: Int): Unit = rec(0x0809) {
      w16(0x0600); w16(dt); w16(0); w16(0); w32(0); w32(0)
    }
    bof(0x0005)
    rec(0x0022) { w16(1) } // Date1904
    val bsAt = bo.size()
    rec(0x0085) { w32(0); w16(0); bo.write(2); bo.write(0)
      bo.write('h'); bo.write('x') }
    rec(0x041E) { w16(164); w16(10); bo.write(0) // FORMAT 164 = custom date
      "yyyy-mm-dd".foreach(c => bo.write(c.toInt)) }
    rec(0x041E) { w16(165); w16(5); bo.write(0) // FORMAT 165 = numeric
      "#,##0".foreach(c => bo.write(c.toInt)) }
    rec(0x00E0) { w16(0); w16(0); (0 until 16).foreach(_ => bo.write(0)) } // XF0 General
    rec(0x00E0) { w16(0); w16(164); (0 until 16).foreach(_ => bo.write(0)) } // XF1 custom date
    rec(0x00E0) { w16(0); w16(165); (0 until 16).foreach(_ => bo.write(0)) } // XF2 custom numeric
    rec(0x00FC) { w32(1); w32(1)
      w16(1); bo.write(0); bo.write('d') } // header column "d"
    rec(0x000A) {}
    val sheetAt = bo.size()
    bof(0x0010)
    rec(0x00FD) { w16(0); w16(0); w16(0); w32(0) } // header A1 = "d"
    rec(0x0203) { w16(1); w16(0); w16(1) // A2: NUMBER, custom-date XF, 1904 epoch
      val bits = java.lang.Double.doubleToLongBits(43844.0)
      (0 until 8).foreach(j => bo.write(((bits >> (8 * j)) & 0xFF).toInt)) }
    rec(0x027E) { w16(2); w16(0); w16(2); w32((43844 << 2) | 0x02) } // A3: RK, numeric XF
    rec(0x000A) {}
    val wb = bo.toByteArray
    wb(bsAt + 4) = (sheetAt & 0xFF).toByte
    wb(bsAt + 5) = ((sheetAt >> 8) & 0xFF).toByte
    wb(bsAt + 6) = ((sheetAt >> 16) & 0xFF).toByte
    wb(bsAt + 7) = ((sheetAt >> 24) & 0xFF).toByte
    val dir = Files.createTempDirectory("graft_xls_custfmt")
    val path = dir.resolve("d.xls").toString
    Files.write(java.nio.file.Paths.get(path), Xls.cfbWrap("Workbook", wb))
    val back = Xls.read(spark, path).collect().map(_.getString(0))
    // custom date XF renders ISO under the 1904 epoch; numeric XF stays raw
    back.toSeq shouldBe Seq("2024-01-15", "43844")
  }

  it should "be total on truncation and seeded corruption" in {
    val df = Seq(("a", "1"), ("b", "2")).toDF("x", "y")
    val path = tmp("graft_xls_fuzz")
    Xls.write(df, path)
    val good = Files.readAllBytes(java.nio.file.Paths.get(path))
    val rnd = new scala.util.Random(20260816L)
    def tryRead(b: Array[Byte]): Unit = {
      val p = Files.createTempFile("graft_xls_mut", ".xls")
      Files.write(p, b)
      try Xls.read(spark, p.toString).collect()
      catch { case _: IllegalArgumentException => () } // loud, typed
      finally Files.delete(p)
    }
    // truncations at sector-ish boundaries must not throw raw AIOOBE...
    (0 until good.length by 97).foreach { cut =>
      intercept[Exception] { // ...but ANY orderly exception is acceptable
        tryRead(java.util.Arrays.copyOf(good, cut))
        throw new IllegalStateException("sentinel") // decoded fine: also ok
      }
    }
    // single-byte mutations: reader must never hang or corrupt the JVM —
    // any outcome from clean decode to orderly exception is acceptable
    (0 until 100).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      try tryRead(m) catch { case _: Exception => () }
    }
  }

  it should "reject a payload with no Workbook stream" in {
    val p = Files.createTempFile("graft_xls_bad", ".xls")
    Files.write(p, Array.fill[Byte](1024)(0x5A))
    an[IllegalArgumentException] should be thrownBy
      Xls.read(spark, p.toString)
  }
}
