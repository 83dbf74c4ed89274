package graft

import java.io.ByteArrayOutputStream

import graft.sources.Dbf

/** Binary DBF reader/writer: hand-built dBase III bytes (independent of the
  * writer), deleted-row flags, numeric fields, and the distributed
  * write→read round-trip.
  */
class DbfSpec extends SparkSpec {

  import spark.implicits._

  /** Hand-assembled dBase III file: 2 fields (CODE C4, QTY N3), 3 records,
    * the middle one flagged deleted. Built byte-by-byte so the reader is
    * tested against the FORMAT, not against our own writer.
    */
  private def handBuiltDbf(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    def field(name: String, ftype: Char, len: Int, dec: Int): Unit = {
      val nb = name.getBytes("ISO-8859-1")
      out.write(nb); (nb.length until 11).foreach(_ => w8(0))
      w8(ftype); w32(0); w8(len); w8(dec); (0 until 14).foreach(_ => w8(0))
    }
    w8(0x03); w8(99); w8(12); w8(31)          // version, date 1999-12-31
    w32(3)                                     // record count (incl. deleted)
    w16(32 + 32 * 2 + 1); w16(1 + 4 + 3)       // header size, record size
    (0 until 20).foreach(_ => w8(0))
    field("CODE", 'C', 4, 0)
    field("QTY", 'N', 3, 0)
    w8(0x0D)
    def rec(flag: Int, code: String, qty: String): Unit = {
      w8(flag)
      out.write(code.padTo(4, ' ').getBytes("ISO-8859-1"))
      out.write(qty.reverse.padTo(3, ' ').reverse.getBytes("ISO-8859-1"))
    }
    rec(0x20, "AB", "12")
    rec(0x2A, "XX", "99")                      // deleted — must be skipped
    rec(0x20, "CDEF", "7")
    w8(0x1A)
    out.toByteArray
  }

  test("parseHeader and parseRecords decode hand-built dBase III bytes") {
    val bytes = handBuiltDbf()
    val h = Dbf.parseHeader(bytes)
    assert(h.recordCount == 3 && h.recordSize == 8)
    assert(h.fields.map(f => (f.name, f.ftype, f.length)) ==
      Seq(("CODE", 'C', 4), ("QTY", 'N', 3)))
    assert(Dbf.parseRecords(bytes) == Seq(Seq("AB", "12"), Seq("CDEF", "7")))
  }

  test("readDbf scales record decode over files and skips deleted rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dbf-read")
    java.nio.file.Files.write(dir.resolve("a.dbf"), handBuiltDbf())
    val got = Dbf.readDbf(spark, s"$dir/*.dbf")
      .as[(String, String)].collect().toSet
    assert(got == Set(("AB", "12"), ("CDEF", "7")))
  }

  test("distributed writeDbf -> readDbf round-trips exactly") {
    val src = Seq(
      ("1", "pt", "süd"), ("2", "en", "north"), ("3", "es", ""))
      .toDF("ID", "LANG", "REGION").repartition(2)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-dbf-test/rt"
    Dbf.writeDbf(src, dir)
    val files = new java.io.File(dir).listFiles()
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".dbf")))
    val got = Dbf.readDbf(spark, s"$dir/*.dbf")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("1", "pt", "süd"), ("2", "en", "north"), ("3", "es", "")))
    // second write must not accumulate stale files
    Dbf.writeDbf(src, dir)
    assert(Dbf.readDbf(spark, s"$dir/*.dbf").count() == 3)
  }

  test("hand-built .dbc (header + CRC + imploded records) reads as the .dbf") {
    // Assemble the .dbc container from the hand-built DBF image manually —
    // independent of dbfToDbc — so the READER is tested against the format.
    val dbf = handBuiltDbf()
    val headerSize = 32 + 32 * 2 + 1
    val records = java.util.Arrays.copyOfRange(dbf, headerSize, dbf.length)
    val out = new ByteArrayOutputStream()
    out.write(dbf, 0, headerSize)
    val crc = new java.util.zip.CRC32
    crc.update(records)
    (0 until 4).foreach(i => out.write(((crc.getValue >> (8 * i)) & 0xFF).toInt))
    val packed = graft.sources.PkImplode.implode(records)
    out.write(packed, 0, packed.length)
    val dir = java.nio.file.Files.createTempDirectory("graft-dbc-read")
    java.nio.file.Files.write(dir.resolve("a.dbc"), out.toByteArray)
    val got = Dbf.readDbc(spark, s"$dir/*.dbc")
      .as[(String, String)].collect().toSet
    assert(got == Set(("AB", "12"), ("CDEF", "7")))
  }

  test("distributed writeDbc -> readDbc round-trips through real compression") {
    val src = (0 until 300).map(i => (i.toString, s"val_${i % 7}", "PT"))
      .toDF("ID", "VAL", "UF").repartition(3)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-dbf-test/dbc"
    Dbf.writeDbc(src, dir)
    val files = new java.io.File(dir).listFiles()
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".dbc")))
    val got = Dbf.readDbc(spark, s"$dir/*.dbc")
      .as[(String, String, String)].collect().toSet
    assert(got == (0 until 300).map(i => (i.toString, s"val_${i % 7}", "PT")).toSet)
  }
}
