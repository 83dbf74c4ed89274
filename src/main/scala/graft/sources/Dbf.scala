package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Real binary DBF (dBase III) record reader/writer.
  *
  * Reference ingests DATASUS `.dbc` files — a DBF table whose record block
  * is PKWare-DCL-compressed — in record batches (`extrair_dbc_lotes`,
  * utilitarios/datasus_ftp.py:142). Both layers are REAL: binary header +
  * field-descriptor parsing, fixed-width record decode, deleted-row flags,
  * ISO-8859-1 text (DATASUS codepage), and the `.dbc` container via
  * [[PkImplode]] ([[readDbc]]/[[writeDbc]]). A `.dbc` file is the raw DBF
  * header (its size at bytes 8–9), a 4-byte CRC32 of the record block,
  * then the imploded record block; decompression is per FILE inside the
  * distributed decode, one partition per file.
  *
  * Scale shape: header parse happens once per FILE (driver reads only the
  * first header to fix the schema); record decode runs distributed via the
  * `binaryFile` source. DATASUS distributes data as many per-UF-per-month
  * files of modest size, which is exactly the layout `binaryFile`
  * parallelizes over. All values surface as trimmed strings — DATASUS
  * fields are codes; downstream typing is the schema-cast map (q23).
  */
object Dbf {

  /** One field descriptor: 11-byte name, type char (C/N/D/L/F), length. */
  final case class DbfField(name: String, ftype: Char, length: Int, decimals: Int)

  final case class DbfHeader(
      recordCount: Int, headerSize: Int, recordSize: Int, fields: Seq[DbfField])

  private def u8(b: Byte): Int = b & 0xFF
  private def u16le(bytes: Array[Byte], off: Int): Int =
    u8(bytes(off)) | (u8(bytes(off + 1)) << 8)
  private def u32le(bytes: Array[Byte], off: Int): Long =
    u16le(bytes, off).toLong | (u16le(bytes, off + 2).toLong << 16)

  /** Parse the 32-byte file header + field descriptors (terminated 0x0D). */
  def parseHeader(bytes: Array[Byte]): DbfHeader = {
    require(bytes.length >= 32, "truncated DBF: no file header")
    val recordCount = u32le(bytes, 4).toInt
    val headerSize = u16le(bytes, 8)
    val recordSize = u16le(bytes, 10)
    val fields = Seq.newBuilder[DbfField]
    var off = 32
    while (off + 32 <= bytes.length && bytes(off) != 0x0D) {
      val nameEnd = {
        val i = (off until off + 11).indexWhere(j => bytes(j) == 0)
        if (i < 0) off + 11 else off + i
      }
      fields += DbfField(
        new String(bytes, off, nameEnd - off, "ISO-8859-1").trim,
        u8(bytes(off + 11)).toChar,
        u8(bytes(off + 16)),
        u8(bytes(off + 17)))
      off += 32
    }
    val parsed = fields.result()
    require(parsed.nonEmpty, "DBF with no field descriptors")
    require(recordSize == 1 + parsed.map(_.length).sum,
      s"record size $recordSize != 1 + field lengths ${parsed.map(_.length).sum}")
    DbfHeader(recordCount, headerSize, recordSize, parsed)
  }

  /** Decode the record block: one string per field per live record
    * (deletion flag 0x2A rows are skipped, as dBase semantics require).
    */
  def parseRecords(bytes: Array[Byte]): Seq[Seq[String]] = {
    val h = parseHeader(bytes)
    val out = Seq.newBuilder[Seq[String]]
    var off = h.headerSize
    var i = 0
    while (i < h.recordCount && off + h.recordSize <= bytes.length) {
      if (bytes(off) != 0x2A) { // '*' = deleted
        var f = off + 1
        out += h.fields.map { fd =>
          val v = new String(bytes, f, fd.length, "ISO-8859-1").trim
          f += fd.length
          v
        }
      }
      off += h.recordSize
      i += 1
    }
    out.result()
  }

  /** Expand a `.dbc` byte image into the equivalent `.dbf` image: raw
    * header (size at bytes 8–9), skip the 4-byte record-block CRC32, then
    * explode the imploded record block.
    */
  def dbcToDbf(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 32, "truncated .dbc: no header")
    val headerSize = u16le(bytes, 8)
    require(bytes.length >= headerSize + 4, "truncated .dbc: no record block")
    val records = PkImplode.explode(
      java.util.Arrays.copyOfRange(bytes, headerSize + 4, bytes.length))
    val out = java.util.Arrays.copyOf(bytes, headerSize + records.length)
    System.arraycopy(records, 0, out, headerSize, records.length)
    out
  }

  /** Pack a `.dbf` byte image into `.dbc`: header + record-block CRC32 +
    * imploded record block.
    */
  def dbfToDbc(bytes: Array[Byte]): Array[Byte] = {
    val headerSize = u16le(bytes, 8)
    val records = java.util.Arrays.copyOfRange(bytes, headerSize, bytes.length)
    val crc = new java.util.zip.CRC32
    crc.update(records)
    val packed = PkImplode.implode(records)
    val out = new ByteArrayOutputStream(headerSize + 4 + packed.length)
    out.write(bytes, 0, headerSize)
    val c = crc.getValue
    out.write((c & 0xFF).toInt); out.write(((c >> 8) & 0xFF).toInt)
    out.write(((c >> 16) & 0xFF).toInt); out.write(((c >> 24) & 0xFF).toInt)
    out.write(packed, 0, packed.length)
    out.toByteArray
  }

  /** Read a directory/glob of `.dbf` files as a DataFrame — schema fixed by
    * the first file's header (read once, driver-side), records decoded
    * distributed with one partition per file via the `binaryFile` source.
    * Files may disagree on field WIDTHS (per-file headers are re-parsed)
    * but must agree on field names/order.
    */
  def readDbf(spark: SparkSession, path: String): DataFrame =
    readBinary(spark, path, ".dbf", compressed = false)

  /** [[readDbf]] for compressed `.dbc` files: per-file PKWare-implode
    * decompression inside the distributed decode.
    */
  def readDbc(spark: SparkSession, path: String): DataFrame =
    readBinary(spark, path, ".dbc", compressed = true)

  private def readBinary(
      spark: SparkSession, path: String, ext: String, compressed: Boolean): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val first = {
      val matched = fs.globStatus(p) match {
        case null | Array() => fs.listStatus(p)
        case g => g
      }
      // a bare directory path (the common, warn-free form) matches itself —
      // expand it to its children like the binaryFile source does
      val files = matched.flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath) else Array(s))
      val f = files.filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(ext))
        .sortBy(_.getPath.getName)
        .headOption.getOrElse(throw new IllegalArgumentException(s"no $ext under $path"))
      // header + field descriptors are stored raw in both formats
      val in = fs.open(f.getPath)
      try {
        val buf = new Array[Byte](math.min(f.getLen, 32 + 32 * 2048L).toInt)
        in.readFully(0, buf)
        buf
      } finally in.close()
    }
    val schema = StructType(
      parseHeader(first).fields.map(f => StructField(f.name, StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val files = spark.read.format("binaryFile").load(path)
      .filter(org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.col("path")).endsWith(ext))
      .select("content")
    files.mapPartitions { rows =>
      rows.flatMap { r =>
        val raw = r.getAs[Array[Byte]](0)
        parseRecords(if (compressed) dbcToDbf(raw) else raw).map(vs => Row.fromSeq(vs))
      }
    }(enc)
  }

  /** Serialize string rows to dBase III bytes (the writer half of the
    * round-trip; also how tests build genuine DBF payloads). Field widths
    * are sized to the partition's max value length.
    */
  def toDbfBytes(names: Seq[String], rows: Seq[Seq[String]]): Array[Byte] = {
    val widths = names.indices.map { i =>
      math.max(1, rows.iterator.map(r =>
        r(i).getBytes("ISO-8859-1").length).maxOption.getOrElse(1))
    }
    require(widths.forall(_ <= 254), "DBF field width limit is 254 bytes")
    val recordSize = 1 + widths.sum
    val headerSize = 32 + 32 * names.length + 1
    val out = new ByteArrayOutputStream(headerSize + recordSize * rows.length + 1)
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    w8(0x03); w8(126); w8(1); w8(1) // version; last-update YY MM DD
    w32(rows.length)
    w16(headerSize); w16(recordSize)
    (0 until 20).foreach(_ => w8(0))
    names.zip(widths).foreach { case (n, width) =>
      val nb = n.getBytes("ISO-8859-1").take(10)
      out.write(nb); (nb.length until 11).foreach(_ => w8(0))
      w8('C'); w32(0); w8(width); w8(0)
      (0 until 14).foreach(_ => w8(0))
    }
    w8(0x0D)
    rows.foreach { r =>
      w8(0x20)
      r.zip(widths).foreach { case (v, width) =>
        val vb = v.getBytes("ISO-8859-1")
        out.write(vb); (vb.length until width).foreach(_ => w8(' '))
      }
    }
    w8(0x1A)
    out.toByteArray
  }

  /** Write `df` (all-string columns) as one `.dbf` file per partition under
    * `dir` — the DATASUS many-modest-files layout, produced distributed
    * (executor-local writes, no driver collect).
    */
  def writeDbf(df: DataFrame, dir: String): Unit =
    writeBinary(df, dir, ".dbf", compress = false)

  /** [[writeDbf]] with PKWare-imploded record blocks — one `.dbc` per
    * partition.
    */
  def writeDbc(df: DataFrame, dir: String): Unit =
    writeBinary(df, dir, ".dbc", compress = true)

  private def writeBinary(
      df: DataFrame, dir: String, ext: String, compress: Boolean): Unit = {
    val names = df.columns.toSeq
    val root = new java.io.File(dir)
    if (root.exists()) { // stale files from a previous run would double rows
      import scala.reflect.io.Directory
      new Directory(root).deleteRecursively()
    }
    root.mkdirs()
    val writeOne: Iterator[Row] => Unit = { rows =>
      val batch = rows.map(r => names.indices.map(i =>
        Option(r.getString(i)).getOrElse(""))).toSeq
      if (batch.nonEmpty) {
        val id = java.util.UUID.nameUUIDFromBytes(
          batch.head.mkString("|").getBytes("UTF-8")).toString.take(8)
        val dbf = toDbfBytes(names, batch)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"part-$id$ext"),
          if (compress) dbfToDbc(dbf) else dbf)
      }
    }
    df.foreachPartition(writeOne)
  }
}
