package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * Real media decode (image/audio/video) needs native libraries that are
  * not in this environment, so the decode kernel is STUBBED with a
  * deterministic fake — but everything Spark-side is real and tested:
  * the binary column representation, metadata extraction as pure
  * expressions, the batched `mapPartitions` decode harness (schema,
  * batching, partition-parallelism), and the feature-vector schema the
  * decoder emits.
  */
object Multimodal {

  /** Attach an opaque binary payload column (here: the UTF-8 bytes of a
    * text column — in production, image/audio bytes read from files).
    */
  def withBlob(df: DataFrame, srcCol: String, blobCol: String): DataFrame =
    df.withColumn(blobCol, col(srcCol).cast("binary"))

  /** Typed metadata over a binary payload, all scan-level expressions:
    * byte length, magic-prefix hex, content sha256.
    */
  def blobMeta(blob: Column): Seq[(String, Column)] = Seq(
    "n_bytes" -> length(blob).cast("long"),
    "magic_hex" -> lower(hex(substring(blob, 1, 4))),
    "conteudo_sha256" -> sha2(blob, 256),
  )

  /** Schema of the decoder output appended by [[decodeBatches]]. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("alt_px", IntegerType),
    StructField("larg_px", IntegerType),
    StructField("canais", IntegerType),
    StructField("recursos", ArrayType(FloatType)),
  ))

  /** STUB decode kernel — deterministic fake standing in for a real
    * image/audio decoder (`??? : real decoder requires native libs`).
    * Takes the whole batch like a vectorized/pandas-style decoder would;
    * derives pseudo width/height/channels and a 4-dim feature vector per
    * payload so the plumbing is end-to-end testable.
    */
  def decodeStub(batch: Seq[Array[Byte]]): Seq[Row] = batch.map { payload =>
    val h = java.util.Arrays.hashCode(payload)
    val feats = Array.tabulate(4)(i => ((h >>> (i * 8)) & 0xFF).toFloat / 255.0f)
    Row(64 + math.floorMod(h, 1024), 64 + math.floorMod(h >> 10, 1024), 3, feats)
  }

  /** STUB resize kernel — `??? : real resize requires an image library`.
    * Deterministic fake: honors the target box, preserving aspect via
    * min-ratio over the decode stub's pseudo dimensions.
    */
  def resizeStub(maxW: Int, maxH: Int)(batch: Seq[Array[Byte]]): Seq[Row] =
    decodeStub(batch).map { d =>
      val (h, w) = (d.getInt(0), d.getInt(1))
      val r = math.min(maxW.toDouble / w, maxH.toDouble / h).min(1.0)
      Row((h * r).toInt.max(1), (w * r).toInt.max(1), d.getInt(2), d.get(3))
    }

  /** STUB frame-sample kernel — `??? : real frame extraction requires a
    * video library`. Deterministic fake: every `stride`-th pseudo-frame
    * offset derived from the payload length (the batch plumbing — one input
    * row fanning out to N frame rows — is the real part).
    */
  def sampleFrames(
      df: DataFrame, blobCol: String, stride: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn("frame_indice",
        explode(sequence(lit(0), greatest(
          (length(col(blobCol)) / lit(stride)).cast("int") - 1, lit(0)))))
      .withColumn("frame_offset", col("frame_indice") * stride)
  }

  /** Batched partition-parallel decode harness: each partition iterates its
    * payloads in `batchSize` groups (the shape a vectorized/pandas-style
    * decode kernel wants), appending [[DecodedSchema]] columns. The kernel
    * is injectable so tests can swap the stub (e.g. [[resizeStub]]).
    */
  def decodeBatches(
      df: DataFrame, blobCol: String, batchSize: Int = 64,
      kernel: Seq[Array[Byte]] => Seq[Row] = decodeStub): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ DecodedSchema.fields)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one kernel call per batch — the vectorized-decoder shape
        val decoded = kernel(batch.map(_.getAs[Array[Byte]](blobIdx)))
        require(decoded.length == batch.length,
          s"decode kernel returned ${decoded.length} rows for ${batch.length} payloads")
        batch.lazyZip(decoded).map((r, d) => Row.fromSeq(r.toSeq ++ d.toSeq))
      }
    }(enc)
  }
}
