package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column file pruning.
  *
  * A single-column range layout ([[graft.sources.Staging.compact]]) gives
  * perfect min/max pruning on ONE key and none on the others; at 100 TB a
  * second frequent filter column means either full scans or a duplicated
  * copy. Interleaving the bits of several keys' normalized values orders
  * rows along a space-filling curve, so every file's bounding box is
  * compact in EVERY interleaved dimension at once — parquet min/max (or a
  * lake manifest) then prunes files for filters on any of them. This is
  * the standard lakehouse `OPTIMIZE ... ZORDER BY` layout, built here
  * from plain expressions.
  *
  * Everything is integer-exact and engine-portable: each key is min-max
  * scaled to `bits` bits with BIGINT arithmetic (the scale product stays
  * far under 2^53, so the floor-division is exact in any engine), then
  * bit-interleaved with shift/and/sum — no hash, no RNG, no UDF, fully
  * codegen'd, reproducible by an ANSI SQL oracle.
  */
object Layout {

  /** Min-max scale an integral column onto [0, 2^bits): exact BIGINT
    * floor((v - mn) * (2^bits - 1) / (mx - mn)). Null values scale to 0
    * (they sort first, as in a plain layout).
    */
  def scaleToBits(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val span = (mx - mn).cast("long")
    val scaled = floor(((c - mn).cast("long") * ((1L << bits) - 1)) / span).cast("long")
    coalesce(when(span <= 0, lit(0L)).otherwise(scaled), lit(0L))
  }

  /** Interleave already-scaled `bits`-bit values: bit i of column j lands
    * at position i * n + j of the Morton value.
    */
  def interleaveBits(scaled: Seq[Column], bits: Int): Column = {
    require(scaled.nonEmpty && scaled.size * bits <= 62,
      s"${scaled.size} cols x $bits bits overflows a BIGINT Morton value")
    val n = scaled.size
    val terms = for {
      i <- 0 until bits
      (s, j) <- scaled.zipWithIndex
    } yield shiftleft(shiftright(s, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** The Morton value of `cols` (integral columns), each min-max scaled to
    * `bits` bits against the column's own global min/max (one tiny stats
    * aggregate, broadcast — never collected per row).
    */
  def zorderValue(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val withStats = df.crossJoin(broadcast(stats))
    val scaled = cols.map(c =>
      scaleToBits(col(c), col(s"__mn_$c"), col(s"__mx_$c"), bits))
    withStats
      .withColumn("zorder", interleaveBits(scaled, bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Write `df` z-order-clustered on `cols` into `nFiles` range-disjoint
    * files under `path` and read the layout back. Range partitioning on
    * the Morton value keeps files curve-contiguous (compact bounding
    * boxes in every dimension); within-file sort maximizes page-level
    * stats. The `zorder` column is persisted so a lake manifest can prune
    * on it directly too.
    */
  def zorderLayout(
      spark: SparkSession, df: DataFrame, cols: Seq[String], nFiles: Int,
      path: String, bits: Int = 16): DataFrame = {
    zorderValue(df, cols, bits)
      .repartitionByRange(nFiles, col("zorder"))
      .sortWithinPartitions("zorder")
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Per-file Bloom manifest over `keyCol`, written to
    * `path/_graft_manifest` (underscore-prefixed → invisible to normal
    * parquet reads): one row per data file with its row count and a Bloom
    * filter of the file's key hashes — Catalyst's own
    * `BloomFilterAggregate` per file in ONE distributed pass, never a
    * job per file.
    *
    * Min/max footer stats (what [[zorderLayout]]/`compact` exploit) prune
    * RANGE predicates; a Bloom manifest prunes POINT lookups on columns
    * with no clustering at all — the lake-manifest trick (Delta/Iceberg
    * file skipping) without opening a single parquet footer: the manifest
    * is one tiny row per file, probed driver-side.
    */
  def writeBloomManifest(
      spark: SparkSession, path: String, keyCol: String,
      fpp: Double = 0.001): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Shims
    import org.apache.spark.util.sketch.BloomFilter

    val keyed = spark.read.parquet(path)
      .select(col(keyCol), input_file_name().as("arquivo"))
    // BloomFilterAggregate sizes from foldable literals — size every
    // file's bloom for the LARGEST file (manifest stays tiny either way)
    val maxRows = math.max(1L,
      keyed.groupBy("arquivo").count().agg(max("count")).head().getLong(0))
    val bloomAgg = Shims.column(
      new BloomFilterAggregate(
        XxHash64(Seq(UnresolvedAttribute.quoted(keyCol)), 42L),
        Literal(maxRows),
        Literal(BloomFilter.optimalNumOfBits(maxRows, fpp)))
        .toAggregateExpression())
    val manifest = keyed.groupBy("arquivo")
      .agg(count(lit(1L)).as("linhas"), bloomAgg.as("bloom"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$path/_graft_manifest")
    manifest
  }

  /** Read only the files whose manifest Bloom might contain one of
    * `keys`: the manifest (one row per file) is probed driver-side with
    * the SAME xxhash64 the aggregate used, bloom-negative files are never
    * scheduled. False positives only cost an extra file read; callers
    * still apply the actual predicate to the returned frame.
    */
  def bloomPrunedRead(
      spark: SparkSession, path: String, keyCol: String,
      keys: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.util.sketch.BloomFilter

    val hashes = keys.map(v =>
      XxHash64(Seq(Literal(v)), 42L).eval(null).asInstanceOf[Long])
    val files = spark.read.parquet(s"$path/_graft_manifest").collect().toSeq
      .filter { r =>
        val bf = BloomFilter.readFrom(r.getAs[Array[Byte]]("bloom"))
        hashes.exists(bf.mightContainLong)
      }
      .map(_.getAs[String]("arquivo"))
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files: _*)
  }
}
