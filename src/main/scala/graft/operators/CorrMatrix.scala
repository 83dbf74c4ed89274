package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass Pearson correlation matrix per group — every pair of the
  * given numeric columns, from a SINGLE combinable aggregation over the
  * raw rows (the feature-audit next to [[Profile.profile]]: profiling
  * describes each column alone, the correlation matrix is the first
  * question about columns TOGETHER — collinear features, redundant
  * metrics, leakage suspects).
  *
  * Discipline is [[Stats.groupLinearFit]]'s, generalized: for each of
  * the C·(C−1)/2 column pairs, the sufficient statistics (n, Σx, Σy,
  * Σxy, Σx², Σy²) accumulate as DECIMAL(38,12) in the ONE aggregation —
  * the raw rows are scanned exactly once however many columns are
  * audited (C² terms live in the aggregation buffer, never as extra
  * scans or a shuffle per pair) — and the correlation is assembled at
  * the edge in IEEE arithmetic over the exact sums:
  *
  *   r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))
  *
  * Pairwise-complete contract: a pair's statistics fold only rows where
  * BOTH columns are non-null (each pair keeps its own n), so one ragged
  * column cannot poison the rest of the matrix. Degenerate pairs
  * (n < 2 or a zero-variance side) emit null correlation, never NaN.
  *
  * Output: long form — one row per (group…, col_a, col_b), one per
  * unordered pair in the given column order: n, corr. The aggregation
  * buffer holds 6·C(C,2) decimals per group — right for the tens-of-
  * columns audit this is; a thousands-of-columns matrix wants the
  * (row, col, value) long-form explode + pair self-join decomposition
  * instead (buffer-bounded, shuffle-linear in non-null cells).
  */
object CorrMatrix {

  def corrMatrix(
      df: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.size >= 2,
      s"need at least two value columns, got ${valueCols.size}")
    require(valueCols.distinct.size == valueCols.size,
      "value columns must be distinct")
    val g = groupCols.map(col)
    val pairs = for {
      i <- valueCols.indices
      j <- valueCols.indices if i < j
    } yield (valueCols(i), valueCols(j))
    val d = "decimal(38,12)"
    def pref(a: String, b: String) = s"${a}__$b"
    val aggs = pairs.flatMap { case (a, b) =>
      val both = col(a).isNotNull && col(b).isNotNull
      val xa = when(both, col(a).cast("double"))
      val xb = when(both, col(b).cast("double"))
      val p = pref(a, b)
      Seq(
        sum(when(both, 1L).otherwise(0L)).as(s"__n_$p"),
        sum(xa.cast(d)).cast(d).as(s"__sx_$p"),
        sum(xb.cast(d)).cast(d).as(s"__sy_$p"),
        sum((xa * xb).cast(d)).cast(d).as(s"__sxy_$p"),
        sum((xa * xa).cast(d)).cast(d).as(s"__sxx_$p"),
        sum((xb * xb).cast(d)).cast(d).as(s"__syy_$p"))
    }
    // Spread before the fold: the map side carries 6·C(C,2) exact
    // DECIMAL conversions per row — CPU-bound per-row work that a
    // byte-based single-split scan would run on one task (measured:
    // 10.5 → ~1 s at sf0.1). No-op on an already-wide 100 TB scan.
    val folded = graft.llm.Spread(df).groupBy(g: _*)
      .agg(aggs.head, aggs.tail: _*)
    // one struct per pair, exploded to long form — the explode walks the
    // already-collapsed per-group row, never the raw scan
    val rows = pairs.map { case (a, b) =>
      val p = pref(a, b)
      val n = col(s"__n_$p").cast("double")
      val sx = col(s"__sx_$p").cast("double")
      val sy = col(s"__sy_$p").cast("double")
      val sxy = col(s"__sxy_$p").cast("double")
      val sxx = col(s"__sxx_$p").cast("double")
      val syy = col(s"__syy_$p").cast("double")
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      // zero-variance gate on the EXACT decimal sufficient statistics:
      // n·Σx² > (Σx)² decided in DECIMAL, so a constant column can never
      // pass on double-rounding residue (the doubles above are for the
      // VALUE of r only; the double > 0 guards stay to keep the sqrt
      // denominator nonzero when decimal says positive but double
      // underflows — that edge emits null, never NaN or Infinity).
      // The decimal products land at decimal(38,6) under Spark's
      // allowPrecisionLoss and OVERFLOW TO NULL once |Σx| ≳ 1e16 — a
      // null gate is inconclusive, not "zero variance", so it falls
      // back to the double test instead of silently nulling a genuinely
      // varying pair's correlation
      val nD = col(s"__n_$p").cast(d)
      val vxPos = coalesce(
        nD * col(s"__sxx_$p") > col(s"__sx_$p") * col(s"__sx_$p"),
        vx > 0.0)
      val vyPos = coalesce(
        nD * col(s"__syy_$p") > col(s"__sy_$p") * col(s"__sy_$p"),
        vy > 0.0)
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n_$p").as("n"),
        when(col(s"__n_$p") >= 2L && vxPos && vyPos &&
            vx > 0.0 && vy > 0.0,
          (n * sxy - sx * sy) / sqrt(vx * vy)).as("corr"))
    }
    folded
      .select(g :+ explode(array(rows: _*)).as("__c"): _*)
      .select(g ++ Seq(col("__c.col_a"), col("__c.col_b"),
        col("__c.n"), col("__c.corr")): _*)
  }
}
