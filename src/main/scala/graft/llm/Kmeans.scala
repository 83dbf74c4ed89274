package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, partition-INDEPENDENT Lloyd k-means — the cell-routing
  * fit behind [[Ivf]].
  *
  * Spark ML's `KMeans` seeds k-means|| from per-partition samples, so the
  * fitted centroids (and every ANN result routed through them) change
  * with the partition layout — re-running the same index build on a
  * different executor count silently returns different neighbours. At
  * 100 TB, "the same job gives the same answer" is an operational
  * property (idempotent re-runs, auditable retrievals), so this fit is
  * engine-deterministic end to end:
  *
  *  - seeds: the `k` rows with the smallest `(md5(id), id)` — a uniform
  *    deterministic draw, independent of partitioning (TakeOrdered, no
  *    RNG state);
  *  - assignment: squared-distance argmin with FIRST-minimum (lowest
  *    cell) tie-break, evaluated per row as a scan-level expression over
  *    a centroid array LITERAL — per-row IEEE arithmetic is identical
  *    everywhere, and no shuffle touches the corpus;
  *  - update: per-cell per-dimension means accumulate through
  *    `DECIMAL(38,12)` sums — exact and order-independent where a double
  *    sum would drift with partitioning and flip borderline assignments
  *    next round; empty cells keep their previous centroid.
  *
  * The per-round reduce is one map-side-combinable aggregation over
  * (cell, dim) keys — k·dim result rows to the driver, the same tiny
  * driver surface every k-means maintains. Iteration count is FIXED
  * (routing cells don't need convergence, they need stability).
  */
object Kmeans {

  /** Squared euclidean distance between two double-array columns. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Nearest-centroid cell id (0-based) for a double-array column against
    * a centroid literal — first minimum wins, so ties break to the lowest
    * cell deterministically. Native codegen'd kernel
    * ([[graft.functions.NearestCell]]): the HOF form (`transform` over the
    * centroid literal) evaluates k·dim interpreted lambdas per row and its
    * cost grows with the cell count — it pinned every executor once cells
    * scaled with the corpus.
    */
  def nearestCell(v: Column, centroids: Seq[Seq[Double]]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.register)
    call_function("graft_nearest_cell", v, typedlit(centroids))
  }

  /** Fit `k` centroids over `iters` Lloyd rounds on `df(vecCol)` (any
    * numeric array column). Returns the centroid matrix, identical under
    * any partitioning of `df`.
    */
  def fit(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5): Seq[Seq[Double]] = {
    require(k >= 1 && iters >= 1, s"need k>=1, iters>=1; got k=$k iters=$iters")
    val vecs = df.select(
      col(idCol).as("__id"),
      transform(col(vecCol), _.cast("double")).as("__v"))
    var centroids: Seq[Seq[Double]] = vecs
      .orderBy(md5(col("__id").cast("string").cast("binary")), col("__id"))
      .limit(k)
      .select("__v").collect().map(_.getSeq[Double](0).toSeq).toSeq
    for (_ <- 0 until iters) {
      val sums = vecs
        .select(nearestCell(col("__v"), centroids).as("__cell"),
          posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy("__cell", "__dim")
        .agg(
          sum(col("__x").cast("decimal(38,12)")).as("__sum"),
          count(lit(1)).as("__n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getDecimal(2), r.getLong(3)))
        .toMap
      centroids = centroids.zipWithIndex.map { case (old, cell) =>
        if (sums.contains((cell, 0)))
          old.indices.map { d =>
            val (s, n) = sums((cell, d))
            s.doubleValue / n
          }
        else old // empty cell keeps its previous centroid
      }
    }
    centroids
  }

  /** [[nearestCell]] against a NON-LITERAL centroid-matrix column — the
    * hierarchical fit joins per-coarse-cell matrices in from a DataFrame;
    * a flat plan literal at 50k cells would be a ~50 MB constant
    * serialized with every task.
    */
  def nearestCellCol(v: Column, matrix: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.register)
    call_function("graft_nearest_cell", v, matrix)
  }

  /** Two-level Lloyd fit for LARGE cell counts — the 50k-cell IVF shape
    * ([[Ivf.indexHierarchical]]). A flat fit at k cells costs O(k·dim)
    * per row per round AND carries the whole centroid matrix as a plan
    * literal; both stop scaling somewhere in the low thousands of cells.
    * Here `kCoarse` coarse cells route rows first (O(kCoarse·dim)
    * scan-level argmin over a small literal), then EVERY coarse cell's
    * `kFine` fine centroids are fitted simultaneously — one broadcastable
    * join plus one map-side-combinable aggregation per round, with the
    * fine state living in a DATAFRAME of kCoarse (kFine×dim)-matrices
    * that is joined per round and NEVER collected to the driver or
    * inlined as a literal. Per-row assignment costs
    * O((kCoarse+kFine)·dim); at kCoarse = kFine = √k that is 2√k/k of
    * the flat cost (≈1/110 at 50k cells), and no driver structure ever
    * holds k·dim doubles.
    *
    * Same determinism discipline as [[fit]]: md5 seeds, first-minimum
    * tie-break, DECIMAL(38,12) mean accumulation (order-independent),
    * empty cells keep their previous centroid — identical output under
    * any partitioning/executor count (spec-proven).
    *
    * Returns the coarse matrix and the fine table `(__coarse, __m)`.
    * Flat cell id = `coarse·kFine + fine` ([[Ivf.indexHierarchical]]).
    */
  def fitHierarchical(
      df: DataFrame, idCol: String, vecCol: String,
      kCoarse: Int, kFine: Int, iters: Int = 5)
      : (Seq[Seq[Double]], DataFrame) = {
    require(kCoarse >= 1 && kFine >= 1 && iters >= 1,
      s"need kCoarse,kFine,iters >= 1; got $kCoarse/$kFine/$iters")
    val coarse = fit(df, idCol, vecCol, kCoarse, iters)
    // coarse routing is FIXED across the fine rounds: assign once and
    // persist partitioned by coarse cell, so every round's matrix join
    // reuses the layout instead of re-shuffling the training set
    val assigned = df.select(
        col(idCol).as("__id"),
        transform(col(vecCol), _.cast("double")).as("__v"))
      .withColumn("__coarse", nearestCell(col("__v"), coarse))
      .repartition(col("__coarse"))
      .transform(CacheScope.persistTracked)
    // seeds: per coarse cell, the kFine rows with the smallest
    // (md5(id), id) — the same deterministic draw as the flat fit
    val seedW = Window.partitionBy("__coarse")
      .orderBy(md5(col("__id").cast("string").cast("binary")), col("__id"))
    var fine = assigned
      .withColumn("__r", row_number().over(seedW))
      .filter(col("__r") <= kFine)
      .groupBy("__coarse")
      .agg(transform(
        array_sort(collect_list(struct(col("__r"), col("__v")))),
        s => s.getField("__v")).as("__m"))
      .transform(CacheScope.persistTracked)
    fine.count()
    for (_ <- 0 until iters) {
      val routed = assigned.join(fine, Seq("__coarse"))
        .select(col("__coarse"),
          nearestCellCol(col("__v"), col("__m")).as("__fine"),
          posexplode(col("__v")).as(Seq("__dim", "__x")))
      val means = routed.groupBy("__coarse", "__fine", "__dim")
        .agg((sum(col("__x").cast("decimal(38,12)")) / count(lit(1)))
          .cast("double").as("__c"))
      // rebuild the matrices; empty fine cells keep their previous rows
      val next = fine
        .select(col("__coarse"),
          posexplode(col("__m")).as(Seq("__fine", "__old")))
        .select(col("__coarse"), col("__fine"),
          posexplode(col("__old")).as(Seq("__dim", "__oldx")))
        .join(means, Seq("__coarse", "__fine", "__dim"), "left_outer")
        .select(col("__coarse"), col("__fine"), col("__dim"),
          coalesce(col("__c"), col("__oldx")).as("__x"))
        .groupBy("__coarse", "__fine")
        .agg(transform(
          array_sort(collect_list(struct(col("__dim"), col("__x")))),
          s => s.getField("__x")).as("__vc"))
        .groupBy("__coarse")
        .agg(transform(
          array_sort(collect_list(struct(col("__fine"), col("__vc")))),
          s => s.getField("__vc")).as("__m"))
        .transform(CacheScope.persistTracked)
      next.count() // materialize: cuts the per-round recompute chain
      fine = next
    }
    (coarse, fine)
  }
}
