package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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
}
