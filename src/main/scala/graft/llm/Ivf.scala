package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the
  * centroid-partitioned scale path next to the hyperplane-LSH variant in
  * [[Similarity]].
  *
  * Index: k-means centroids over the corpus; every corpus vector lives in
  * exactly one centroid cell. Query: score the `nProbe` nearest centroids
  * per query (tiny broadcast cross — |centroids| rows), then score corpus
  * vectors only inside the probed cells (equi-join on cell id — shuffle
  * linear in rows, never an all-pairs product) and take the exact-cosine
  * top-k. Recall grows with `nProbe` at proportional candidate cost; the
  * scalatest suite measures it against [[Similarity.bruteForceTopK]].
  *
  * At 100 TB the index is trained once on a sample, cells are written
  * bucketed by cell id, and probes prune whole cells at the source.
  */
object Ivf {

  /** Centroid cells for the corpus: (cell DataFrame tagged per row,
    * centroid table (cell_id, centroid array<double>)). Deterministic for a
    * fixed seed.
    */
  def index(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val feat = Spread(corpus).select(
        col(idCol), col(vecCol),
        array_to_vector(col(vecCol)).as("__feat"))
      .transform(CacheScope.persistTracked)
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setFeaturesCol("__feat").setPredictionCol("__cell")
      .fit(feat)
    val assigned = model.transform(feat).drop("__feat")
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toArray) }
      .toDF("__cell", "__centroid")
    (assigned, centroids)
  }

  /** Squared euclidean distance between a float vector and a double
    * centroid — ranking-only (cells are a routing structure, not results),
    * so plain double accumulation is fine here.
    */
  private def sqDist(v: Column, centroid: Column): Column =
    aggregate(
      zip_with(v, centroid, (x, c) => {
        val d = x.cast("double") - c
        d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** ANN top-k through the IVF index. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    val (assigned, centroids) = index(corpus, idCol, vecCol, nCells, seed)
    val cells = assigned.select(
      col(idCol).as("corpus_id"), col(vecCol).as("__cv"),
      Similarity.l2Norm(col(vecCol)).as("__cn"), col("__cell"))

    // probe list: nProbe nearest centroids per query (|queries| × |centroids|
    // over a broadcast centroid table — negligible)
    val qd = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        Similarity.l2Norm(col(vecCol)).as("__qn"))
      .crossJoin(broadcast(centroids))
      .withColumn("__dist", sqDist(col("__qv"), col("__centroid")))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("__dist").asc, col("__cell").asc)
    val probes = qd.withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__qn"), col("__cell"))

    val scored = cells.join(broadcast(probes), Seq("__cell"))
      .select(col("query_id"), col("corpus_id"),
        (Similarity.dotDecimal(col("__qv"), col("__cv")).cast("double") /
          (col("__qn") * col("__cn"))).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
