package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding columns.
  *
  * Baseline: brute-force cosine top-k — a broadcast cross join with a
  * codegen'd `zip_with`+`aggregate` dot product (no UDF). Scale path:
  * random-hyperplane LSH bucketing turns the cross join into an equi-join
  * on bucket keys; recall is tuned by the number of hyperplanes/tables.
  */
object Similarity {

  /** Dot product of two Array[Float|Double] columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision — native one-pass expression
    * (sequential fold order matches the composable spelling exactly).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim(a, b)

  /** Composable (pure built-ins) spelling; kept as the semantic
    * reference for `cosine` and for engines without the native expr.
    */
  def cosineComposable(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. Queries are broadcast (small side); corpus streams — at
    * 100 TB this is one scan + a per-query bounded heap via window top-k.
    * Ties break on neighbor id for determinism.
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
      qVec: String, cVec: String, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos_sim", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos_sim").desc, col(cId).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId).as("query_id"), col(cId).as("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * a fixed hash → [-0.5, 0.5) value, identical across engines/runs.
    */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(1000000L)).cast("double") / 1e6) - 0.5

  /** Random-hyperplane LSH bucket id: `nPlanes` sign bits packed into a
    * long. Vectors in the same bucket are candidate neighbors; the
    * downstream join is an equi-join on (bucket), not a cross join.
    */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF-style ANN: a seeded KMeans coarse quantizer assigns every vector
    * to a cell; each query probes its `nProbe` nearest cells and ranks
    * exact cosine only within them. The join is an equi-join on cell id —
    * the 100 TB shape: centroids broadcast, corpus shuffles once by cell,
    * per-query work shrinks by ~nCells/nProbe versus brute force.
    */
  def knnIvf(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, nProbe: Int, k: Int,
      fitSample: Double = 1.0, maxIter: Int = 10): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.clustering.KMeans
    val withVec = df.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol)).as("features"))
    val km = new KMeans().setK(nCells).setSeed(42L).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cell")
    // at corpus scale the coarse quantizer is fit on a seeded sample;
    // assignment still covers every vector
    val fitData =
      if (fitSample >= 1.0) withVec else withVec.sample(fitSample, 42L)
    val model = km.fit(fitData)
    val assigned = model.transform(withVec).drop("features")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // query → its nProbe nearest centroids (small: nQueries × nCells)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val centDf = centroids.toSeq.toDF("probe_cell", "centroid")
    val wProbe = Window.partitionBy(col(s"q.$idCol"))
      .orderBy(col("cent_sim").desc, col("probe_cell").asc)
    val probes = assigned.as("q").crossJoin(broadcast(centDf))
      .withColumn("cent_sim", cosine(col(s"q.$vecCol"), col("centroid")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select(col(s"q.$idCol").as("query_id"), col(s"q.$vecCol").as("qv"),
        col("probe_cell").as("cell"))
    val wK = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    probes.join(assigned.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("nv"), col("cell")), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** LSH-bucketed ANN: equi-join on bucket, then exact cosine within
    * bucket, window top-k. Trades recall for a shuffle-on-key plan that
    * scales linearly with corpus size.
    */
  def knnLsh(df: DataFrame, idCol: String, vecCol: String, nPlanes: Int, k: Int): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol), lshBucket(col(vecCol), nPlanes).as("bucket"))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    val w = Window.partitionBy(col(s"a.$idCol")).orderBy(col("cos_sim").desc, col(s"b.$idCol").asc)
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") =!= col(s"b.$idCol"))
      .withColumn("cos_sim", cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(s"a.$idCol").as("query_id"), col(s"b.$idCol").as("neighbor_id"),
        col("cos_sim"), col("rank"))
  }
}
