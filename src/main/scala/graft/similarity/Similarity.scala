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

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

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
