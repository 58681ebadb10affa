package graft.ml

import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** M8 nonlinear-NN head: a 1-hidden-layer tanh MLP regressor — the
  * Spark-native step past linear/GBT toward the reference's Keras model
  * zoo (`predictor_plugins/predictor_plugin_*.py`), within public Spark
  * (MLlib ships `MultilayerPerceptronClassifier` but no regressor).
  *
  * Training is DISTRIBUTED full-batch gradient descent in the same
  * architecture MLlib's own optimizers use: per epoch, one
  * `treeAggregate` over the cached (features, label) rows computes the
  * exact MSE gradient (forward + backprop per row, partial sums merged
  * tree-wise), the driver applies a momentum update to the O(hidden·d)
  * weight vector, and the new weights broadcast for the next epoch. Data
  * never concentrates: per-epoch cost is one pass, identical in shape to
  * a `LinearRegression` LBFGS iteration, so the head scales exactly as
  * far as the other heads do. Inputs/labels are standardized (fit from
  * one aggregate) for conditioning; scaling folds into the model so
  * `predict` takes raw features.
  *
  * Determinism: seeded Xavier init, fixed epoch count, tree-merged
  * gradient sums (floating addition order varies with partitioning like
  * every distributed LinearRegression fit — fits are spec-checked by
  * quality, not bitwise, same as the GBT head).
  */
object MlpRegressor {

  /** Fitted model; `predict` = tanh MLP forward pass on raw features. */
  class MlpRegressionModel(
      override val uid: String,
      val hidden: Int,
      val w1: Array[Double], // hidden × d, row-major
      val b1: Array[Double],
      val w2: Array[Double],
      val b2: Double,
      val featMean: Array[Double],
      val featStd: Array[Double],
      val labelMean: Double,
      val labelStd: Double)
    extends PredictionModel[Vector, MlpRegressionModel] {

    override def numFeatures: Int = featMean.length

    override def predict(features: Vector): Double = {
      val d = featMean.length
      var out = 0.0
      var h = 0
      while (h < hidden) {
        var z = b1(h)
        var j = 0
        while (j < d) {
          z += w1(h * d + j) * ((features(j) - featMean(j)) / featStd(j))
          j += 1
        }
        out += w2(h) * math.tanh(z)
        h += 1
      }
      (out + b2) * labelStd + labelMean
    }

    override def copy(extra: ParamMap): MlpRegressionModel = copyValues(
      new MlpRegressionModel(uid, hidden, w1, b1, w2, b2,
        featMean, featStd, labelMean, labelStd), extra)

    override def toString: String = s"MlpRegressionModel(uid=$uid, hidden=$hidden, d=$numFeatures)"
  }

  /** Fit on an assembled frame (featuresCol: MLlib Vector, labelCol
    * numeric) — the `fitPerHorizonWith` callback contract.
    */
  def fit(df: DataFrame, labelCol: String, hidden: Int = 8, epochs: Int = 300,
      lr: Double = 0.1, momentum: Double = 0.9, seed: Long = 42L,
      featuresCol: String = "features"): MlpRegressionModel = {
    val sc = df.sparkSession.sparkContext
    val data = df.select(col(featuresCol), col(labelCol).cast("double"))
      .rdd.map(r => (r.getAs[Vector](0), r.getDouble(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val head = data.take(1)
      require(head.nonEmpty, "MlpRegressor.fit: empty training set")
      val d = head(0)._1.size
      // standardization stats in one pass: per-dim sum/sumsq + label moments
      val zero = (new Array[Double](d), new Array[Double](d), 0.0, 0.0, 0L)
      val (sx, sxx, sy, syy, n) = data.treeAggregate(zero)(
        seqOp = { case ((sx, sxx, sy, syy, n), (x, y)) =>
          var j = 0
          while (j < d) { val v = x(j); sx(j) += v; sxx(j) += v * v; j += 1 }
          (sx, sxx, sy + y, syy + y * y, n + 1)
        },
        combOp = { case ((ax, axx, ay, ayy, an), (bx, bxx, by, byy, bn)) =>
          var j = 0
          while (j < d) { ax(j) += bx(j); axx(j) += bxx(j); j += 1 }
          (ax, axx, ay + by, ayy + byy, an + bn)
        })
      require(n > 0, "MlpRegressor.fit: empty training set")
      def std(sum: Double, sumsq: Double): Double = {
        val v = math.max(sumsq / n - (sum / n) * (sum / n), 0.0)
        val s = math.sqrt(v)
        if (s < 1e-12) 1.0 else s // constant column: center only
      }
      val fMean = Array.tabulate(d)(j => sx(j) / n)
      val fStd = Array.tabulate(d)(j => std(sx(j), sxx(j)))
      val yMean = sy / n
      val yStd = std(sy, syy)

      // seeded Xavier init over the flat weight vector [w1 | b1 | w2 | b2]
      val nW = hidden * d + hidden + hidden + 1
      val rnd = new java.util.Random(seed)
      val weights = new Array[Double](nW)
      var i = 0
      while (i < hidden * d) { weights(i) = rnd.nextGaussian() * math.sqrt(1.0 / d); i += 1 }
      i = hidden * d + hidden // skip b1 (zeros)
      while (i < hidden * d + hidden + hidden) {
        weights(i) = rnd.nextGaussian() * math.sqrt(1.0 / hidden); i += 1
      }
      val velocity = new Array[Double](nW)

      var epoch = 0
      while (epoch < epochs) {
        val bc = sc.broadcast(weights.clone())
        val grad = data.treeAggregate(new Array[Double](nW))(
          seqOp = { case (g, (x, y)) =>
            val w = bc.value
            val ys = (y - yMean) / yStd
            // forward
            val a1 = new Array[Double](hidden)
            var out = w(hidden * d + hidden + hidden) // b2
            var h = 0
            while (h < hidden) {
              var z = w(hidden * d + h) // b1(h)
              var j = 0
              while (j < d) { z += w(h * d + j) * ((x(j) - fMean(j)) / fStd(j)); j += 1 }
              a1(h) = math.tanh(z)
              out += w(hidden * d + hidden + h) * a1(h)
              h += 1
            }
            // backprop of ½(out − ys)²
            val err = out - ys
            g(hidden * d + hidden + hidden) += err // b2
            h = 0
            while (h < hidden) {
              g(hidden * d + hidden + h) += err * a1(h) // w2
              val d1 = err * w(hidden * d + hidden + h) * (1.0 - a1(h) * a1(h))
              g(hidden * d + h) += d1 // b1
              var j = 0
              while (j < d) { g(h * d + j) += d1 * ((x(j) - fMean(j)) / fStd(j)); j += 1 }
              h += 1
            }
            g
          },
          combOp = { (a, b) =>
            var k = 0
            while (k < nW) { a(k) += b(k); k += 1 }
            a
          })
        bc.destroy()
        var k = 0
        while (k < nW) {
          velocity(k) = momentum * velocity(k) - lr * grad(k) / n
          weights(k) += velocity(k)
          k += 1
        }
        epoch += 1
      }

      new MlpRegressionModel(
        s"mlp_${java.util.UUID.randomUUID().toString.take(8)}",
        hidden,
        java.util.Arrays.copyOfRange(weights, 0, hidden * d),
        java.util.Arrays.copyOfRange(weights, hidden * d, hidden * d + hidden),
        java.util.Arrays.copyOfRange(weights, hidden * d + hidden, hidden * d + 2 * hidden),
        weights(nW - 1),
        fMean, fStd, yMean, yStd)
    } finally { data.unpersist(blocking = false); () }
  }

  /** S11 artifact sink: weights + scaling as one parquet row. */
  def save(model: MlpRegressionModel, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    Seq((model.uid, model.hidden, model.w1.toSeq, model.b1.toSeq, model.w2.toSeq,
        model.b2, model.featMean.toSeq, model.featStd.toSeq,
        model.labelMean, model.labelStd))
      .toDF("uid", "hidden", "w1", "b1", "w2", "b2",
        "feat_mean", "feat_std", "label_mean", "label_std")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** S11 artifact source. */
  def load(spark: SparkSession, path: String): MlpRegressionModel = {
    val r = spark.read.parquet(path).head()
    new MlpRegressionModel(
      r.getAs[String]("uid"), r.getAs[Int]("hidden"),
      r.getAs[Seq[Double]]("w1").toArray, r.getAs[Seq[Double]]("b1").toArray,
      r.getAs[Seq[Double]]("w2").toArray, r.getAs[Double]("b2"),
      r.getAs[Seq[Double]]("feat_mean").toArray, r.getAs[Seq[Double]]("feat_std").toArray,
      r.getAs[Double]("label_mean"), r.getAs[Double]("label_std"))
  }
}
