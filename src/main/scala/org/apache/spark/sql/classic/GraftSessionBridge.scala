package org.apache.spark.sql.classic

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSessionExtensions

/** classic-package half of the session bridge: the extensions-bearing
  * SparkSession constructor is private[classic].
  */
private[sql] object GraftSessionBridge {
  def withExtensions(sc: SparkContext,
      configure: SparkSessionExtensions => Unit): SparkSession = {
    val ext = new SparkSessionExtensions
    configure(ext)
    // the extensions-bearing constructor is Scala-private but
    // bytecode-public; reflection is the stable way in
    val ctor = classOf[SparkSession].getConstructor(
      classOf[SparkContext], classOf[Option[_]], classOf[Option[_]],
      classOf[SparkSessionExtensions],
      classOf[scala.collection.immutable.Map[_, _]],
      classOf[scala.collection.immutable.Map[_, _]])
    ctor.newInstance(sc, None, None, ext,
      Map.empty[String, String], Map.empty[String, String])
  }
}
