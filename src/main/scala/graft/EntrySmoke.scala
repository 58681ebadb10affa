package graft
import org.apache.spark.sql.SparkSession

/** The driver's entry smoke as a main (`gate.sh` leg): the flagship
  * `SparkEntry.entry` must return rows on sf0.001. The driver runs the
  * same check at round start; failing it here keeps a broken entry from
  * surviving to the round gate.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRYROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
