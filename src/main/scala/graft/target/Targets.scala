package graft.target

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Supervised-target construction over an ordered series (SURVEY §2.4
  * W6–W9). The reference builds these as NumPy slices of the close
  * series (`default_target.py:36-86`, `phase2_6_preprocessor.py:790-843`,
  * `data_processor copy.py:51-123`); here each target is a `lead` over
  * the per-series window so the whole block is one window pass —
  * Catalyst's CollapseWindow fuses every horizon into a single sort, and
  * at 100 TB the only shuffle is the window's partitioning on the series
  * key (no shuffle at all when upstream already partitioned on it).
  *
  * Trim contract (all four faces): the reference truncates every split
  * to `len − max(horizon)` usable rows (`default_target.py:63-70`), which
  * in window form is "keep rows whose max-horizon lead exists" — the
  * filter runs on the already-computed lead column, adding no extra
  * window pass.
  */
object Targets {

  /** W6 direct multi-horizon targets: `target_h{h} = value[t+h]` for each
    * horizon, trimmed to rows where the max-horizon target exists
    * (reference `default_target.py:36-86`).
    */
  def multiHorizon(df: DataFrame, valueCol: String, horizons: Seq[Int],
      w: WindowSpec): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(_ > 0),
      s"horizons must be positive, got $horizons")
    val maxH = horizons.max
    val withTargets = horizons.foldLeft(df) { (d, h) =>
      d.withColumn(s"target_h$h", lead(col(valueCol), h).over(w))
    }
    withTargets.filter(col(s"target_h$maxH").isNotNull)
  }

  /** W7 return targets on the denormalized series:
    * `ret_h{h} = value[t+h] − value[t]`, same max-horizon trim
    * (reference `phase2_6_preprocessor.py:790-843`). The trim tests the
    * LEAD itself (not the difference) so a null current value cannot
    * resurrect a trimmed tail row.
    */
  def multiHorizonReturns(df: DataFrame, valueCol: String, horizons: Seq[Int],
      w: WindowSpec): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(_ > 0),
      s"horizons must be positive, got $horizons")
    val maxH = horizons.max
    val withRets = horizons.foldLeft(df) { (d, h) =>
      d.withColumn(s"ret_h$h", lead(col(valueCol), h).over(w) - col(valueCol))
    }
    withRets
      .withColumn("__trim", lead(col(valueCol), maxH).over(w))
      .filter(col("__trim").isNotNull)
      .drop("__trim")
  }

  /** W8 multi-step target block: all steps `t+1 … t+h` as ONE array
    * column (reference `data_processor copy.py:51-84`), trimmed so every
    * row's block is complete.
    */
  def multiStepBlock(df: DataFrame, valueCol: String, steps: Int,
      w: WindowSpec, outCol: String = "target_block"): DataFrame = {
    require(steps > 0, s"steps must be positive, got $steps")
    df.withColumn(outCol,
        array((1 to steps).map(i => lead(col(valueCol), i).over(w)): _*))
      .filter(element_at(col(outCol), steps).isNotNull)
  }

  /** W9 daily multi-step targets from an hourly series: step d lands at
    * `t + d*stepsPerDay`, d = 1…days (reference
    * `data_processor copy.py:87-123`), trimmed at the last day.
    */
  def dailySteps(df: DataFrame, valueCol: String, days: Int,
      w: WindowSpec, stepsPerDay: Int = 24): DataFrame = {
    require(days > 0 && stepsPerDay > 0,
      s"days/stepsPerDay must be positive, got $days/$stepsPerDay")
    val withDays = (1 to days).foldLeft(df) { (d, day) =>
      d.withColumn(s"target_d$day",
        lead(col(valueCol), day * stepsPerDay).over(w))
    }
    withDays.filter(col(s"target_d$days").isNotNull)
  }
}
