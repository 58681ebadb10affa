package graft.ml

import scala.util.Random

/** M10: GA hyper-parameter search (reference
  * `optimizer_plugins/default_optimizer.py:70-175` — DEAP GA with
  * per-generation stats and resumable population;
  * `modules/resume_operations.py`).
  *
  * Driver-side generational loop: genomes are unit-interval vectors the
  * caller decodes into hyper-parameters; each fitness evaluation is
  * expected to dispatch a Spark job (candidate = one distributed
  * train/eval, exactly the reference's shape). Deterministic under a
  * fixed seed; `resumeFrom` restarts from a checkpointed population.
  */
object GeneticSearch {

  case class Config(
      populationSize: Int = 20,
      generations: Int = 5,
      tournamentSize: Int = 3,
      crossoverRate: Double = 0.7,
      mutationRate: Double = 0.2,
      mutationSigma: Double = 0.15,
      eliteCount: Int = 1,
      seed: Long = 42L)

  case class GenerationStats(generation: Int, bestFitness: Double,
      meanFitness: Double, worstFitness: Double)

  case class Result(best: Vector[Double], bestFitness: Double,
      stats: Seq[GenerationStats], finalPopulation: Seq[Vector[Double]])

  /** Minimize `fitness` over [0,1]^dim. */
  def optimize(dim: Int, fitness: Vector[Double] => Double, cfg: Config = Config(),
      resumeFrom: Option[Seq[Vector[Double]]] = None): Result = {
    val rnd = new Random(cfg.seed)
    def clip(x: Double) = math.min(1.0, math.max(0.0, x))
    var population: Vector[Vector[Double]] = resumeFrom match {
      case Some(p) if p.nonEmpty => p.toVector.map(_.toVector)
      case _ => Vector.fill(cfg.populationSize)(Vector.fill(dim)(rnd.nextDouble()))
    }
    val statsBuf = scala.collection.mutable.ArrayBuffer.empty[GenerationStats]
    var scored = population.map(g => g -> fitness(g))
    var gen = 0
    while (gen < cfg.generations) {
      def tournament(): Vector[Double] =
        Seq.fill(cfg.tournamentSize)(scored(rnd.nextInt(scored.size))).minBy(_._2)._1
      val elites = scored.sortBy(_._2).take(cfg.eliteCount).map(_._1)
      val children = Vector.fill(cfg.populationSize - cfg.eliteCount) {
        val a = tournament()
        val b = tournament()
        val crossed =
          if (rnd.nextDouble() < cfg.crossoverRate)
            a.zip(b).map { case (x, y) => if (rnd.nextBoolean()) x else y }
          else a
        crossed.map(x =>
          if (rnd.nextDouble() < cfg.mutationRate)
            clip(x + rnd.nextGaussian() * cfg.mutationSigma)
          else x)
      }
      population = elites.toVector ++ children
      scored = population.map(g => g -> fitness(g))
      val fs = scored.map(_._2)
      statsBuf += GenerationStats(gen, fs.min, fs.sum / fs.size, fs.max)
      gen += 1
    }
    val (best, bf) = scored.minBy(_._2)
    Result(best, bf, statsBuf.toSeq, population)
  }
}
