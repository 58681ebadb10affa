package graft.ml

import scala.collection.mutable
import scala.util.Random

/** M10b: NEAT-style hyper-parameter search — "parameters as genes"
  * (reference `optimizer_plugins/neat_optimizer.py`; the reference's
  * published champion result is TCN+NEAT, `README.md:117-120`).
  *
  * Semantics re-expressed from the reference (file:line cites against
  * `neat_optimizer.py`):
  *   - variable-length genomes over a bounded hyper-parameter space;
  *     each genome activates a SUBSET of parameters (`NeatGenome`, :102-122)
  *   - global innovation numbers per parameter name for crossover
  *     alignment (`InnovationTracker`, :180-201)
  *   - speciation by compatibility distance
  *     `c1 * disjointExcess / N + c3 * meanNormalizedValueDiff`
  *     (:222-246), species assignment against a per-generation
  *     representative (:249-276)
  *   - fitness sharing: adjusted = raw / speciesSize (:279-287)
  *   - per-species offspring allocation proportional to
  *     1 / sum(adjustedFitness) — inverted because lower fitness is
  *     better (:948-985)
  *   - per-species elitism, survival-rate truncation selection, 25%
  *     mutation-only reproduction, rare interspecies mating (:957-1001)
  *   - structural mutations add/remove a parameter (:291-316), gaussian
  *     value mutation with sigma = 0.1 * range (:319-331), clamping
  *   - NEAT crossover: matching genes picked randomly, disjoint/excess
  *     from the fitter parent (:337-357)
  *   - patience-based early stopping on the champion fitness and
  *     checkpoint-resumable population (:520-1090)
  *
  * Like `GeneticSearch`, this is a driver-side generational loop: each
  * fitness evaluation is expected to dispatch a Spark job (candidate =
  * one distributed train/eval). The genome decodes to a
  * `Map[String, Double]` of ACTIVE parameters only; the evaluator
  * applies its own defaults for inactive ones — exactly the reference's
  * plugin contract (`to_hyper_dict`, :124-141).
  */
object NeatSearch {

  final case class Gene(innovation: Int, name: String, value: Double)

  final case class Genome(genes: Map[Int, Gene], fitness: Double = Double.NaN) {
    def activeParams: Seq[String] = genes.valuesIterator.map(_.name).toSeq.sorted
    def complexity: Int = genes.size
    def toParams: Map[String, Double] =
      genes.valuesIterator.map(g => g.name -> g.value).toMap
    def evaluated: Boolean = !fitness.isNaN
  }

  final case class Config(
      populationSize: Int = 20,
      generations: Int = 10,
      patience: Int = 6,
      mutationRate: Double = 0.2,
      addParamProb: Double = 0.15,
      removeParamProb: Double = 0.05,
      compatibilityThreshold: Double = 2.0,
      minParams: Int = 2,
      survivalRate: Double = 0.5,
      interspeciesMateRate: Double = 0.01,
      elitismPerSpecies: Int = 1,
      c1Structural: Double = 1.0,
      c3Values: Double = 0.4,
      seed: Long = 42L)

  final case class GenerationStats(generation: Int, bestFitness: Double,
      meanFitness: Double, speciesCount: Int, meanComplexity: Double)

  final case class Result(best: Genome, bestFitness: Double, bestParams: Map[String, Double],
      stats: Seq[GenerationStats], finalPopulation: Seq[Genome], evaluations: Int)

  private final class Species(val id: Int, var representative: Genome) {
    val members = mutable.ArrayBuffer.empty[Genome]
  }

  /** Minimize `fitness` over genomes drawn from `bounds` (param name →
    * (low, high)). `initialParams` seeds the starting structure (default:
    * first `minParams` bounds keys in insertion order, :446-449).
    * `resumeFrom` restarts from a checkpointed population; fitnesses are
    * re-evaluated (the evaluator is the source of truth, as in the
    * reference's resume path which re-fires unevaluated genomes).
    */
  def optimize(bounds: Seq[(String, (Double, Double))],
      fitness: Map[String, Double] => Double,
      cfg: Config = Config(),
      initialParams: Seq[String] = Nil,
      resumeFrom: Option[Seq[Genome]] = None): Result = {
    require(bounds.nonEmpty, "bounds must be non-empty")
    val rnd = new Random(cfg.seed)
    val boundsMap = bounds.toMap
    val allParams = bounds.map(_._1)
    // Innovation numbers pre-assigned in bounds order (:453-455).
    val innovation: Map[String, Int] = allParams.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap

    def randomValue(p: String): Double = {
      val (lo, hi) = boundsMap(p)
      lo + rnd.nextDouble() * (hi - lo)
    }
    def freshGenome(params: Seq[String]): Genome =
      Genome(params.map(p => innovation(p) -> Gene(innovation(p), p, randomValue(p))).toMap)

    val seedParams =
      if (initialParams.nonEmpty) initialParams
      else allParams.take(math.min(cfg.minParams, allParams.size))

    var population: Vector[Genome] = resumeFrom match {
      case Some(p) if p.nonEmpty => p.toVector.map(_.copy(fitness = Double.NaN))
      case _ => Vector.fill(cfg.populationSize)(freshGenome(seedParams))
    }

    var evaluations = 0
    def eval(g: Genome): Genome =
      if (g.evaluated) g
      else {
        evaluations += 1
        val f = fitness(g.toParams)
        g.copy(fitness = if (f.isNaN) Double.PositiveInfinity else f)
      }

    // compatibility_distance (:222-246)
    def distance(a: Genome, b: Genome): Double = {
      val ia = a.genes.keySet
      val ib = b.genes.keySet
      val matching = ia intersect ib
      val disjoint = (ia union ib).size - matching.size
      val n = math.max(math.max(a.complexity, b.complexity), 1)
      val wDiff =
        if (matching.isEmpty) 0.0
        else matching.iterator.map { i =>
          val (lo, hi) = boundsMap(a.genes(i).name)
          val range = if (hi != lo) hi - lo else 1.0
          math.abs(a.genes(i).value - b.genes(i).value) / range
        }.sum / matching.size
      cfg.c1Structural * disjoint.toDouble / n + cfg.c3Values * wDiff
    }

    def crossover(p1: Genome, p2: Genome): Genome = {
      val (fit, weak) = if (p2.fitness < p1.fitness) (p2, p1) else (p1, p2)
      val matching = fit.genes.keySet intersect weak.genes.keySet
      val fromMatch = matching.iterator.map { i =>
        i -> (if (rnd.nextBoolean()) fit.genes(i) else weak.genes(i))
      }.toMap
      val disjoint = fit.genes.view.filterKeys(i => !matching.contains(i)).toMap
      Genome(fromMatch ++ disjoint)
    }

    def mutate(g0: Genome): Genome = {
      var genes = g0.genes
      // add (:291-307)
      if (rnd.nextDouble() < cfg.addParamProb) {
        val active = genes.valuesIterator.map(_.name).toSet
        val candidates = allParams.filterNot(active)
        if (candidates.nonEmpty) {
          val p = candidates(rnd.nextInt(candidates.size))
          genes = genes.updated(innovation(p), Gene(innovation(p), p, randomValue(p)))
        }
      }
      // remove (:310-316)
      if (rnd.nextDouble() < cfg.removeParamProb && genes.size > cfg.minParams) {
        val keys = genes.keys.toSeq
        genes = genes - keys(rnd.nextInt(keys.size))
      }
      // value mutation + clamp (:319-336)
      genes = genes.map { case (i, gene) =>
        if (rnd.nextDouble() < cfg.mutationRate) {
          val (lo, hi) = boundsMap(gene.name)
          val sigma = (hi - lo) * 0.1
          val v = math.max(lo, math.min(hi, gene.value + rnd.nextGaussian() * sigma))
          i -> gene.copy(value = v)
        } else i -> gene
      }
      Genome(genes)
    }

    val speciesList = mutable.ArrayBuffer.empty[Species]
    var nextSpeciesId = 0
    val statsBuf = mutable.ArrayBuffer.empty[GenerationStats]
    var champion: Genome = null
    var patienceCount = 0
    var gen = 0

    while (gen < cfg.generations && patienceCount < cfg.patience) {
      population = population.map(eval)

      // speciate (:249-276)
      speciesList.foreach(_.members.clear())
      population.foreach { g =>
        speciesList.find(sp => distance(g, sp.representative) < cfg.compatibilityThreshold) match {
          case Some(sp) => sp.members += g
          case None =>
            nextSpeciesId += 1
            val sp = new Species(nextSpeciesId, g)
            sp.members += g
            speciesList += sp
        }
      }
      speciesList.filterInPlace(_.members.nonEmpty)
      speciesList.foreach(sp => sp.representative = sp.members(rnd.nextInt(sp.members.size)))

      val genBest = population.minBy(_.fitness)
      if (champion == null || genBest.fitness < champion.fitness) {
        champion = genBest
        patienceCount = 0
      } else patienceCount += 1

      statsBuf += GenerationStats(gen,
        genBest.fitness,
        population.map(_.fitness).filter(f => !f.isInfinite).reduceOption(_ + _)
          .map(_ / math.max(1, population.count(!_.fitness.isInfinite))).getOrElse(Double.PositiveInfinity),
        speciesList.size,
        population.map(_.complexity).sum.toDouble / population.size)

      // reproduction (:948-1021): fitness sharing then proportional
      // allocation on inverted per-species adjusted sums. A species with
      // NO finite-fitness member gets weight 0 — the 1e-10 clamp alone
      // would invert the intent and hand an all-failure species nearly
      // the whole next generation (1/1e-10 dominates the total).
      val spWeight: Map[Int, Double] = speciesList.iterator.map { sp =>
        val finite = sp.members.iterator.map(_.fitness).filter(f => !f.isInfinite).toSeq
        val w =
          if (finite.isEmpty) 0.0
          else 1.0 / math.max(finite.map(_ / math.max(sp.members.size, 1)).sum, 1e-10)
        sp.id -> w
      }.toMap
      val invTotal = spWeight.valuesIterator.sum

      val next = mutable.ArrayBuffer.empty[Genome]
      speciesList.foreach { sp =>
        val sorted = sp.members.sortBy(_.fitness)
        sorted.take(cfg.elitismPerSpecies).foreach(next += _)
        val survivors = sorted.take(math.max(1, (sorted.size * cfg.survivalRate).toInt))
        val nOffspring = math.max(0,
          math.round(cfg.populationSize * spWeight(sp.id) / math.max(invTotal, 1e-10)).toInt
            - cfg.elitismPerSpecies)
        var i = 0
        while (i < nOffspring) {
          val child =
            if (survivors.size < 2 || rnd.nextDouble() < 0.25) survivors(rnd.nextInt(survivors.size))
            else {
              val p2 =
                if (rnd.nextDouble() < cfg.interspeciesMateRate && speciesList.size > 1) {
                  val others = speciesList.filter(_.id != sp.id)
                  val osp = others(rnd.nextInt(others.size))
                  osp.members(rnd.nextInt(osp.members.size))
                } else survivors(rnd.nextInt(survivors.size))
              crossover(survivors(rnd.nextInt(survivors.size)), p2)
            }
          next += mutate(child.copy(fitness = Double.NaN))
          i += 1
        }
      }
      while (next.size < cfg.populationSize) next += freshGenome(seedParams)
      population = next.take(cfg.populationSize).toVector
      gen += 1
    }

    population = population.map(eval)
    val finalBest = population.minBy(_.fitness)
    if (champion == null || finalBest.fitness < champion.fitness) champion = finalBest
    Result(champion, champion.fitness, champion.toParams, statsBuf.toSeq, population, evaluations)
  }
}
