package graft.ml

import org.scalatest.funsuite.AnyFunSuite

class NeatSearchSpec extends AnyFunSuite {

  // Multimodal objective over a 10-parameter space where only p0/p1
  // matter: a shifted two-dimensional Rastrigin (many local minima)
  // plus a cost for every ADDITIONAL active parameter — mirroring the
  // reference's setting where activating a hyper-parameter means the
  // model must also tune it well. A fixed-length GA must carry all 10;
  // NEAT's variable-length genomes can keep the structure minimal.
  private val bounds: Seq[(String, (Double, Double))] =
    ("p0" -> (0.0, 1.0)) +: ("p1" -> (0.0, 1.0)) +:
      (2 until 10).map(i => s"p$i" -> (0.0, 1.0))

  private def rastrigin2(x: Double, y: Double): Double = {
    def r(v: Double, opt: Double): Double = {
      val z = (v - opt) * 4.0 // stretch so [0,1] spans several ripples
      z * z - 3.0 * math.cos(2.0 * math.Pi * z) + 3.0
    }
    r(x, 0.3) + r(y, 0.7)
  }

  private def objective(params: Map[String, Double]): Double = {
    val core = rastrigin2(params.getOrElse("p0", 0.0), params.getOrElse("p1", 0.0))
    val extras = params.keysIterator.count(k => k != "p0" && k != "p1")
    core + extras * (0.4 + params.filterNot(kv => kv._1 == "p0" || kv._1 == "p1")
      .valuesIterator.map(v => math.abs(v - 0.5)).foldLeft(0.0)(_ + _) / math.max(extras, 1))
  }

  test("speciated NEAT beats plain GA on the multimodal subset-selection objective") {
    // Threshold 0.25: genomes sharing the (p0,p1) structure but sitting in
    // different Rastrigin basins speciate apart (distance is then purely
    // the c3-weighted value diff), so niches explore basins in parallel —
    // the property this objective is built to exercise.
    val neat = NeatSearch.optimize(bounds, objective,
      NeatSearch.Config(populationSize = 24, generations = 30, patience = 30,
        compatibilityThreshold = 0.25, removeParamProb = 0.15, seed = 7L),
      initialParams = Seq("p0", "p1"))
    // Honest GA encoding of the same problem: all 10 params always active.
    val names = bounds.map(_._1)
    val ga = GeneticSearch.optimize(10,
      g => objective(names.zip(g).toMap),
      GeneticSearch.Config(populationSize = 24, generations = 30, seed = 7L))
    assert(neat.bestFitness < ga.bestFitness,
      s"neat=${neat.bestFitness} ga=${ga.bestFitness}")
    // NEAT should have found (close to) the minimal structure — the two
    // real params, at most one spurious survivor — and the global basin.
    val active = neat.best.activeParams
    assert(active.contains("p0") && active.contains("p1") && active.size <= 3,
      s"active=$active")
    // Within the two innermost Rastrigin basins per dim (local minima at
    // |z|=1 cost ~1 each; random structure-bloated genomes score 3-10+).
    assert(neat.bestFitness < 1.5, s"bestFitness=${neat.bestFitness}")
  }

  test("speciation maintains >1 species; complexity stays bounded by minParams") {
    val r = NeatSearch.optimize(bounds, objective,
      NeatSearch.Config(populationSize = 24, generations = 10, patience = 10,
        compatibilityThreshold = 0.25, seed = 3L))
    assert(r.stats.exists(_.speciesCount > 1), r.stats.map(_.speciesCount).mkString(","))
    assert(r.finalPopulation.forall(_.complexity >= 2))
    assert(r.stats.last.bestFitness <= r.stats.head.bestFitness)
  }

  test("deterministic under a fixed seed; resume re-evaluates and continues") {
    val a = NeatSearch.optimize(bounds, objective,
      NeatSearch.Config(populationSize = 12, generations = 5, seed = 11L))
    val b = NeatSearch.optimize(bounds, objective,
      NeatSearch.Config(populationSize = 12, generations = 5, seed = 11L))
    assert(a.bestParams == b.bestParams && a.bestFitness == b.bestFitness)
    val resumed = NeatSearch.optimize(bounds, objective,
      NeatSearch.Config(populationSize = 12, generations = 3, seed = 11L),
      resumeFrom = Some(a.finalPopulation))
    assert(resumed.bestFitness <= a.bestFitness + 1e-12)
  }

  test("all-failure regions get zero offspring weight; NaN evaluators don't crash") {
    // fitness: finite only when p0/p1 stay, NaN (→ +inf) when any extra
    // param is active — species drifting into the failure region must
    // not be rewarded with the whole next generation.
    val r = NeatSearch.optimize(bounds,
      params => if (params.keySet == Set("p0", "p1")) params.values.sum else Double.NaN,
      NeatSearch.Config(populationSize = 10, generations = 6, patience = 6,
        addParamProb = 0.5, compatibilityThreshold = 0.25, seed = 2L))
    assert(!r.bestFitness.isInfinite && !r.bestFitness.isNaN)
    assert(r.best.activeParams == Seq("p0", "p1"))
  }

  test("patience stops early when the champion stagnates") {
    // Constant fitness → champion never improves → stop after `patience`
    // generations instead of running all 50.
    val r = NeatSearch.optimize(bounds, _ => 1.0,
      NeatSearch.Config(populationSize = 8, generations = 50, patience = 3, seed = 1L))
    assert(r.stats.size <= 5, s"ran ${r.stats.size} generations")
    assert(r.bestFitness == 1.0)
  }
}
