package graft.ml

import org.scalatest.funsuite.AnyFunSuite

class GeneticSearchSpec extends AnyFunSuite {

  private val target = Vector(0.3, 0.7, 0.5)
  private def sphere(g: Vector[Double]): Double =
    g.zip(target).map { case (x, t) => (x - t) * (x - t) }.sum

  test("converges toward the optimum and improves monotonically-ish") {
    val r = GeneticSearch.optimize(3, sphere,
      GeneticSearch.Config(populationSize = 30, generations = 15))
    assert(r.bestFitness < 0.02, s"bestFitness=${r.bestFitness}")
    assert(r.stats.head.bestFitness >= r.stats.last.bestFitness)
    assert(r.stats.size == 15 && r.finalPopulation.size == 30)
  }

  test("deterministic under a fixed seed; resume continues from a population") {
    val a = GeneticSearch.optimize(3, sphere)
    val b = GeneticSearch.optimize(3, sphere)
    assert(a.best == b.best && a.bestFitness == b.bestFitness)
    val resumed = GeneticSearch.optimize(3, sphere,
      GeneticSearch.Config(generations = 5),
      resumeFrom = Some(a.finalPopulation))
    assert(resumed.bestFitness <= a.bestFitness + 1e-12)
  }
}
