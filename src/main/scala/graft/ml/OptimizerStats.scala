package graft.ml

/** The reference's optimizer output files (`app/main.py:281-284`;
  * golden shapes `examples/results/phase_1_daily/
  * phase_1_tcn_neat_1d_optimization_stats.json` and
  * `…_optimization_parameters.json`): a stats JSON with champion
  * metrics, NEAT population shape, and per-generation history, plus a
  * flat best-hyperparameter dict. This module renders a
  * [[NeatSearch.Result]] (+ champion split metrics) into those exact
  * key shapes so downstream tooling pointed at the reference's files
  * reads ours unchanged. Rendering is pure string building — key order
  * fixed, doubles via `java.lang.Double.toString` (the same shortest
  * round-trip form Python's json emits for floats).
  */
object OptimizerStats {

  private def num(v: Double): String =
    if (v.isNaN || v.isInfinite) "null" // bare NaN/Infinity is invalid JSON
    else if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString
    else java.lang.Double.toString(v)

  /** Champion metric values per (split, metric-suffix) — validation /
    * test / train MAE and naive MAE, reference key spelling.
    */
  final case class ChampionMetrics(
      fitness: Double,
      validationMae: Double, validationNaiveMae: Double,
      testMae: Double, testNaiveMae: Double,
      trainMae: Double, trainNaiveMae: Double)

  /** `*_optimization_stats.json` (NEAT variant): same top-level,
    * species-detail, and history-entry key sets as the reference
    * golden. `genDurations(i)` = wall seconds of generation i;
    * `championPerGen` = (fitness, valMae, valNaiveMae) of the GLOBAL
    * champion as of each generation.
    */
  def neatStatsJson(result: NeatSearch.Result, totalSeconds: Double,
      champ: ChampionMetrics, genDurations: Seq[Double],
      championPerGen: Seq[(Double, Double, Double)]): String = {
    val pop = result.finalPopulation
    val complexities = pop.map(_.complexity.toDouble)
    val avgC = if (complexities.isEmpty) 0.0 else complexities.sum / complexities.size
    // the final population carries no per-genome species assignment, so
    // details is a single whole-population rollup row; the top-level
    // count must agree with it (1) — per-generation species counts live
    // in each history row's species_count, where the assignment existed
    val speciesCount = 1
    val details =
      s"""[{"id": 1, "size": ${pop.size}, "best_fitness": ${num(result.bestFitness)}, "avg_complexity": ${num(avgC)}}]"""
    val history = result.stats.zipWithIndex.map { case (g, i) =>
      val (cf, cv, cn) = championPerGen.lift(i)
        .getOrElse((result.bestFitness, champ.validationMae, champ.validationNaiveMae))
      s"""{"generation": ${g.generation}, "duration": ${num(genDurations.lift(i).getOrElse(0.0))}, """ +
        s""""avg_fitness": ${num(g.meanFitness)}, "best_fitness_gen": ${num(g.bestFitness)}, """ +
        s""""champion_fitness_global": ${num(cf)}, "champion_validation_mae_global": ${num(cv)}, """ +
        s""""champion_validation_naive_mae_global": ${num(cn)}, "species_count": ${g.speciesCount}, """ +
        s""""avg_complexity": ${num(g.meanComplexity)}}"""
    }.mkString("[", ", ", "]")
    s"""{"optimizer_type": "neat", "total_time_elapsed": ${num(totalSeconds)}, """ +
      s""""candidates_evaluated_so_far": ${result.evaluations}, """ +
      s""""champion_fitness": ${num(champ.fitness)}, """ +
      s""""champion_validation_mae": ${num(champ.validationMae)}, """ +
      s""""champion_validation_naive_mae": ${num(champ.validationNaiveMae)}, """ +
      s""""champion_test_mae": ${num(champ.testMae)}, """ +
      s""""champion_test_naive_mae": ${num(champ.testNaiveMae)}, """ +
      s""""champion_train_mae": ${num(champ.trainMae)}, """ +
      s""""champion_train_naive_mae": ${num(champ.trainNaiveMae)}, """ +
      s""""neat_species_count": $speciesCount, "neat_avg_complexity": ${num(avgC)}, """ +
      s""""neat_max_complexity": ${num(complexities.maxOption.getOrElse(0.0))}, """ +
      s""""neat_min_complexity": ${num(complexities.minOption.getOrElse(0.0))}, """ +
      s""""neat_species_details": $details, "history": $history}"""
  }

  /** `*_optimization_stats.json` (GA/mimo variant — the reference's
    * DEAP optimizer shape, `phase_1_mimo_1d_optimization_stats.json`):
    * per-epoch arrays plus a history with gen-best validation metrics.
    * `perGen(i)` = (avgFitness, bestFitnessGen, bestValMaeGen,
    * bestValNaiveMaeGen, championFitnessGlobal, championValMaeGlobal,
    * championValNaiveMaeGlobal) for generation i.
    */
  def gaStatsJson(result: GeneticSearch.Result, totalSeconds: Double,
      evaluations: Int, champ: ChampionMetrics, genDurations: Seq[Double],
      perGen: Seq[(Double, Double, Double, Double, Double, Double, Double)]): String = {
    val nGen = math.max(1, result.stats.size)
    def arr(f: ((Double, Double, Double, Double, Double, Double, Double)) => Double) =
      perGen.map(t => num(f(t))).mkString("[", ", ", "]")
    val history = result.stats.zipWithIndex.map { case (g, i) =>
      val (avgF, bestF, bestV, bestN, cf, cv, cn) = perGen(i)
      s"""{"generation": ${g.generation}, "duration": ${num(genDurations.lift(i).getOrElse(0.0))}, """ +
        s""""avg_fitness": ${num(avgF)}, "best_validation_mae_gen": ${num(bestV)}, """ +
        s""""best_fitness_gen": ${num(bestF)}, "champion_fitness_global": ${num(cf)}, """ +
        s""""champion_validation_mae_global": ${num(cv)}, """ +
        s""""best_validation_naive_mae_gen": ${num(bestN)}, """ +
        s""""champion_validation_naive_mae_global": ${num(cn)}}"""
    }.mkString("[", ", ", "]")
    s"""{"total_time_elapsed": ${num(totalSeconds)}, """ +
      s""""average_time_per_epoch": ${num(totalSeconds / nGen)}, """ +
      s""""candidates_evaluated_so_far": $evaluations, """ +
      s""""champion_fitness": ${num(champ.fitness)}, """ +
      s""""champion_validation_mae": ${num(champ.validationMae)}, """ +
      s""""champion_validation_naive_mae": ${num(champ.validationNaiveMae)}, """ +
      s""""champion_test_mae": ${num(champ.testMae)}, """ +
      s""""champion_test_naive_mae": ${num(champ.testNaiveMae)}, """ +
      s""""champion_train_mae": ${num(champ.trainMae)}, """ +
      s""""champion_train_naive_mae": ${num(champ.trainNaiveMae)}, """ +
      s""""average_fitness_per_epoch": ${arr(_._1)}, """ +
      s""""champion_fitness_per_epoch": ${arr(_._5)}, """ +
      s""""champion_validation_mae_per_epoch": ${arr(_._6)}, """ +
      s""""best_fitness_per_epoch": ${arr(_._2)}, """ +
      s""""best_validation_mae_per_epoch": ${arr(_._3)}, """ +
      s""""history": $history}"""
  }

  /** `*_optimization_parameters.json`: the flat best-hyperparameter
    * dict (ints rendered as ints, like the reference's
    * `phase_1_tcn_neat_1d_optimization_parameters.json`).
    */
  def parametersJson(params: Map[String, Double]): String =
    params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": ${num(v)}""" }
      .mkString("{", ", ", "}")

  /** `*_optimization_resume.json` (the reference's NEAT checkpoint,
    * `modules/resume_operations.py` /
    * `phase_1_tcn_neat_1d_optimization_resume.json`): generation +
    * population, each genome as `{genes: {"<innov>": {innovation,
    * param_name, value}}, fitness, species_id}`. Unevaluated fitness
    * (NaN) serializes as null, the JSON-representable form; the
    * resume path re-evaluates those, matching the reference's
    * re-fire-unevaluated contract.
    */
  def neatResumeJson(generation: Int,
      population: Seq[NeatSearch.Genome]): String = {
    val genomes = population.map { g =>
      val genes = g.genes.toSeq.sortBy(_._1).map { case (innov, gene) =>
        s""""$innov": {"innovation": ${gene.innovation}, """ +
          s""""param_name": "${gene.name}", "value": ${num(gene.value)}}"""
      }.mkString("{", ", ", "}")
      val fit = if (g.fitness.isNaN) "null" else num(g.fitness)
      s"""{"genes": $genes, "fitness": $fit, "species_id": 1}"""
    }.mkString("[", ", ", "]")
    s"""{"generation": $generation, "population": $genomes}"""
  }

  /** Parse a resume checkpoint (ours or a reference-shaped one) back
    * into `(generation, population)` for `NeatSearch.optimize`'s
    * `resumeFrom`. Jackson databind — the same parser family the q62
    * JSON operators use, already on Spark's classpath.
    */
  def parseNeatResume(json: String): (Int, Seq[NeatSearch.Genome]) = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val generation = root.path("generation").asInt(0)
    val pop = scala.collection.mutable.ArrayBuffer.empty[NeatSearch.Genome]
    val it = root.path("population").elements()
    while (it.hasNext) {
      val g = it.next()
      val genes = scala.collection.mutable.Map.empty[Int, NeatSearch.Gene]
      val fields = g.path("genes").fields()
      while (fields.hasNext) {
        val e = fields.next()
        // prefer a NUMERIC innovation field; fall back to the map key
        // when the field is missing OR non-numeric (Jackson's asInt
        // would silently yield 0 there, colliding with a real gene 0),
        // so a reference-shaped file stays parseable whichever side
        // carries the number
        val innovNode = e.getValue.path("innovation")
        val innov =
          if (innovNode.canConvertToInt) innovNode.asInt() else e.getKey.toInt
        genes(innov) = NeatSearch.Gene(innov,
          e.getValue.path("param_name").asText(),
          e.getValue.path("value").asDouble())
      }
      val fitNode = g.path("fitness")
      val fit = if (fitNode.isNull || fitNode.isMissingNode) Double.NaN
        else fitNode.asDouble()
      pop += NeatSearch.Genome(genes.toMap, fit)
    }
    (generation, pop.toSeq)
  }
}
