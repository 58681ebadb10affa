package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The optimizer output-file parity gate (SURVEY §5 last output
  * family): the committed `golden/phase_1/` optimization artifacts must
  * carry the reference's exact key shapes
  * (`phase_1_tcn_neat_1d_optimization_stats.json` /
  * `…_optimization_parameters.json`), diffed directly against the
  * reference goldens when the checkout is present. Values are checked
  * structurally (real search output, wall-clock timings allowed);
  * key SETS and JSON well-formedness are exact.
  */
class OptimizationGoldenSpec extends AnyFunSuite {

  private val dir = "golden/phase_1"

  // dependency-free structural JSON reader: key extraction via the JDK
  // is unavailable offline, so parse with a minimal recursive scanner
  private def read(f: String): String = {
    val p = java.nio.file.Paths.get(s"$dir/$f")
    assert(java.nio.file.Files.exists(p),
      s"committed optimizer golden missing: $p — run `runMain graft.pipeline.OptimizationGoldenRun`")
    java.nio.file.Files.readString(p)
  }

  /** Keys of the top-level (or first-object-at-depth-1 for arrays)
    * object in a JSON string — quotes-then-colon scan at the given
    * brace depth, enough for these flat-keyed reference shapes.
    */
  private def keysAtTopLevel(json: String): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    var depth = 0; var i = 0; var inStr = false; var cur = new StringBuilder
    var lastStr = ""
    while (i < json.length) {
      val c = json.charAt(i)
      if (inStr) {
        if (c == '\\') { cur.append(c); i += 1; if (i < json.length) cur.append(json.charAt(i)) }
        else if (c == '"') { inStr = false; lastStr = cur.toString; cur = new StringBuilder }
        else cur.append(c)
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ':' if depth == 1 => out += lastStr
        case _ => ()
      }
      i += 1
    }
    out.toSet
  }

  private def firstObjectOf(json: String, arrayKey: String): String = {
    val start = json.indexOf("\"" + arrayKey + "\"")
    assert(start >= 0, s"missing array $arrayKey")
    val ob = json.indexOf('{', start)
    var depth = 0; var i = ob
    while (i < json.length) {
      json.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) return json.substring(ob, i + 1)
        case _ => ()
      }
      i += 1
    }
    fail(s"unterminated object in $arrayKey")
  }

  test("stats JSON carries the reference's top-level, history, and species key sets") {
    val ours = read("graft_phase_1_mlp_neat_optimization_stats.json")
    val expectedTop = Set("optimizer_type", "total_time_elapsed",
      "candidates_evaluated_so_far", "champion_fitness",
      "champion_validation_mae", "champion_validation_naive_mae",
      "champion_test_mae", "champion_test_naive_mae", "champion_train_mae",
      "champion_train_naive_mae", "neat_species_count", "neat_avg_complexity",
      "neat_max_complexity", "neat_min_complexity", "neat_species_details",
      "history")
    assert(keysAtTopLevel(ours) == expectedTop)
    val expectedHist = Set("generation", "duration", "avg_fitness",
      "best_fitness_gen", "champion_fitness_global",
      "champion_validation_mae_global", "champion_validation_naive_mae_global",
      "species_count", "avg_complexity")
    assert(keysAtTopLevel(firstObjectOf(ours, "history")) == expectedHist)
    assert(keysAtTopLevel(firstObjectOf(ours, "neat_species_details")) ==
      Set("id", "size", "best_fitness", "avg_complexity"))
  }

  test("parameters JSON is the flat best-hyperparameter dict") {
    val ours = read("graft_phase_1_mlp_neat_optimization_parameters.json")
    val keys = keysAtTopLevel(ours)
    assert(keys == Set("hidden", "lr"), s"got $keys")
    assert(ours.trim.startsWith("{") && ours.trim.endsWith("}"))
  }

  test("GA-variant stats JSON carries the reference's mimo key sets") {
    val ours = read("graft_phase_1_mlp_ga_optimization_stats.json")
    val expectedTop = Set("total_time_elapsed", "average_time_per_epoch",
      "candidates_evaluated_so_far", "champion_fitness",
      "champion_validation_mae", "champion_validation_naive_mae",
      "champion_test_mae", "champion_test_naive_mae", "champion_train_mae",
      "champion_train_naive_mae", "average_fitness_per_epoch",
      "champion_fitness_per_epoch", "champion_validation_mae_per_epoch",
      "best_fitness_per_epoch", "best_validation_mae_per_epoch", "history")
    assert(keysAtTopLevel(ours) == expectedTop)
    assert(keysAtTopLevel(firstObjectOf(ours, "history")) == Set(
      "generation", "duration", "avg_fitness", "best_validation_mae_gen",
      "best_fitness_gen", "champion_fitness_global",
      "champion_validation_mae_global", "best_validation_naive_mae_gen",
      "champion_validation_naive_mae_global"))
  }

  test("resume checkpoint round-trips and restarts the search") {
    import graft.ml.{NeatSearch, OptimizerStats}
    // a cheap synthetic fitness — the resume contract is structural
    def f(p: Map[String, Double]): Double =
      math.pow(p.getOrElse("a", 0.0) - 0.3, 2) + math.pow(p.getOrElse("b", 0.0) - 0.7, 2)
    val bounds = Seq("a" -> (0.0, 1.0), "b" -> (0.0, 1.0))
    val cfg = NeatSearch.Config(populationSize = 5, generations = 2, seed = 3L)
    val r1 = NeatSearch.optimize(bounds, f, cfg)
    val json = OptimizerStats.neatResumeJson(2, r1.finalPopulation)
    val (gen, pop) = OptimizerStats.parseNeatResume(json)
    assert(gen == 2 && pop.size == r1.finalPopulation.size)
    pop.zip(r1.finalPopulation).foreach { case (a, b) =>
      assert(a.genes == b.genes)
      assert(a.fitness == b.fitness || (a.fitness.isNaN && b.fitness.isNaN))
    }
    val r2 = NeatSearch.optimize(bounds, f, cfg, resumeFrom = Some(pop))
    assert(r2.bestFitness <= r1.bestFitness + 1e-12,
      s"resumed search regressed: ${r2.bestFitness} vs ${r1.bestFitness}")
  }

  test("parses the REFERENCE resume checkpoint directly (interop)") {
    val ref = java.nio.file.Paths.get("/root/reference/examples/results/" +
      "phase_1_daily/phase_1_tcn_neat_1d_optimization_resume.json")
    assume(java.nio.file.Files.exists(ref), "reference checkout absent")
    val (gen, pop) = graft.ml.OptimizerStats.parseNeatResume(
      java.nio.file.Files.readString(ref))
    assert(gen > 0 && pop.nonEmpty)
    assert(pop.forall(_.genes.nonEmpty))
    val names = pop.flatMap(_.genes.values.map(_.name)).toSet
    assert(names.contains("window_size"),
      s"expected the reference's param names, got ${names.take(5)}")
    assert(pop.exists(g => !g.fitness.isNaN), "reference genomes carry fitness")
  }

  test("non-finite metrics render as JSON null, never bare NaN/Infinity tokens") {
    import graft.ml.{NeatSearch, OptimizerStats}
    val cfg = NeatSearch.Config(populationSize = 4, generations = 1, seed = 5L)
    val r = NeatSearch.optimize(Seq("a" -> (0.0, 1.0)), p => p("a"), cfg)
    val champ = OptimizerStats.ChampionMetrics(Double.NaN, Double.NaN,
      Double.PositiveInfinity, 0.1, 0.2, Double.NegativeInfinity, 0.3)
    val json = OptimizerStats.neatStatsJson(r, Double.NaN, champ,
      Seq(Double.NaN), Seq((Double.NaN, Double.NaN, Double.NaN)))
    // a diverged fit must still produce machine-parseable files
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(root.path("champion_fitness").isNull)
    assert(root.path("champion_validation_naive_mae").isNull)
    assert(root.path("champion_train_mae").isNull)
    assert(root.path("champion_test_mae").asDouble() == 0.1)
    assert(!json.contains("NaN") && !json.contains("Infinity"))
    val ga = OptimizerStats.gaStatsJson(
      graft.ml.GeneticSearch.Result(Vector(0.5), Double.NaN,
        Seq(graft.ml.GeneticSearch.GenerationStats(0, Double.NaN, Double.NaN, Double.NaN)),
        Seq(Vector(0.5))),
      Double.NaN, 4, champ, Seq(Double.NaN),
      Seq((Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN)))
    assert(!new com.fasterxml.jackson.databind.ObjectMapper().readTree(ga).isMissingNode)
    assert(!ga.contains("NaN") && !ga.contains("Infinity"))
  }

  test("neat_species_count agrees with the species-details rollup") {
    val ours = read("graft_phase_1_mlp_neat_optimization_stats.json")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(ours)
    assert(root.path("neat_species_count").asInt() ==
      root.path("neat_species_details").size(),
      "top-level species count must match the number of detail rows")
  }

  test("resume parse prefers the innovation field over a non-numeric genes key") {
    val json = """{"generation": 3, "population": [{"genes": {"lr_gene":
      {"innovation": 7, "param_name": "lr", "value": 0.25}}, "fitness": 0.5,
      "species_id": 1}]}"""
    val (gen, pop) = graft.ml.OptimizerStats.parseNeatResume(json)
    assert(gen == 3 && pop.size == 1)
    assert(pop.head.genes.keySet == Set(7))
    assert(pop.head.genes(7).name == "lr" && pop.head.genes(7).value == 0.25)
  }

  test("direct key diff against the reference goldens when the checkout is present") {
    val ref = java.nio.file.Paths.get("/root/reference/examples/results/" +
      "phase_1_daily/phase_1_tcn_neat_1d_optimization_stats.json")
    assume(java.nio.file.Files.exists(ref), "reference checkout absent")
    val refJson = java.nio.file.Files.readString(ref)
    val ours = read("graft_phase_1_mlp_neat_optimization_stats.json")
    val missingTop = keysAtTopLevel(refJson) -- keysAtTopLevel(ours)
    assert(missingTop.isEmpty, s"reference stats keys missing from ours: $missingTop")
    val missingHist = keysAtTopLevel(firstObjectOf(refJson, "history")) --
      keysAtTopLevel(firstObjectOf(ours, "history"))
    assert(missingHist.isEmpty, s"reference history keys missing: $missingHist")
  }
}
