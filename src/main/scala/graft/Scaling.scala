package graft

/** Scaling-efficiency evidence (BASELINE.md row 12): the same KG pipeline
  * job on the same deterministic input at two parallelism levels —
  * local[8] and local[32], the sandbox stand-in for N vs 4N executors —
  * reporting throughput at both and
  *   eff = throughput(32) / (4 × throughput(8))
  * against the ≥ 0.8 target. Each level runs once as warm-up (JIT,
  * code-gen, parquet footer caches) and twice measured, keeping the best.
  */
object Scaling {

  def throughputAt(cpus: Int, nDocs: Int): (Double, Long) = {
    val spark = Bench.buildSession(cpus.toString)
    spark.sparkContext.setLogLevel("WARN")
    try {
      // two full-size warm-ups: C2 compilation of the per-doc hot path
      // needs real invocation volume — cold runs measure the JIT, not the
      // engine (observed 10× task-time inflation on the first run)
      Bench.kgRun(spark, nDocs); Bench.kgRun(spark, nDocs)
      val runs = (1 to 3).map(_ => Bench.kgRun(spark, nDocs))
      val best = runs.minBy(_._1)
      (nDocs / best._1, best._3)
    } finally spark.stop()
  }

  /** Single-level mode (`runMain graft.Scaling <cpus>`): one JVM per
    * parallelism level, the way two separate clusters would run it —
    * same-JVM back-to-back legs contaminate each other through heap state
    * (measured: the second leg pays multi-second GC storms). The wrapper
    * script tools/scaling.sh runs both levels and computes efficiency. */
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_KG_DOCS", "400000").toInt
    require(args.length == 1, "usage: graft.Scaling <cpus>")
    val cpus = args(0).toInt
    val (tp, triples) = throughputAt(cpus, nDocs)
    println(f"""{"n_docs":$nDocs,"cpus":$cpus,"docs_per_sec":$tp%.1f,"triples":$triples}""")
  }
}
