package graft

/** One benchmark leg in its OWN JVM: `BenchLeg <cpus> <nDocs>` builds a
  * local[cpus] session, stages/reads the synthetic corpus, does one warm-up
  * KG run (C2 compilation — the cold run measures the JIT, not the engine)
  * and two measured runs, and prints the best as one `BENCHLEG {...}` line.
  *
  * Why a separate JVM per leg: same-JVM legs contaminate each other through
  * heap state and JIT profiles (BENCH_r01 recorded 6.4k docs/s for an
  * engine that does 110k+ — GC pressure from 30 prior queries and a
  * memory-sink streaming query in the same default-heap JVM). A cluster
  * benchmark would give every job a fresh driver/executors; per-leg JVMs
  * are the local analog, and they make the N-vs-4N scaling comparison fair
  * (neither leg inherits the other's compiled code or heap).
  */
object BenchLeg {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nDocs = args(1).toInt
    val spark = Bench.buildSession(cpus.toString)
    spark.sparkContext.setLogLevel("WARN")
    Bench.kgRun(spark, nDocs) // warm-up: JIT + page cache
    val (s1, _, _) = Bench.kgRun(spark, nDocs)
    val (s2, _, _) = Bench.kgRun(spark, nDocs)
    val (s3, docs, triples) = Bench.kgRun(spark, nDocs)
    // best-of-3: each run is a window sample on a shared box — the min is
    // the least-contended estimate of the engine's own speed
    val sec = math.min(s1, math.min(s2, s3))
    println(s"""BENCHLEG {"cpus":$cpus,"docs":$docs,"triples":$triples,""" +
      s""""sec":$sec,"docs_per_sec":${docs / sec}}""")
    spark.stop()
  }
}
