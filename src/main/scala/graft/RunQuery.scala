package graft

/** One-off catalog query driver for plan inspection and timing:
  *
  *   runMain graft.RunQuery <queryName> <sfDir> [reps] [explain]
  *
  * Prints one line per rep (`QUERY name rep sec rows`) and, with the
  * `explain` flag, the formatted physical plan — the fast feedback loop
  * for "is this the plan you'd want" iteration without a full bench run.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <queryName> <sfDir> [reps] [explain]")
    val (name, sfDir) = (args(0), args(1))
    // reps and the explain flag are independently optional
    val reps = args.drop(2).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(2)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"QUERY $name $r ${(System.nanoTime() - t0) / 1e9}%.3f $rows")
    }
    spark.stop()
  }
}
