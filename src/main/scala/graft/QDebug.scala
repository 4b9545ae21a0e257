package graft

/** Debug main: run one named query, print timing and (optionally) the
  * formatted physical plan. Usage: runMain graft.QDebug <query> <sfDir> [explain]
  */
object QDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[qdebug] $name run$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    spark.stop()
  }
}
