package graft

/** Smoke main: runs the flagship [[SparkEntry.entry]] pipeline on sf0.001
  * (the driver's t1 check is rows > 0) and prints the row count + plan.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val n = df.count()
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
