package graft

/** Dev micro-bench: time individual declared queries (warm) without
  * running the whole Bench sweep. Usage:
  *   sbt "runMain graft.BenchOne /root/testdata/sf0.1 c02_dedup_near_minhash ..."
  * Prints `TIMING <id> <seconds>` per id after one untimed warm-up.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ids = args.drop(1)
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // A/B a state store provider without touching the declared queries,
    // e.g. SPARK_GRAFT_STATESTORE=org.apache.spark.sql.execution
    // .streaming.state.RocksDBStateStoreProvider
    sys.env.get("SPARK_GRAFT_STATESTORE").foreach(v =>
      builder.config("spark.sql.streaming.stateStore.providerClass", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(id: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(id)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    ids.foreach(exec) // warm-up
    ids.foreach(id => println(f"TIMING $id ${exec(id)}%.3f"))
    spark.stop()
  }
}
