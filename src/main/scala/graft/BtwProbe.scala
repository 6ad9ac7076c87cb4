package graft
import org.apache.spark.sql.SparkSession
/** One-off adjudication probe for the graph_betweenness isolated-run
  * anomaly: time N consecutive runs, optionally preceded by sibling
  * graph keys, and print each pass. */
object BtwProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.ensureCheckpointDir(spark)
    graft.plans.TopKPushdown.install(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    val dir = "/root/testdata/sf0.1"
    def time(k: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      GraftSession.dropLeftoverBlocks(spark)
      t
    }
    if (args.headOption.contains("warm")) {
      println(f"[probe] warm-by-siblings: bfs=${time("graph_bfs_distance")}%.2f closeness=${time("graph_closeness")}%.2f")
    }
    for (i <- 1 to 5) println(f"[probe] betweenness pass $i: ${time("graph_betweenness")}%.2f s (load ${new java.io.BufferedReader(new java.io.FileReader("/proc/loadavg")).readLine()})")
    spark.stop()
  }
}
