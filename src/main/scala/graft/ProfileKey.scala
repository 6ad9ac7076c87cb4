package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
/** Dev tool (not a driver surface): run named declared keys under the
  * bench's session shape (local[$SPARK_GRAFT_CPUS], shuffle.partitions =
  * cpus, checkpoint dir set) and print a per-JOB wall-time trace — the
  * within-key breakdown the guide's §1 empirical loop needs when a key
  * spans many jobs (iterative supersteps, eager checkpoints, multi-action
  * construction). Two timed passes per key (the bench's min-of-2 shape);
  * jobs are traced on the second (warm) pass.
  * Usage: runMain graft.ProfileKey <key> [key ...]
  */
object ProfileKey {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.ensureCheckpointDir(spark)
    GraftSession.applyRuntimeTuning(spark)
    graft.plans.TopKPushdown.install(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()

    case class J(id: Int, var t0: Long = 0L, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var desc: String = "")
    val jobs = mutable.LinkedHashMap[Int, J]()
    @volatile var tracing = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (tracing) {
          val j = J(e.jobId, t0 = e.time, stages = e.stageInfos.size,
            tasks = e.stageInfos.map(_.numTasks).sum)
          j.desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("")
          jobs.synchronized { jobs(e.jobId) = j }
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.t1 = e.time)
        }
    })

    for (k <- args) {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(k)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        GraftSession.dropLeftoverBlocks(spark)
        t
      }
      val cold = once()
      jobs.synchronized { jobs.clear() }
      tracing = true
      val warm = once()
      tracing = false
      println(f"===== $k cold=$cold%.2f warm=$warm%.2f =====")
      val snap = jobs.synchronized { jobs.values.toVector }
      val tot = snap.map(j => (j.t1 - j.t0).max(0L)).sum / 1e3
      snap.foreach { j =>
        val d = (j.t1 - j.t0).max(0L) / 1e3
        println(f"  job ${j.id}%4d  ${d}%7.3f s  stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(90)}")
      }
      println(f"  [sum of job wall times: $tot%.2f s over ${snap.size} jobs]")
    }
    spark.stop()
  }
}
