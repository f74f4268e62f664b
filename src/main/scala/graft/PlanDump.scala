package graft

/** Writes `.explain("formatted")` output for named queries to files —
  * the optimization-round evidence artifact (`plans/rNN/<query>_{before,
  * after}.txt`). Args: <sfDir> <outDir> <suffix> <q1,q2,...>. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(dir, outDir, suffix, names) = args
    val spark = Graft.localSession("plan-dump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
