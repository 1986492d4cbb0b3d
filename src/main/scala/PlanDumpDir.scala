import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump full `.explain("formatted")` output for the named queries into a
  * directory — the per-round plan evidence under `plans/rNN/`
  * (`<query>_before.txt` / `<query>_after.txt`). Same session shape as
  * PlanDump (AQE off so the static plan reads whole; sf0.01).
  *
  * Usage: sbt "runMain PlanDumpDir /root/repo/plans/r16 after q93 q152 ..."
  */
object PlanDumpDir extends App {
  require(args.length >= 3, "usage: PlanDumpDir <outDir> <suffix> <qtok>...")
  val outDir = Paths.get(args(0)); Files.createDirectories(outDir)
  val suffix = args(1)
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.01"
  for (tok <- args.drop(2)) {
    val name = graft.SparkEntry.queries.keys.toSeq.sorted
      .find(n => n == tok || n.startsWith(tok + "_"))
      .getOrElse(sys.error(s"no query matches $tok"))
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
    println(s"wrote ${name}_$suffix.txt (${plan.linesIterator.size} lines)")
  }
  spark.stop()
}
