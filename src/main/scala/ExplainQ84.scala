import org.apache.spark.sql.SparkSession
object ExplainQ84 extends App {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
    .config("spark.sql.adaptive.enabled","false")
    .config("spark.sql.warehouse.dir","/tmp/graft_warehouse")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val df = graft.SparkEntry.queries("q84_triplet_wrong_date")(spark, "/root/testdata/sf0.1")
  df.explain("formatted")
  spark.stop()
}
