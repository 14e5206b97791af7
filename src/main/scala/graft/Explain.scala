package graft

/** Plan inspector: `sbt "runMain graft.Explain <queryName> [sfDir]"`
  * prints the formatted physical plan of a harness query — the audit loop
  * for pushdown / broadcast / codegen checks. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
    sys.exit(0)
  }
}
