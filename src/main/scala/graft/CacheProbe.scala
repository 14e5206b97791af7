package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r17): does a lazily persisted frame get recomputed
  * by consumers inside one action? Counts parquet-scan stages. */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    @volatile var scans = 0
    var inputBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val in = sc.stageInfo.taskMetrics.inputMetrics.bytesRead
        if (in > 0) { scans += 1; inputBytes += in }
      }
    })
    val acc = spark.sparkContext.longAccumulator("evals")
    val marker = udf { (s: String) => acc.add(1); if (s == null) 0 else s.length }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .withColumn("x", marker(col("text")))
    val mode = if (args.nonEmpty) args(0) else "lazy"
    val p = if (mode == "lazy") docs.persist() else graft.ops.Caches.localCheckpointTracked(docs)
    val ge = p.select(col("doc_id").as("__src"), (col("doc_id") % 100).as("__dst"))
    val od = ge.groupBy("__src").agg(count(lit(1)).as("__od"))
    var pr = ge.select(col("__src").as("__nid")).distinct()
      .withColumn("pr_fix", lit(1000L))
    for (_ <- 1 to 3) {
      val msgs = ge
        .join(pr.select(col("__nid").as("__src"), col("pr_fix")), "__src")
        .join(od, "__src")
        .select(col("__dst").as("__nid"), (col("pr_fix") / col("__od")).as("__c"))
        .groupBy("__nid").agg(sum("__c").as("__s"))
      pr = pr.select(col("__nid")).join(msgs, Seq("__nid"), "left")
        .select(col("__nid"), coalesce(col("__s"), lit(0L)).cast("long").as("pr_fix"))
        .persist()
    }
    pr.write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    println(s"MODE=$mode scansWithInput=$scans inputBytes=$inputBytes markerEvals=${acc.value} (5000 rows => 1x)")
    spark.stop(); sys.exit(0)
  }
}
