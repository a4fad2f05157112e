package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** JobProfile with session-conf overrides — measures what a config
  * change (e.g. AQE off, plan-string cap) does to one query's wall /
  * job / task profile WITHOUT touching BenchProtocol. Diagnostic only —
  * never feeds an artifact.
  *
  * Usage: runMain graft.tools.ConfProbe <keys,csv> <k=v[,k=v...]|-> [sfDir]
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val confs = if (args.length > 1 && args(1) != "-")
      args(1).split(",").map { kv =>
        val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
      }.toSeq
    else Seq.empty
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val b = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null)
          taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    // warm-up fixture: smallest SF sibling of the probed dir (was a
    // hardcoded sf0.001), and resolve the key ONCE with an actionable
    // error — a typo used to be swallowed by the warm-up catch and
    // only surface as a bare NoSuchElementException from timeOnce
    val warm = new java.io.File(d).getParent + "/sf0.001"
    names.foreach { n =>
      val q = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query: $n"))
      try q(spark, warm).count()
      catch { case _: Throwable => () }
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
      val dt = graft.BenchProtocol.timeOnce(spark, q, d)
      Thread.sleep(500)
      println(f"CONFPROBE $n wall=$dt%.3f s jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskTime=${taskMs.get / 1000.0}%.2f s")
    }
    spark.stop()
  }
}
