package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Local stage-level profiler (diagnostic main, not driver contract) —
  * the r19 optimization round's "measure first" harness: run a named
  * query once (same action rule as the bench) and print one row per
  * completed Spark STAGE with its wall, task count, shuffle read/write
  * bytes and executor CPU, so a query's cost localizes to an exchange /
  * codegen span from the artifact alone instead of from guesswork over
  * `/proc/stat` deltas. REPS (default 2) reruns the query so row 1's
  * one-time costs (codegen, memo builds) separate from steady state —
  * stages are tagged with the rep that ran them. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "2").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq("ss24_nn_descent_scale")
    val spark = Sessions.build("graft-profile-stages")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    case class Row(rep: Int, id: Int, name: String, wallMs: Long, tasks: Int,
        cpuMs: Long, shrMb: Double, shwMb: Double, rows: Long)
    val rows = new ConcurrentLinkedQueue[Row]()
    @volatile var rep = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        rows.add(Row(rep, si.stageId,
          si.name.split("\n")(0).take(60),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks, tm.executorCpuTime / 1000000L,
          tm.shuffleReadMetrics.totalBytesRead / 1e6,
          tm.shuffleWriteMetrics.bytesWritten / 1e6,
          tm.outputMetrics.recordsWritten))
        ()
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val collapses =
        try BenchAction.countCollapses(fn(spark, sfDir))
        catch { case scala.util.control.NonFatal(_) => false }
      for (r <- 1 to reps) {
        spark.catalog.clearCache(); Caches.releaseAll()
        // drain the async listener bus BEFORE re-tagging, not just after
        // the last rep: stages completing after the increment were being
        // attributed to the wrong rep (r19 ADVICE)
        Thread.sleep(300)
        rep = r
        val t0 = System.nanoTime()
        BenchAction.run(fn(spark, sfDir), collapses)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"QUERY $name rep=$r wall=$dt%.2fs")
      }
      Thread.sleep(1000) // drain the listener bus
      val all = rows.toArray(Array.empty[Row]).toSeq.sortBy(r => (r.rep, r.id))
      println(f"${"rep"}%3s ${"stage"}%5s ${"wall_ms"}%8s ${"tasks"}%5s " +
        f"${"cpu_ms"}%8s ${"shr_mb"}%9s ${"shw_mb"}%9s  name")
      all.foreach { r =>
        println(f"${r.rep}%3d ${r.id}%5d ${r.wallMs}%8d ${r.tasks}%5d " +
          f"${r.cpuMs}%8d ${r.shrMb}%9.1f ${r.shwMb}%9.1f  ${r.name}")
      }
      // per-rep totals: sum of stage walls exceeds query wall when stages
      // overlap; the gap query_wall - max(stage concurrency) is scheduler/
      // driver time the stages never see
      (1 to reps).foreach { rr =>
        val s = all.filter(_.rep == rr)
        println(f"REP $rr%d stages=${s.size}%3d wall_sum=${s.map(_.wallMs).sum / 1000.0}%.2fs " +
          f"cpu_sum=${s.map(_.cpuMs).sum / 1000.0}%.2fs " +
          f"shuffle_w=${s.map(_.shwMb).sum}%.1fMB")
      }
      rows.clear()
    }
    spark.stop()
  }
}
