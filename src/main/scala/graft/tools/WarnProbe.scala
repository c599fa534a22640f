package graft.tools

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Attributes Spark WARN log events to the registry query running when they
  * fire — the adjudication tool for the round-14 verdict's bench-tail
  * findings (WindowExec no-partition warnings, CacheManager "Asked to cache
  * already cached data"). The driver's bench harness captures stderr but the
  * warnings carry no query context; this runs the same two-pass shape as
  * graft.Bench (warmup + timed) with a capturing appender so each warning is
  * pinned to the query that planned/executed it.
  *
  * Usage: runMain graft.tools.WarnProbe <sfDir> [queryName...]
  */
object WarnProbe {
  def main(args: Array[String]): Unit = {
    // -Dk=v args become system properties (sbt run forks; see TimeOne)
    val (propArgs, rest) = args.partition(_.startsWith("-D"))
    propArgs.foreach { a =>
      val kv = a.stripPrefix("-D").split("=", 2)
      if (kv.length == 2) sys.props(kv(0)) = kv(1)
    }
    val sfDir = rest(0)
    val spark = LocalSession(cores = 32, logLevel = "WARN")

    val hits = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
    @volatile var current = "<init>"
    val appender = new AbstractAppender(
      "graft-warn-probe", null, null, false, Property.EMPTY_ARRAY) {
      override def append(ev: LogEvent): Unit = {
        val msg = ev.getMessage.getFormattedMessage
        val src = ev.getLoggerName
        if (msg.contains("Asked to cache already cached data") ||
            msg.contains("No Partition Defined for Window")) {
          val trace =
            if (sys.props.get("graft.warnprobe.trace").contains("1"))
              Thread.currentThread().getStackTrace
                .map(_.toString)
                .filter(s => s.contains("graft.") || s.contains("WindowExec") ||
                  s.contains("CacheManager"))
                .mkString("\n    @ ", "\n    @ ", "")
            else ""
          hits.add((current, s"${src.split('.').last}: ${msg.take(100)}$trace"))
        }
      }
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    ctx.getConfiguration.getRootLogger.addAppender(
      appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()

    val names =
      if (rest.length > 1) rest.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    // two passes, like the bench (warmup + timed): cache-aliasing warnings
    // only fire when a plan persisted by an earlier invocation is still
    // registered, so a single pass can't reproduce them
    (1 to 2).foreach { pass =>
      names.foreach { n =>
        current = s"$n#$pass"
        try graft.SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable => println(s"[warnprobe] ERROR $n: $e") }
      }
    }
    current = "<shutdown>"
    val byQuery = scala.jdk.CollectionConverters.IteratorHasAsScala(
      hits.iterator()).asScala.toSeq.groupBy(_._1)
    if (byQuery.isEmpty) println("[warnprobe] CLEAN: no target warnings")
    else byQuery.toSeq.sortBy(_._1).foreach { case (q, ws) =>
      println(s"[warnprobe] $q -> ${ws.size} warning(s)")
      ws.map(_._2).distinct.foreach(w => println(s"  $w"))
    }
    spark.stop()
  }
}
