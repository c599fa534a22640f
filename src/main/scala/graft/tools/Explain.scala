package graft.tools


/** Plan inspection harness: prints the formatted physical plan of one query
  * (or a pushdown/broadcast/codegen summary of all).
  * Usage: `sbt "runMain graft.tools.Explain [queryName] [sfDir]"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = LocalSession(cores = 4, logLevel = "ERROR")

    val queries = graft.SparkEntry.queries
    if (name == "all") {
      queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        // NOTE: formatted mode under AQE prints initial+final plans, so the
        // structural counts below are 2x the physical operator count —
        // consistent across queries, fine for a relative audit.
        val df = fn(spark, sfDir)
        val qe = df.queryExecution
        val plan = qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val nScan = "Scan parquet".r.findAllIn(plan).length
        val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan)
          .filterNot(_.contains("[]")).length
        val nBhj = "BroadcastHashJoin".r.findAllIn(plan).length
        val nSmj = "SortMergeJoin".r.findAllIn(plan).length
        val nEx = "Exchange".r.findAllIn(plan).length
        // codegen spans only materialize in the FINAL adaptive plan, and only
        // for THIS QueryExecution — collect() (count() would spawn its own QE)
        try df.collect() catch { case _: Throwable => () }
        val executed = qe.executedPlan.toString
        val nWsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(executed).map(_.group(1)).toSet.size
        println(f"$n%-28s scans=$nScan pushedFilters=$pushed bhj=$nBhj smj=$nSmj exchanges=$nEx codegenSubtrees=$nWsc")
      }
    } else if (name == "genfilters") {
      // Audit for InferFiltersFromGenerate recompute: a Generate over an
      // expensive input invites a `size(input) > 0` filter that re-evaluates
      // the input expression per row (see LshStream round-7 notes). Flag any
      // Filter whose condition contains size()/isnotnull over a NON-attribute
      // subtree of more than a few nodes — those re-run real work.
      import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, IsNotNull, Size}
      import org.apache.spark.sql.catalyst.plans.logical.Filter
      def weight(e: Expression): Int = e.collect { case x => x }.size
      queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.optimizedPlan
          val hits = plan.collect { case Filter(cond, _) =>
            cond.collect {
              case s @ Size(c, _) if !c.isInstanceOf[Attribute] && weight(c) > 4 =>
                s"size(${c.simpleString(40).take(60)}) w=${weight(c)}"
              case i @ IsNotNull(c) if !c.isInstanceOf[Attribute] && weight(c) > 8 =>
                s"isnotnull(${c.simpleString(40).take(60)}) w=${weight(c)}"
            }
          }.flatten
          if (hits.nonEmpty) println(s"$n  ${hits.mkString(" | ")}")
        } catch { case e: Throwable => println(s"$n  ERR ${e.getMessage.take(80)}") }
      }
      println("[genfilters] audit complete")
    } else if (name == "final") {
      // FINAL adaptive plan after execution — shows AQE's runtime stage
      // reuse (ReusedQueryStage/ReusedExchange) and join rewrites that the
      // initial formatted dump cannot (round-20: is corpus_prep's
      // duplicated dedup subtree already deduped by AQE stage reuse?)
      val qname = args(1)
      val sf = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
      val df = queries(qname)(spark, sf)
      val qe = df.queryExecution
      try df.collect() catch { case _: Throwable => () }
      println(qe.executedPlan.toString)
    } else {
      queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
