package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{FunnelStream, FunnelTws}
import graft.streaming.FunnelStream.Ev

/** transformWithState vs GroupState funnel throughput at scale: U users
  * × 3 funnel events each through one micro-batch of each engine (the
  * state-write-heavy shape — every user's state is created and advanced
  * three steps), then a second sparse batch (1% returners) to measure
  * the many-keys-few-updates regime where RocksDB's column-family reads
  * dominate vs the HDFS-backed map's.
  *
  * Usage: `sbt "runMain graft.tools.TwsProbe [users]"`.
  */
object TwsProbe {
  def main(args: Array[String]): Unit = {
    val users = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val steps = Seq("signup", "click", "purchase")
    val gapUs = 600L * 1000000L
    def dense = (0 until users).flatMap { u =>
      steps.zipWithIndex.map { case (s, i) =>
        Ev(u.toLong, u.toLong * 10 + i, i.toLong * 1000000L, s)
      }
    }
    def sparse = (0 until users by 100).map { u =>
      Ev(u.toLong, u.toLong * 10 + 7, 60L * 1000000L, "signup")
    }

    Seq("groupstate", "tws").foreach { engine =>
      val input = MemoryStream[Ev]
      val ds = if (engine == "tws")
        FunnelTws.timedFunnel(input.toDS(), steps, gapUs, None)
      else FunnelStream.timedFunnel(input.toDS(), steps, gapUs, None)
      val q = ds.writeStream.format("memory").queryName(s"twsprobe_$engine")
        .outputMode("append").start()
      Seq("dense" -> dense, "sparse" -> sparse).foreach { case (label, b) =>
        val t0 = System.nanoTime()
        input.addData(b: _*)
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[tws] $engine%-10s $label%-6s ${b.size}%8d events  $dt%7.2fs  ${b.size / dt}%,.0f ev/s")
      }
      q.stop()
    }
    spark.stop()
  }
}
