package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B timing harness (dev tool, guide §1): times each named
  * query under two session variants — A = `graft.spread` on (default),
  * B = off — alternating A/B/A/B within one JVM so co-tenant weather
  * hits both variants equally, and reports the MIN over rounds (min is
  * the noise-robust statistic on a machine with invisible-steal waves).
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.AbProbe q01_... ..."` */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "4").toInt
    val root = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    root.sparkContext.setLogLevel("WARN")
    val sA = root.newSession()
    val sB = root.newSession()
    // Default experiment: A = spread on, B = off. When
    // SPARK_GRAFT_AB_CONF is set ("k=v,k=v"), BOTH sessions keep the
    // committed defaults and A additionally applies the listed confs —
    // the generic config-A/B mode used for the guide-§9 candidates.
    sys.env.get("SPARK_GRAFT_AB_CONF") match {
      case Some(confs) =>
        confs.split(',').map(_.trim).filter(_.nonEmpty).foreach { kv =>
          val Array(k, v) = kv.split("=", 2)
          sA.conf.set(k, v)
        }
      case None => sB.conf.set("graft.spread", "off")
    }
    def time(s: SparkSession, n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(s, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = args.toSeq
    println(f"${"query"}%-26s ${"A_min"}%7s ${"B_min"}%7s ${"A/B"}%6s")
    names.foreach { n =>
      try {
        time(sA, n); time(sB, n) // warm both variants
        val as = Array.fill(rounds)(0.0)
        val bs = Array.fill(rounds)(0.0)
        (0 until rounds).foreach { i =>
          as(i) = time(sA, n); bs(i) = time(sB, n)
        }
        println(f"$n%-26s ${as.min}%7.3f ${bs.min}%7.3f ${as.min / bs.min}%6.2f")
      } catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getMessage}")
      }
    }
    root.stop()
  }
}
