package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/**
 * Interleaved A/B timing of one runtime-mutable SQL conf on named
 * queries — the machine's speed drifts ~2x between stretches, so
 * cross-JVM before/after comparisons mislead; alternating A and B reps
 * inside ONE JVM pins both sides to the same stretch. Usage:
 * `AbQuery <sfDir> <key=value> <name> [name...]`, SPARK_GRAFT_REPS
 * pairs per query (default 4). Prints per-rep seconds and the A/B
 * medians.
 */
object AbQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val Array(k, v) = args(1).split("=", 2)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val pairs = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.setupFixtures(spark, sfDir)
    // a conf with no set/default value must be RESTORED by unset, not
    // by setting "" (an empty string is not "unset" and can error or
    // silently change the A-side plan)
    val baseline: Option[String] = spark.conf.getOption(k)
    def restoreA(): Unit =
      baseline.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    val aLabel = baseline.getOrElse("<unset>")
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      def timed(): Double = {
        val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
      }
      timed(); spark.conf.set(k, v); timed() // warm both shapes
      val (as, bs) = (1 to pairs).map { _ =>
        restoreA(); val a = timed()
        spark.conf.set(k, v); val b = timed()
        (a, b)
      }.unzip
      restoreA()
      println(f"[abquery] $name A(${aLabel}): ${as.map(t => f"$t%.2f").mkString(",")} med=${med(as)}%.2f" +
        f" | B($v): ${bs.map(t => f"$t%.2f").mkString(",")} med=${med(bs)}%.2f  B/A=${med(bs) / med(as)}%.2f")
    }
    spark.stop()
  }
}
