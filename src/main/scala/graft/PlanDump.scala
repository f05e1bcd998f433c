package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for a set of queries to files — the
  * optimization-round plan-evidence tool (plans/rNN/<query>_<tag>.txt).
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> <tag> <q1,q2,...>"
  * Runs each query to completion first so AQE's FINAL plan (chosen joins,
  * coalesced exchanges) is what gets dumped, at sf0.01 — big enough that
  * join-strategy choices are real, small enough to run in seconds. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <tag> <q1,q2,...>")
    val Array(outDir, tag, list) = args
    val spark = GraftSession.local(8)
    val sf = "/root/testdata/sf0.01"
    Files.createDirectories(Paths.get(outDir))
    list.split(",").foreach { prefix =>
      val name = SparkEntry.queries.keys.find(_.startsWith(prefix))
        .getOrElse(sys.error(s"no query matches prefix $prefix"))
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize AQE
      val p = Paths.get(outDir, s"${name}_$tag.txt")
      val full = df.queryExecution.explainString(FormattedMode)
      // cap per file: the operator tree + the first detail sections carry
      // the evidence (Exchange count, join strategy, projection layering);
      // a multi-hundred-KB expression appendix does not
      val txt = if (full.length <= 100000) full
      else full.take(100000) + "\n... [truncated by PlanDump at 100000 chars]\n"
      Files.writeString(p, txt)
      println(s"[plandump] wrote $p")
      GraftSession.sweepBlocks(spark)
    }
    spark.stop()
  }
}
