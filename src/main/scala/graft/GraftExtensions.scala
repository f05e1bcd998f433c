package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point (the SparkSessionExtensions surface):
  * registers the engine's native expressions for SQL callers. Activate
  * with `spark.sql.extensions=graft.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)`; DataFrame callers can
  * use [[graft.functions.VectorFunctions]] directly with no setup. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    (graft.functions.VectorFunctions.registrations ++
      graft.functions.StringFunctions.registrations).foreach(ext.injectFunction)
}
