package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctionRegistry

/** Session-extensions entry point: set
  * `spark.sql.extensions=graft.GraftExtensions` and every native kernel is
  * available from SQL on every session of the cluster (the deployment
  * story; tests and ad-hoc sessions can use
  * [[GraftFunctionRegistry.register]] directly).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctionRegistry.functions.foreach(ext.injectFunction)
}
