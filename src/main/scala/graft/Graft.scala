package graft

import org.apache.spark.sql.SparkSession

/**
 * One-call library setup: registers every graft SQL surface in the session —
 * the codegen'd H3 index-math expressions ([[graft.h3.expr.H3Functions]])
 * and the geo/grid UDFs ([[graft.geom.GeoFunctions]]). After this, every
 * function is usable from `spark.sql(...)` and inside CellStore query
 * templates. Sessions configured with
 * `spark.sql.extensions=graft.h3.expr.GraftExtensions` get the H3
 * expressions injected without this call; the geo UDFs still need it.
 */
object Graft {
  def register(spark: SparkSession): Unit = {
    graft.h3.expr.H3Functions.register(spark)
    graft.ann.expr.VectorFunctions.register(spark)
    graft.geom.GeoFunctions.register(spark)
    graft.store.TableFunctions.register(spark)
    graft.plans.H3ParentPredicateRewrite.install(spark)
  }
}
