package graft.kernels

import org.apache.spark.sql.DataFrame

/** Shared kernel helpers. */
object Kernels {
  /** Whether the session has the graft native functions registered
    * (`spark.sql.extensions=graft.plans.GraftExtensions`).
    */
  def hasProductAgg(df: DataFrame): Boolean =
    df.sparkSession.catalog.functionExists("product_agg")
}
