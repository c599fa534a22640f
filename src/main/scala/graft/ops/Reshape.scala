package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Projections, renames, unions (SURVEY §2.3 P1-P4/P7, §2.8 U1).
  *
  * These are all narrow (shuffle-free) transformations; Catalyst's
  * `CollapseProject` folds chains of them into a single projection, so the
  * reference's long rename/select sequences (etl_payroll_pipeline_demo.py:281-286,
  * :327-337,:362-400,:711-738) cost one codegen stage, not N passes.
  */
object Reshape {

  /** Bulk rename from a (old → new) map; absent old names are ignored, matching
    * pandas `rename` (reference etl_payroll_pipeline_demo.py:281-286,:711-732).
    */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames.filter { case (from, _) => df.columns.contains(from) })

  /** Existence-tolerant selection (P2, reference
    * etl_payroll_pipeline_demo.py:336,:343): keep only the requested columns
    * that actually exist, in request order.
    */
  def selectExisting(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.filter(df.columns.contains).map(col): _*)

  /** Ordered output projection with missing→null injection (P4, the
    * reference's `OrderedDict` PreTAM layout, etl_payroll_pipeline_demo.py:362-400):
    * each (outputName, sourceName) pair becomes `source AS output`, or an
    * all-null string column when the source is absent.
    */
  def orderedProjectWithNulls(df: DataFrame, mapping: Seq[(String, String)]): DataFrame =
    df.select(mapping.map { case (out, src) =>
      (if (df.columns.contains(src)) col(src) else lit(null).cast("string")).as(out)
    }: _*)

  /** Header whitespace normalization (P7, `clean_column_names`, reference
    * etl_payroll_pipeline_demo.py:215-217).
    */
  def trimHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.trim): _*)

  /** Vertical union aligning by column name, null-filling missing columns
    * (U1, pandas `concat(ignore_index=True)`, reference
    * etl_payroll_pipeline_demo.py:490-491).
    */
  def unionHarmonize(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionHarmonize needs at least one frame")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
