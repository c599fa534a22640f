package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level corpus deduplication: drop lines whose normalized form
  * appears in at least `minDocs` distinct documents — the C4 / CCNet /
  * RefinedWeb boilerplate-removal step of an LLM training-data pipeline
  * (navigation chrome, cookie banners, license headers repeat verbatim
  * across pages; document-level dedup never sees them because the
  * surrounding text differs).
  *
  * Scale posture: one explode of the corpus into (doc, pos, line) rows
  * (bounded by corpus line count), a two-stage aggregation on the
  * normalized line — `(doc, line)`-distinct for map-side combine, then a
  * count keyed by line — and ONE reassembly aggregation keyed by doc id.
  * The boilerplate set (lines with df >= minDocs) is broadcast into the
  * drop join deliberately, like [[Decontaminate]]'s benchmark set: line
  * frequency is heavy-tailed, so the >= minDocs survivors are a tiny
  * fraction of distinct lines at any corpus size, and the alternative — a
  * shuffled join keyed by line text — would move the ENTIRE exploded
  * corpus. A boilerplate set too large to broadcast means minDocs is set
  * below the corpus's natural noise floor (raise it), and failing loudly
  * beats silently shuffling the corpus. Nothing is quadratic and nothing
  * collects to the driver.
  *
  * Blank lines are structure, not boilerplate: they are excluded from
  * counting and never dropped, so paragraph breaks survive cleaning.
  */
object LineDedup {

  /** Canonical line form for cross-document matching: trimmed, lowercased
    * (whitespace INSIDE the line is significant — collapsing it would merge
    * differently-indented code lines).
    */
  def normLine(c: Column): Column = lower(trim(c))

  /** The boilerplate table: (`line_norm`, `line_df`) for every normalized
    * non-blank line contained in at least `minDocs` distinct documents.
    * Useful on its own as a corpus-hygiene report; [[dedupLines]] broadcasts
    * it into the drop join.
    */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String,
                  minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    docs
      .select(col(idCol), explode(split(col(textCol), "\n")).as("__line"))
      .select(col(idCol), normLine(col("__line")).as("line_norm"))
      .filter(col("line_norm") =!= "")
      .distinct() // per-document line multiplicity must not count toward df
      .groupBy("line_norm").agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") >= minDocs)
  }

  /** Rebuild every document without its boilerplate lines. Returns one row
    * per input document: `idCol`, the cleaned text (`outCol`, original line
    * order and original — un-normalized — line content; null iff the input
    * text was null), `n_lines` (input line count, 0 for null text) and
    * `n_dropped`.
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 minDocs: Int = 2, outCol: String = "text_clean"): DataFrame = {
    val boiler = boilerplate(docs, idCol, textCol, minDocs)
    // posexplode_outer keeps null-text documents (one all-null line row) so
    // the reassembly covers every input row without a second join back.
    val lines = docs.select(col(idCol),
      posexplode_outer(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val flagged = lines
      .join(broadcast(boiler), normLine(col("__line")) === col("line_norm"), "left")
      .withColumn("__drop", col("line_norm").isNotNull)
    flagged.groupBy(idCol)
      .agg(
        when(count(col("__line")) > 0,
          array_join(
            transform(
              array_sort(collect_list(when(!col("__drop"),
                struct(col("__pos").as("p"), col("__line").as("l"))))),
              s => s.getField("l")),
            "\n"))
          .otherwise(lit(null).cast("string")).as(outCol),
        count(col("__pos")).as("n_lines"),
        sum(when(col("__drop"), 1L).otherwise(0L)).as("n_dropped"))
  }
}
