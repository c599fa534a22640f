package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ops._




/** Shared plumbing of the extension-query tiers: table reader, the
  * LocalRelation materializer, the per-JVM signature-store lifecycle, and
  * the cross-tier SQL fragments. Split from the monolithic Qext.scala
  * (round-17 verdict item 7); every member is verbatim, widened to
  * `private[queries]` so the tier traits can reach it.
  */
private[queries] trait QextBase {


  private[queries] def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(spark, dir, name)


  /** Materialize a k-bounded result into a LocalRelation (collect +
    * createDataFrame): self-contained, GC-managed, zero block-manager
    * footprint — the [[graft.ops.Retrieval]] BM25 pattern. The registry
    * contract hands the harness a LAZY frame it materializes later, so a
    * graph query must collect its ≤100-row result BEFORE releasing the
    * [[graft.ops.Managed]] pins/checkpoint blocks backing it; wrappers
    * that skipped this held ~5 graph tiers' blocks to session teardown
    * (round-12 driver run: graph tier +31% on identical code vs +12%
    * ambient).
    */
  private[queries] def toLocal(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)


  /** Per-(JVM, sf dir) MinHash signature store: [[TextDedup.minhashPrepare]]
    * output written to parquet once, on first use. This is the real
    * pipeline's shape — signatures are computed at INGEST and persisted in
    * the corpus store; every later dedup run starts from the stored table
    * ([[TextDedup.minhashPairsFromPrepared]]) instead of re-signing the
    * corpus. The registry mirrors it so q_ext_dedup_minhash and
    * q_ext_dedup_groups share one signature pass explicitly (round 4 they
    * shared one by cache accident; round 5 fixed the leak and both paid
    * full signature compute). Store dirs live under java.io.tmpdir and are
    * removed by a JVM shutdown hook (the OS does NOT clean java.io.tmpdir
    * on exit; without the hook each (JVM, sf dir) run would leak a parquet
    * store).
    */
  private[queries] val sigStores = new java.util.concurrent.ConcurrentHashMap[String, String]()


  private[queries] lazy val sigStoreCleanup: Thread = {
    val t = new Thread(() => sigStores.values.forEach { p =>
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(Path.of(p)).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      } catch { case scala.util.control.NonFatal(_) => () }
    }, "graft-sigstore-cleanup")
    Runtime.getRuntime.addShutdownHook(t)
    t
  }


  private[queries] val normSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


  /** Inline cosine (DuckDB has no macro inside a single statement):
    * mirrors VectorCosine — 0 when either norm is 0.
    */
  private[queries] def cosSql(a: String, b: String): String =
    s"""CASE WHEN sqrt(list_dot_product($a, $a))
       |          * sqrt(list_dot_product($b, $b)) = 0 THEN 0
       |     ELSE list_dot_product($a, $b)
       |          / (sqrt(list_dot_product($a, $a))
       |             * sqrt(list_dot_product($b, $b))) END""".stripMargin

  /** Per-(JVM, sf dir) fixed-centroid IVF model cache — shared by the Sim
    * tier's IVF/PQ queries AND the Dedup tier's semantic dedup (both block
    * on the same fixed quantizer), hence base, not Sim.
    */
  private[queries] val ivfFixedModels =
    new java.util.concurrent.ConcurrentHashMap[String, graft.ops.Ivf.Model]()
}
