package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources
import graft.ops.TextDedup

/** Data-dependent assumptions the declared oracles rely on, asserted
  * against the corpus the driver actually verifies (sf0.01) so a
  * regenerated corpus fails HERE with the reason, not in a hash mismatch.
  *
  * q_ext_dedup_minhash compares banded-LSH output against an EXACT
  * all-pairs Jaccard oracle at threshold 0.5. That is only sound while
  * every qualifying pair is far above the banding threshold: at 16 bands x
  * 4 rows the per-pair miss probability is (1 - J^4)^16 — ~4e-8 at J=0.9
  * but ~0.35 at J=0.5. The oracle is therefore valid iff no qualifying
  * pair sits in the unreliable (0.5, 0.9) band, which this spec asserts
  * via the deterministic-complete prefix-filter operator (no LSH, full
  * recall by construction).
  */
class OracleAssumptionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  "the minhash oracle corpus" should
      "have no qualifying pair below the banding-reliable similarity" in {
    val docs = Sources.table(spark, dir, "documents")
    val exact = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.5)
    val minJ = exact.agg(min("jaccard")).collect().head.getDouble(0)
    withClue("a qualifying pair fell into the LSH-unreliable (0.5, 0.9) " +
        "band — the exact all-pairs SQL is no longer a sound oracle for " +
        "q_ext_dedup_minhash on this corpus: ") {
      minJ should be >= 0.9
    }
  }

  it should "yield identical pairs from LSH and the exact operator" in {
    val docs = Sources.table(spark, dir, "documents")
    val lsh = TextDedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh shouldBe exact
  }
  "the lz_ratio oracle corpus" should "be pure ASCII (bytes == characters)" in {
    // the q_ext_compress_ratio DuckDB oracle (round 15) replays the
    // normative byte-level LZ77 parse over CHARACTER positions — sound
    // only while every document is single-byte ASCII. A regenerated
    // corpus with multi-byte text must fail here with the reason.
    val docs = Sources.table(spark, dir, "documents")
    val nonAscii = docs
      .filter(org.apache.spark.sql.functions.length(col("text")) =!=
        octet_length(col("text")))
      .count()
    withClue("non-ASCII documents break the char-position LZ oracle: ") {
      nonAscii shouldBe 0L
    }
  }
}
