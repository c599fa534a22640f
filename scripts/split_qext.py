#!/usr/bin/env python3
"""One-shot mechanical split of queries/Qext.scala by tier (round-17 verdict
item 7). Zero behavior change: every top-level member moves verbatim into a
tier trait; Qext becomes the composition object whose `all`/`oracle` maps
are unions of per-tier maps. Run once from the repo root, then delete or
keep for the record."""
import re
import sys

SRC = "src/main/scala/graft/queries/Qext.scala"

TIERS = ["Dedup", "Sim", "Text", "Rank", "Events", "Misc"]

Q = {
    "Dedup": """dedup_exact dedup_minhash dedup_simhash dedup_ngram_jaccard
        dedup_embed_cosine semdedup dedup_groups components line_dedup
        dedup_spans decontaminate bloom_decontaminate chunk_overlap
        corpus_prep dup_rate_by_source""",
    "Sim": """sim_topk sim_topk_int8 sim_ann_lsh sim_ann_multiprobe sim_ivf
        sim_ivf_fixed pq_codes pq_adc pq_ivf_adc pq_rerank pq_ivf_residual
        pq_ivf_rerank pq_codes_trained cluster_assign cluster_topics
        hard_negatives""",
    "Text": """token_count quality_score quality_filter quality_logit lang_id
        lang_id_profile script_detect unicode_nfc compress_ratio vocab
        vocab_encode vocab_coverage tfidf_topk repetition fingerprint
        pii_redact collocations lm_score dsir_weights source_overlap
        length_buckets""",
    "Rank": """bm25_topk bm25_indexed hybrid_rrf topk_per_group pagerank
        trustrank hits textrank bpe_merges bpe_encode""",
    "Events": """event_funnel funnel_timed funnel_latency
        attribution_last_touch attribution_first_touch attribution_multi
        attribution_decay top_paths event_transitions cohort_retention
        sessionize session_outcomes range_join_sessions asof_last_error
        events_daily json_extract scd2 scd2_asof snapshot_diff""",
    "Misc": """cap_per_source budget_per_source pivot_lang_counts unpivot
        ntile_tiers quantiles_by_lang sample_weighted sample_weighted_grouped
        sample_stratified mixture_weights mixture_realize train_test_split
        pack_sequences winsorize shuffle_order filter_blocklist heavy_hitters
        skew_salted_count agg_rollup agg_cube fuzzy_pairs running_total
        profile profile_quantiles quantile_sketch url_canonical
        multimodal_features multimodal_decode multimodal_pixels
        multimodal_resize multimodal_gif multimodal_frames
        multimodal_frames_delta multimodal_jpeg multimodal_video""",
}
QUERY_TIER = {}
for tier, names in Q.items():
    for n in names.split():
        QUERY_TIER["q_ext_" + n] = tier

HELPER_TIER = {
    "t": "Base", "toLocal": "Base", "sigStores": "Base",
    "sigStoreCleanup": "Base", "normSql": "Base", "cosSql": "Base",
    "minhashStore": "Dedup", "ngramPairsCtes": "Dedup",
    "ngramJaccardOracleSql": "Dedup", "ngramPairsPrefixCtes": "Dedup",
    "dedupGroupsOracleSql": "Dedup", "decontaminateOracleSql": "Dedup",
    "ivfModels": "Sim", "ivfFixedModels": "Sim", "pqCodebooks": "Sim",
    "pqResidualCodebooks": "Sim", "pqTrainedCodebooks": "Sim",
    "ivfIterSql": "Sim", "pqIterSql": "Sim", "pqTrainedOracleSql": "Sim",
    "ivfTrainedOracleSql": "Sim",
    "profileValuesSql": "Text", "piiOracleSql": "Text",
    "bm25Terms": "Rank", "bm25Indexes": "Rank", "bm25Index": "Rank", "bm25Ctes": "Rank",
    "bm25OracleSql": "Rank", "bpeOracleSql": "Rank",
    "bpeEncodeOracleSql": "Rank", "pagerankOracleSql": "Rank",
    "trustrankOracleSql": "Rank", "textrankOracleSql": "Rank",
    "hitsOracleSql": "Rank",
    "profileOracleSql": "Misc", "quantilesOracleSql": "Misc",
}

MEMBER_RE = re.compile(
    r"^  (?:private(?:\[queries\])? )?(?:lazy )?(?:def|val) (\w+)")
ENTRY_RE = re.compile(r'^    "(q_ext_\w+)" ->')


def main():
    lines = open(SRC).read().split("\n")
    n = len(lines)
    # locate the package/import header and the object's scaladoc + open
    obj_open = next(i for i, l in enumerate(lines)
                    if l.startswith("object Qext {"))
    header = lines[:obj_open]          # package, imports, object scaladoc
    # find closing brace of the object (last "}" line)
    obj_close = max(i for i, l in enumerate(lines) if l == "}")

    # ---- split the object body into top-level blocks
    body = lines[obj_open + 1:obj_close]
    starts = []
    for i, l in enumerate(body):
        if MEMBER_RE.match(l):
            starts.append(i)
    blocks = []  # (name, text_lines) — text includes preceding comments
    prev_end = 0
    for bi, s in enumerate(starts):
        # attach contiguous comment/blank lines directly above
        cs = s
        while cs > prev_end and (body[cs - 1].lstrip().startswith(("*", "/**", "//", "*/"))
                                 or body[cs - 1].strip() == ""):
            cs -= 1
        end = starts[bi + 1] if bi + 1 < len(starts) else len(body)
        # next block's attached comments belong to it, not this one —
        # handled by the cs-walk of the NEXT iteration; trim trailing
        # comments here by walking back from end
        te = end
        while te > s + 1 and (body[te - 1].lstrip().startswith(("*", "/**", "//", "*/"))
                              or body[te - 1].strip() == ""):
            te -= 1
        name = MEMBER_RE.match(body[s]).group(1)
        blocks.append((name, body[cs:te]))
        prev_end = te
    names = [b[0] for b in blocks]
    assert "all" in names and "oracle" in names, names

    # ---- parse the `all` and `oracle` maps into per-entry text
    def parse_map(name):
        txt = dict(blocks)[name]
        entries = {}
        cur_key, cur = None, []
        open_line = None
        for i, l in enumerate(txt):
            if open_line is None:
                if re.match(r"^  (?:private\[queries\] )?(?:lazy )?val "
                            + name, l):
                    open_line = i
                continue
            m = ENTRY_RE.match(l)
            if m:
                if cur_key:
                    entries[cur_key] = cur
                cur_key, cur = m.group(1), [l]
            elif l == "  )":
                if cur_key:
                    entries[cur_key] = cur
                cur_key = None
                break
            elif cur_key:
                cur.append(l)
        return entries

    all_entries = parse_map("all")
    oracle_entries = parse_map("oracle")
    missing = [q for q in all_entries if q not in QUERY_TIER]
    assert not missing, f"unassigned queries: {missing}"
    extra = [q for q in QUERY_TIER if q not in all_entries]
    assert not extra, f"assigned but not in registry: {extra}"
    orphan_oracles = [q for q in oracle_entries if q not in QUERY_TIER]
    assert not orphan_oracles, f"oracle without tier: {orphan_oracles}"

    # ---- assign every block
    def tier_of(name):
        if name in ("all", "oracle"):
            return None  # regenerated
        if name.startswith("qExt"):
            # qExtDedupExact -> q_ext_dedup_exact
            snake = re.sub(r"(?<!^)(?=[A-Z0-9])", "_", name[4:]).lower()
            snake = re.sub(r"_(\d)", r"\1", snake)  # int8 etc.
            key = "q_ext_" + snake
            if key in QUERY_TIER:
                return QUERY_TIER[key]
            # fall back: find the registry entry that references this method
            for q, txt in all_entries.items():
                if f"(qExt{name[4:]} _)" in "\n".join(txt) or \
                   f"({name} _)" in "\n".join(txt):
                    return QUERY_TIER[q]
            raise AssertionError(f"cannot map query method {name}")
        if name in HELPER_TIER:
            return HELPER_TIER[name]
        raise AssertionError(f"unassigned helper {name}")

    tier_blocks = {t: [] for t in TIERS + ["Base"]}
    for name, txt in blocks:
        t = tier_of(name)
        if t is None:
            continue
        text = "\n".join(txt)
        if t == "Base":
            # base members are used across tiers: widen private -> queries
            text = re.sub(r"^  private (def|val|lazy val)",
                          r"  private[queries] \1", text, flags=re.M)
        tier_blocks[t].append(text)

    imports = "\n".join(header[:next(
        i for i, l in enumerate(header) if l.startswith("/**"))])
    objdoc = "\n".join(header[next(
        i for i, l in enumerate(header) if l.startswith("/**")):])

    qtype = "Map[String, (SparkSession, String) => DataFrame]"

    def entries_text(d, keys):
        out = []
        for k in keys:
            out.extend(d[k])
        # normalize: every entry line ends with "," except ensure last does
        # not break the Map( ... ) — original entries already end with ","
        return "\n".join(out)

    for t in TIERS:
        qkeys = [q for q in all_entries if QUERY_TIER[q] == t]
        okeys = [q for q in oracle_entries if QUERY_TIER.get(q) == t]
        lname = t.lower()
        parts = [imports, ""]
        parts.append(f"""/** The {t} tier of the extension-query registry —
  * split from the monolithic Qext.scala (round-17 verdict item 7, pure
  * mechanical move: bodies unchanged). [[Qext]] composes the tiers; see
  * its scaladoc for the registry/oracle policy.
  */
private[queries] trait Qext{t}Tier {{ this: QextBase =>""")
        parts.extend(tier_blocks[t])
        parts.append(f"""  private[queries] lazy val {lname}TierQueries: {qtype} = Map(
{entries_text(all_entries, qkeys)}
  )

  private[queries] lazy val {lname}TierOracles: Map[String, String] = Map(
{entries_text(oracle_entries, okeys)}
  )
}}""")
        open(f"src/main/scala/graft/queries/Qext{t}Tier.scala", "w").write(
            "\n\n".join(parts) + "\n")

    # base trait
    base = [imports, ""]
    base.append("""/** Shared plumbing of the extension-query tiers: table reader, the
  * LocalRelation materializer, the per-JVM signature-store lifecycle, and
  * the cross-tier SQL fragments. Split from the monolithic Qext.scala
  * (round-17 verdict item 7); every member is verbatim, widened to
  * `private[queries]` so the tier traits can reach it.
  */
private[queries] trait QextBase {""")
    base.extend(tier_blocks["Base"])
    base.append("}")
    open("src/main/scala/graft/queries/QextBase.scala", "w").write(
        "\n\n".join(base) + "\n")

    # composition object
    comp = [imports, "", objdoc.rstrip()]
    comp.append("""object Qext extends QextBase
    with QextDedupTier with QextSimTier with QextTextTier
    with QextRankTier with QextEventsTier with QextMiscTier {

  val all: Map[String, (SparkSession, String) => DataFrame] =
    dedupTierQueries ++ simTierQueries ++ textTierQueries ++
      rankTierQueries ++ eventsTierQueries ++ miscTierQueries

  val oracle: Map[String, String] =
    dedupTierOracles ++ simTierOracles ++ textTierOracles ++
      rankTierOracles ++ eventsTierOracles ++ miscTierOracles
}""")
    open(SRC, "w").write("\n\n".join(comp) + "\n")

    print(f"blocks: {len(blocks)}, queries: {len(all_entries)}, "
          f"oracles: {len(oracle_entries)}")
    for t in TIERS + ["Base"]:
        print(f"  {t}: {len(tier_blocks[t])} blocks")


if __name__ == "__main__":
    main()
