package graft

/** Every catalog query that writes a warehouse/model at a FIXED path
  * under /root/repo/target must be re-entrant without manual cleanup:
  * the driver's Verify/Bench reality is back-to-back runs (and runs
  * across scale factors) against the same paths, with no `rm -rf`
  * between. The round-8 gate failure was exactly this class of bug —
  * CorpusIngest.bootstrap left a previous generation's `batch>=1`
  * subtrees alive and the re-run served the DEAD generation's rows.
  * This spec turns that from a driver-gate surprise into a local red
  * test: each fixed-path query runs TWICE in-session at sf0.001 and
  * the result sets must be identical (and non-empty, or the check is
  * vacuous).
  *
  * tempRoot-based queries (q136, q137, q148's ivf table) get a fresh
  * dir per run by construction and are covered by EntrySpec.
  */
class ReentrancySpec extends SparkSpec {

  private val fixedPathQueries = Seq(
    "q141_semdedup",            // graft_centroids/q141
    "q148_incremental_ivf",     // graft_centroids/q148
    "q149_bpe_tokenize",        // graft_bpe/merges + lexicon
    "q150_ivf_pq",              // graft_centroids/q150
    "q151_mojibake_repair",     // graft_mojibake/mapping
    "q152_bpe_pack",            // graft_bpe/merges_q152 + lexicon_q152
    "q154_nb_classifier",       // graft_nb/q154
    "q156_cluster_sample",      // graft_centroids/q156
    "q157_inverted_index",      // graft_invidx/q157
    "q160_phrase_search",       // graft_invidx/q160
    "q161_dsir_select",         // graft_dsir/q161
    "q162_corpus_build",        // graft_mojibake/mapping_q162, nb, dsir, bpe
    "q163_pq_codebooks",        // graft_centroids/q163 + graft_pq/q163
    "q164_proximity_search",    // graft_invidx/q164
    "q167_index_compact",       // graft_invidx/q167
    "q168_incremental_corpus",  // graft_corpus/q168 (bootstrap/rollback)
    "q170_adc_search",          // graft_centroids/q170 + graft_pq/q170
    "q171_auto_compact",        // graft_invidx/q171
    "q172_adc_ingest",          // graft_adc/q172
    "q173_maxscore_topk",       // graft_invidx/q173
    "q179_batch_search",        // graft_invidx/q179
    "q180_adc_compact",         // graft_adc/q180
    "q181_mmr_diversify",       // graft_adc/q181 + fixture marker
    "q184_warehouse_rrf",       // graft_invidx/q184 + graft_adc/q184
    "q185_bpe_fertility",       // graft_bpe/merges_q185 + fixture marker
                                //   + graft_unigram/pieces_q185
    "q187_unigram_tokenize",    // graft_unigram/pieces_q187
    "q189_ingest_funnel",       // graft_corpus/q189 (bootstrap/rollback)
    "q190_tiered_compact",      // graft_invidx/q190
    "q191_adc_tiered",          // graft_adc/q191
    "q192_langid_predict",      // graft_nb/q192
    "q193_semantic_decon",      // graft_adc/q193 + fixture marker
    "q194_recall_drift",        // graft_adc/q194 + fixture marker
    "q195_corpus_asof",         // graft_corpus/q195 + fixture marker
    "q196_invidx_rollback")     // graft_invidx/q196

  test("every fixed-path query is re-entrant in-session, no manual cleanup") {
    val missing = fixedPathQueries.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown query names: $missing")
    val bad = fixedPathQueries.flatMap { name =>
      val fn = SparkEntry.queries(name)
      def snap(): Seq[String] =
        fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
      val first = snap()
      val second = snap()
      if (first.isEmpty) Some(s"$name: empty result (vacuous check)")
      else if (first != second) Some(s"$name: re-run diverged " +
        s"(${first.size} vs ${second.size} rows; first diff at " +
        s"${first.zip(second).indexWhere(p => p._1 != p._2)})")
      else None
    }
    assert(bad.isEmpty, "\n" + bad.mkString("\n"))
  }
}
