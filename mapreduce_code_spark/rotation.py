"""Per-round rotation state for the driver-visible query ordering.

Split out of ``registry.py`` (r15 verdict #7): the rotation lists churn
every round — a pure reorder was 115 lines of ``registry.py`` diff in
r15 — so they live here, in a module that carries NO kernels, and the
kernel-bearing registry stays diff-quiet across rounds. ``registry``
imports ``ROUND_FIRST``/``ROUND_LAST`` and re-exports them as its
``_FIRST``/``_LAST`` (the names the rotation tests pin).

THE ORDERING CONTRACT (moved verbatim from registry.py, r8 verdict
#1/#7): the driver verifies queries in the order ``queries()`` yields
them and has a finite per-round budget (~50 rows). So ordering is part
of the contract, and the rule is: a query goes FIRST if it is (a) new
this round, (b) its code was touched this round, or (c) its latest
driver row is one round old (rotation: nothing sits unchecked two
rounds in a row). With the fifteen retirees (see ``registry._RETIRED``)
the 98-query surface sits under the 2-round coverage ceiling — the
round-8 budget decision (SURVEY §8): additions beyond 100 queries
require a retirement, and near-twin retirement (streamed keeps the
row; oracled replaces rows-only) is the standing policy for funding
them.

BUDGET ARITHMETIC (the test's definition, not an estimate): with 98
registered and a 50-row sweep, the previous round covers 50, leaving
48 stale; so structural slack is EXACTLY 50 - 48 = 2 rows per round
for (new + touched + swaps). Each addition must be funded by a
retirement AND still fit that slack; a breach cannot ship quietly —
tests/test_registry_rotation.py::test_next_round_must_check_fits_budget
fails at build time if the stale+new set exceeds 50.
"""

from __future__ import annotations

ROUND_FIRST: list[str] = [
    # --- round 17 rotation: the 48 queries whose latest green row is
    # r15 (no row in CORRECTNESS_r16.json — due this round) PLUS the
    # one r16-covered query whose build path was TOUCHED by the r17
    # tempdir-site migration (r16 verdict #6): pipeline_epoch_transfer
    # reads _epoch_shards_src, which moved from a raw /tmp mkdtemp to
    # the tmpfs scratch allocator (its sibling consumer
    # pipeline_materialize_epoch is already in the stale set). The
    # OTHER two r17 perf changes need no rotation rows: bench.py's
    # fold-policy change touches no query build path, and session.py's
    # spark.local.dir move is surface-wide plumbing whose coverage is
    # argued via the full-registry driver_check sweep (r16 verdict #3's
    # prescribed alternative), not 98 rotation slots. Must-check =
    # 48 + 1 = 49, slack 1 — taken by pipeline_ingest_hash_log (end of
    # this list): the r17 ingest-scratch migration touched its build
    # path. Shared-build OWNERS lead their consumers
    # (bench cache hygiene): apriori_frequent_items -> itemsets/rules,
    # dedup_near_dup_scalable -> components_starcontract,
    # text_bpe_merges -> text_bpe_encode.
    "pipeline_materialize_epoch",
    "pipeline_epoch_transfer",
    "pipeline_curated_corpus",
    "pipeline_quality_margins",
    "apriori_frequent_items",
    "apriori_frequent_itemsets",
    "apriori_association_rules_ref",
    "regression_sgd_linear",
    "regression_sgd_logistic",
    "regression_ols_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_near_dup_scalable",
    "dedup_components_starcontract",
    "dedup_incremental",
    "text_stats",
    "text_lang_id",
    "text_quality",
    "text_winnow_fingerprint",
    "text_tfidf",
    "text_repetition_gopher",
    "text_bpe_merges",
    "text_bpe_encode",
    "similarity_topk_cosine",
    "similarity_cosine_dups",
    "similarity_topk_ivf_pinned",
    "similarity_quantize_int8",
    "multimodal_meta",
    "multimodal_features",
    "sampling_train_val_split",
    "sampling_global_shuffle",
    "sampling_quality_weighted",
    "sampling_pack_documents",
    "events_json_props",
    "events_sliding_window",
    "events_session_paths",
    "events_user_running_totals",
    "graph_lpa_communities",
    "relational_pricing_summary",
    "relational_customer_order_history",
    "relational_distinct_part_stats",
    "relational_quantity_quartiles",
    "relational_histogram_quantiles",
    "relational_hourly_gapfill",
    "relational_rolling_24h",
    "relational_events_orders_asof",
    "relational_events_close_pairs",
    # r17 optimization touch: the streamed-ingest run's work tree
    # (split, staging, checkpoint, shards) moved from a raw disk
    # mkdtemp to the tmpfs scratch allocator — the r16-verdict-#6
    # deferral was reversed because the OWNER row is the #1 bench
    # floor and its timed path committed to the contended root disk.
    # That touches BOTH ingest rows' build paths; the owner takes the
    # one remaining budget slot (must-check = 48 + 1 + 1 = 50, slack
    # 0), and pipeline_ingest_manifest — which reads the SAME
    # completed run the owner's slot re-certifies — is argued via the
    # full-registry driver_check sweep (scratch/driver_check_r17_*,
    # ALL OK), the session.py precedent above.
    "pipeline_ingest_hash_log",
]
ROUND_LAST: list[str] = [
    # (empty this round: the four batch twins that used to be the
    # designated budget cut are retired from the surface entirely)
]
