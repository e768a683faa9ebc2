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
    # --- round 16 rotation: the 48 queries whose latest green row is
    # r14 (no row in CORRECTNESS_r15.json — due this round) PLUS the
    # two r15-covered queries whose build path was TOUCHED by the r16
    # scratch-dir fix (r15 verdict #1): dedup_streamed_incremental
    # (its checkpoint/sink site) and sampling_streamed_stratified
    # (run_available_now's explicit checkpoint — its five other
    # consumers are already in the stale set). Must-check = 48 + 2 =
    # 50, slack fully consumed. Shared-build OWNERS lead their
    # consumers (bench cache hygiene): graph_pagerank_clicks ->
    # triangle/coreness, pipeline_ingest_hash_log ->
    # pipeline_ingest_manifest.
    "dedup_streamed_incremental",
    "sampling_streamed_stratified",
    "similarity_label_centroids",
    "similarity_assign_centroids",
    "similarity_semantic_dedup",
    "similarity_hybrid_rrf",
    "text_contamination_ngram",
    "text_quality_classifier",
    "text_redact_pii",
    "pipeline_materialize_manifest",
    "pipeline_ingest_hash_log",
    "pipeline_ingest_manifest",
    "pipeline_epoch_transfer",
    "sampling_chunk_documents",
    "sampling_source_cap",
    "sampling_temperature_mix",
    "dedup_substring_spans",
    "multimodal_frame_plan",
    "relational_regional_revenue",
    "relational_streamed_hll",
    "relational_topk_parts_per_brand",
    "relational_rollup_pricing",
    "relational_grouping_sets",
    "relational_cube_order_stats",
    "relational_pivot_returnflag",
    "relational_kv_upsert",
    "relational_countmin_heavy_hitters",
    "relational_bloom_customers",
    "relational_idle_customers",
    "relational_scd2_prices",
    "relational_funnel_stages",
    "relational_unpivot_measures",
    "relational_setops_customers",
    "relational_filter_case_orders",
    "relational_above_avg_orders",
    "relational_integrity_checks",
    "relational_profile",
    "relational_winsorized_prices",
    "relational_pointintime_prices",
    "relational_returned_orders",
    "events_streamed_tumbling",
    "events_streamed_session",
    "events_streamed_view_purchase",
    "events_streamed_anomaly",
    "events_streamed_attribution",
    "events_drift_chisq",
    "events_retention_cohorts",
    "graph_pagerank_clicks",
    "graph_triangle_clicks",
    "graph_coreness_clicks",
]
ROUND_LAST: list[str] = [
    # (empty this round: the four batch twins that used to be the
    # designated budget cut are retired from the surface entirely)
]
