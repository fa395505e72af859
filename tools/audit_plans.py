"""Plan-shape audit: assert the physical plans have the properties the
100 TB design depends on (pushdown, broadcast, single-shuffle windows, no
cartesian joins, column pruning).

Usage: python tools/audit_plans.py [sf_dir]
Note: whole-stage codegen shows as a `*(n)` operator prefix in
executedPlan().toString(), not the literal string "WholeStageCodegen".
"""

from __future__ import annotations

import sys


CHECKS = {
    "filter_project": [
        ("parquet filter pushdown", lambda p: "PushedFilters: [" in p and "IsNotNull" in p),
        ("wholestage codegen", lambda p: "*(1)" in p),
    ],
    "join_enrich_star": [
        ("broadcast join present", lambda p: "BroadcastHashJoin" in p),
        ("no cartesian", lambda p: "Cartesian" not in p),
        ("filter pushed to scan", lambda p: "PushedFilters: [" in p),
    ],
    "window_sliding_time_10m": [
        ("single exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ("no self-join", lambda p: "SortMergeJoin" not in p),
    ],
    "window_session_30m": [
        ("native session window", lambda p: "session_window" in p or "SessionWindow" in p),
    ],
    "dedup_minhash_lsh": [
        ("no cartesian/nested-loop", lambda p: "Cartesian" not in p and "BroadcastNestedLoop" not in p),
        ("column pruning on docs scan", lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
    ],
    "dedup_embedding_cosine": [
        ("no cartesian", lambda p: "Cartesian" not in p),
        # r13 §6 skew-safe occupancy cap: groupBy-count + keyed SEMI join,
        # never a window — a count() window partitioned by the bucket key
        # funnels a mass-duplicate corpus's hot bucket through one
        # unsplittable task BEFORE the cap filter can drop it, and AQE
        # skew handling applies to joins only (guide §2.5)
        ("occupancy cap as aggregate + semi join, not a window",
         lambda p: "Window" not in p and "HashAggregate" in p
         and "LeftSemi" in p),
        ("signature frames cached (single evaluation)",
         lambda p: "InMemoryTableScan" in p),
    ],
    "dedup_exact_substr": [
        # ExactSubstr removal spans: NO pairwise candidate join may appear
        # anywhere — the dup decision is count>=2 on the positional gram
        # hash (combine-enabled aggregate) semi-joined back at
        # multiplicity 1, then per-doc windows; any self-equi-join of the
        # positional index would reintroduce the quadratic regime
        ("no cartesian/nested-loop",
         lambda p: "Cartesian" not in p and "BroadcastNestedLoop" not in p),
        ("dup-mark via aggregate + semi join",
         lambda p: "HashAggregate" in p and "LeftSemi" in p),
        ("column pruning on docs scan",
         lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
    ],
    "dedup_simhash": [
        # r12 scale-true blocking: the candidate self-join must be a keyed
        # equi-join over CAPPED chunk buckets — the bucket-size HAVING
        # shows as an aggregate feeding a semi join ahead of the pair join
        ("no cartesian/nested-loop",
         lambda p: "Cartesian" not in p and "BroadcastNestedLoop" not in p),
        ("bucket-cap aggregate before the join",
         lambda p: "HashAggregate" in p and "LeftSemi" in p),
        ("column pruning on docs scan",
         lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
    ],
    "multimodal_h264_b": [
        # synthesis + decode are mapInPandas stages; payloads must never
        # shuffle (same contract as the other h264 gates)
        ("no join of payloads",
         lambda p: "Join" not in p and "Cartesian" not in p),
        ("arrow-batched python stages", lambda p: "MapInPandas" in p),
    ],
    "multimodal_h264_cabac": [
        # synthesis + decode are mapInPandas stages; payloads must never
        # shuffle (the only exchange is the 8-byte doc-id spread before
        # synthesis, plus the final presentation sort)
        ("no join of payloads",
         lambda p: "Join" not in p and "Cartesian" not in p),
        ("arrow-batched python stages", lambda p: "MapInPandas" in p),
    ],
    "stream_stream_windowed_join": [
        ("equi-join (not nested loop)", lambda p: "BroadcastNestedLoop" not in p and "Cartesian" not in p),
    ],
    "agg_pricing_summary": [
        ("hash aggregation", lambda p: "HashAggregate" in p),
    ],
    "dedup_ngram_jaccard": [
        # contamination half: the eval-side inverted index must broadcast
        # (eval sets are benchmark-sized; the TB train side streams
        # map-side) and nothing may degrade to a cartesian
        ("no cartesian/nested-loop", lambda p: "Cartesian" not in p),
        ("eval index broadcast", lambda p: "BroadcastHashJoin" in p),
    ],
    "sequence_packing": [
        # sharded prefix sum: exactly one shuffle (the shard key); a global
        # cumsum would show a single-partition Exchange
        ("one keyed exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ("no single-partition window", lambda p: "Exchange SinglePartition" not in p),
        ("column pruning on docs scan", lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
    ],
    "sampling_modes": [
        # domain-mix rates are dimension-sized and must broadcast back;
        # the corpus pass itself is a map-only filter
        ("rates broadcast", lambda p: "BroadcastHashJoin" in p),
        ("no cartesian", lambda p: "Cartesian" not in p),
    ],
    "agg_having_topn": [
        # ORDER BY + LIMIT must fuse into a per-partition top-k + driver
        # merge (no global sort of the aggregate output)
        ("take-ordered pushdown", lambda p: "TakeOrderedAndProject" in p),
    ],
    "window_sort_top3": [
        # rank() <= k must push the limit INTO the window sort so each key
        # keeps only k rows before ranking (Spark's WindowGroupLimit)
        ("per-key group limit pushdown", lambda p: "WindowGroupLimit" in p),
    ],
    "doc_chunking": [
        # tokenize + row-local struct transform + explode: a MAP-ONLY plan —
        # any Exchange here means the chunker stopped scaling linearly
        ("zero exchanges (map-only)", lambda p: "Exchange" not in p),
        ("column pruning on docs scan", lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
    ],
    "text_surprisal": [
        # unigram model: combine-enabled tf agg + token-keyed join back +
        # per-doc agg; the one-row total must broadcast, never shuffle-join
        ("hash aggregation (map-side combine)", lambda p: "HashAggregate" in p),
        ("corpus total broadcast", lambda p: "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p),
        ("no cartesian", lambda p: "CartesianProduct" not in p),
    ],
    "asof_join_last_view": [
        # merged-timeline formulation: ONE window over the union — a range
        # join + rank would multiply each left row by every earlier right
        # row before pruning
        ("no join multiplication", lambda p: "Join" not in p),
        ("single window pass", lambda p: p.count("RunningWindowFunction") <= 1),
        ("union of both sides", lambda p: "Union" in p),
    ],
    "dedup_segments": [
        # row-local segmentation + keep-first + reassembly: exactly two
        # keyed shuffles (segment hash, then doc_id) — a third would mean
        # the reassembly sort left the row-local path
        ("two keyed exchanges", lambda p: p.count("Exchange hashpartitioning") == 2),
        ("no single-partition exchange", lambda p: "Exchange SinglePartition" not in p),
        ("column pruning on docs scan", lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
    ],
    "corpus_shuffle": [
        # shard hash is row-local; only the per-shard position window
        # shuffles — and never into one partition (no global sort)
        ("one keyed exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ("no global sort", lambda p: "Exchange SinglePartition" not in p and "rangepartitioning" not in p),
        ("column pruning (doc_id only)", lambda p: "ReadSchema: struct<doc_id:bigint>" in p),
    ],
    "analytic_functions": [
        # lag/lead/rank/running-sum must share ONE window pass: one keyed
        # exchange, one Window operator
        ("one keyed exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ("single window operator", lambda p: p.count("Window [") == 1),
        ("column pruning on orders scan", lambda p: "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double,o_orderdate:timestamp" in p),
    ],
    "agg_rollup": [
        # grouping sets expand inside one aggregate pass — never a Union of
        # per-level re-aggregations
        ("expand operator", lambda p: "Expand" in p),
        ("no union of levels", lambda p: "Union" not in p),
        ("hash aggregation", lambda p: "HashAggregate" in p),
    ],
    "agg_percentiles": [
        # one accumulator pass with map-side partials (ObjectHashAggregate
        # for the TypedImperative percentile), one keyed exchange
        ("partial aggregation", lambda p: "partial_percentile" in p or "partial" in p),
        ("one keyed exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
    ],
    "analytic_range_frame": [
        # both trailing-window aggregates share ONE window pass
        ("one keyed exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ("single window operator", lambda p: p.count("Window [") == 1),
    ],
    "agg_unpivot": [
        # stack() expands in the projection: ONE scan, no self-union
        ("single scan", lambda p: p.count("Scan parquet") == 1),
        ("no union", lambda p: "Union" not in p),
        ("map-only (no exchange)", lambda p: "Exchange" not in p),
    ],
    "agg_pivot": [
        # conditional aggregates in ONE pass: a single keyed shuffle — the
        # .pivot() PivotFirst formulation would show two
        ("hash aggregation", lambda p: "HashAggregate" in p),
        ("no union of values", lambda p: "Union" not in p),
        ("single scan", lambda p: p.count("Scan parquet") == 1),
        ("one keyed exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
    ],
    "dedup_fuzzy": [
        # prefix-blocked candidate join: equi-join on the block key,
        # never a cartesian; distance filter rides the join. Block-size
        # cap via groupBy-count + membership join — NO Window operator:
        # a window over blk would funnel a degenerate shared-prefix
        # corpus through one unsplittable task, while the groupBy
        # partial-aggregates map-side and AQE can broadcast/skew-split
        # the join (costs one extra scan, hence <= 3)
        ("no cartesian/nested-loop", lambda p: "CartesianProduct" not in p and "BroadcastNestedLoop" not in p),
        ("column pruning on docs scan", lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
        ("no skew-funneling window", lambda p: "Window" not in p),
        ("partial agg before exchange", lambda p: "partial_count" in p),
        # 2 row scans (x, y) + 2 text-only count scans (one per side in
        # the static plan; identical subtrees, so AQE's runtime exchange
        # reuse can dedupe them). The extra pruned scans are the price of
        # not funneling a degenerate shared-prefix corpus through one
        # unsplittable Window task.
        ("bounded scans (sides + counts)", lambda p: p.count("Scan parquet") <= 4),
    ],
    "join_q10_returned_items": [
        ("nation broadcasts", lambda p: "BroadcastHashJoin" in p),
        ("return-flag pushed to scan", lambda p: "PushedFilters: [" in p and "l_returnflag" in p),
        ("no cartesian", lambda p: "Cartesian" not in p),
    ],
    "join_q18_large_orders": [
        # the HAVING aggregate must run BEFORE the joins (shuffle scales
        # with qualifying orders, not lineitems): the lineitem side's
        # aggregate sits below the join in the plan
        ("hash aggregate present", lambda p: "HashAggregate" in p),
        ("no cartesian", lambda p: "Cartesian" not in p),
        ("lineitem scan pruned to two cols", lambda p: "struct<l_orderkey:bigint,l_quantity:" in p),
    ],
    "setops_union_intersect_except": [
        # INTERSECT/EXCEPT must compile to semi/anti joins over the
        # deduplicated key sets, with the year slices pruned at the scan
        ("intersect is a semi join", lambda p: "LeftSemi" in p),
        ("except is an anti join", lambda p: "LeftAnti" in p),
        ("year slices pushed to scan", lambda p: "GreaterThanOrEqual(o_orderdate" in p),
        ("no cartesian", lambda p: "Cartesian" not in p),
    ],
    "join_q19_disjunctive": [
        # the per-side portions of the OR-of-ANDs must reach BOTH parquet
        # scans (disjunct pushdown), the part side must broadcast, and the
        # cross-side disjunction re-check stays on the join — not a filter
        # above a full cartesian
        ("disjunct pushed to lineitem scan", lambda p: "PushedFilters: [Or(" in p),
        ("part side broadcast", lambda p: "BroadcastHashJoin" in p),
        ("no cartesian", lambda p: "Cartesian" not in p),
        ("two scans only", lambda p: p.count("Scan parquet") == 2),
    ],
    "join_q21_waiting_supplier": [
        # the EXISTS/NOT EXISTS pair is rewritten as ONE per-(order,supplier)
        # aggregate chain — the literal form's 3x lineitem self-join never
        # appears (lineitem is scanned once; the oracle scans it thrice)
        ("single lineitem scan", lambda p: p.count("lineitem.parquet") == 1),
        ("order-status pushed to scan", lambda p: "EqualTo(o_orderstatus,F)" in p),
        ("no cartesian/nested-loop", lambda p: "Cartesian" not in p and "BroadcastNestedLoop" not in p),
        ("top-n via TakeOrdered", lambda p: "TakeOrderedAndProject" in p),
    ],
    "join_q22_dormant_customers": [
        # scalar (n, sum) aggregate broadcasts into the filter (1-row build
        # side — the BroadcastNestedLoop here is by design); the NOT EXISTS
        # is an anti join against the priority/date-pruned orders slice
        ("anti join", lambda p: "LeftAnti" in p),
        ("orders slice pruned at scan", lambda p: "EqualTo(o_orderpriority,1-URGENT)" in p),
        ("scalar stats broadcast", lambda p: "BroadcastExchange IdentityBroadcastMode" in p),
        ("no shuffled join", lambda p: "SortMergeJoin" not in p),
    ],
    "events_funnel_24h": [
        # three stage timestamps resolve in ONE user-keyed exchange with
        # three window passes over it (the oracle's chained CTEs cost three
        # fact shuffles); the stage rollup exchanges 3 rows after partial agg
        ("one user-keyed exchange", lambda p: p.count("Exchange hashpartitioning(user_id") == 1),
        ("three fused window passes", lambda p: p.count("Window") == 3),
        ("single events scan", lambda p: p.count("Scan parquet") == 1),
        ("partial agg before stage exchange", lambda p: "partial_count" in p),
    ],
    "expr_correlated_subquery": [
        # both correlated subqueries must DECORRELATE into aggregate+join
        # subplans (the O(n^2) per-row re-execution trap shows up as a
        # nested-loop/subquery node instead)
        ("no cartesian/nested-loop", lambda p: "Cartesian" not in p and "BroadcastNestedLoop" not in p),
        ("decorrelated to joins", lambda p: ("BroadcastHashJoin" in p or "SortMergeJoin" in p)),
        ("no per-row subquery exec", lambda p: "Subquery" not in p),
        ("bounded scans", lambda p: p.count("Scan parquet") <= 3),
    ],
    "agg_cube": [
        # all 2^k grouping sets expand inside ONE aggregate pass
        ("expand (grouping sets)", lambda p: "Expand" in p),
        ("single scan", lambda p: p.count("Scan parquet") == 1),
        ("one keyed exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
    ],
    "analytic_ranks": [
        # all four rank functions share one window pass: one shuffle, one sort
        ("single window pass", lambda p: p.count("Window") == 1),
        ("one keyed exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ("single scan", lambda p: p.count("Scan parquet") == 1),
    ],
    "events_gapfill_1h": [
        # grid generates from aggregated (key, min, max) rows, never raw
        # events; forward fill is one window pass
        ("single window pass", lambda p: p.count("Window") == 1),
        ("no cartesian", lambda p: "Cartesian" not in p),
        ("bounded scans (hourly + grid)", lambda p: p.count("Scan parquet") <= 2),
    ],
    "sql_trigger_ticks": [
        # the tick relation is dimension-sized and must broadcast against
        # the bucketed events; one shuffle (the 15-min bucket agg)
        ("tick join broadcasts", lambda p: "BroadcastHashJoin" in p),
        ("no sort-merge/cartesian", lambda p: "SortMergeJoin" not in p and "Cartesian" not in p),
        ("single events shuffle", lambda p: p.count("Exchange hashpartitioning") == 1),
    ],
    "window_unique_newest": [
        # retained-newest = one keyed window pass (WindowGroupLimit pushes
        # the rank-1 filter below the sort); no join
        ("one keyed exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ("rank filter pushed (group-limit)", lambda p: "WindowGroupLimit" in p),
        ("no join", lambda p: "Join" not in p),
    ],
    "window_frequent_topk": [
        # exact top-k values: map-side-combined count, global top-n via
        # per-partition heaps (TakeOrdered), survivors broadcast back —
        # never a single-partition window over the distinct-item relation
        ("survivors broadcast (semi)", lambda p: "BroadcastHashJoin" in p and "LeftSemi" in p),
        ("top-n via TakeOrdered", lambda p: "TakeOrderedAndProject" in p),
        ("no single-partition funnel", lambda p: "Exchange SinglePartition" not in p),
    ],
    "sql_table_dml": [
        # update/delete/upsert streams are dim-sized here and broadcast;
        # nothing degrades to sort-merge or cartesian
        ("dim joins broadcast", lambda p: "BroadcastHashJoin" in p),
        ("no sort-merge/cartesian", lambda p: "SortMergeJoin" not in p and "Cartesian" not in p),
    ],
    "dedup_bloom": [
        # Bloom probe is map-only; only the bounded position-distinct and
        # the pruned verify join shuffle. Nothing may degrade to cartesian.
        ("no cartesian/nested-loop", lambda p: "Cartesian" not in p and "BroadcastNestedLoop" not in p),
        ("column pruning on docs scan", lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
    ],
    "join_q7_volume_shipping": [
        # the nation-pair predicate must reach the 25-row nation scans and
        # the ship-date range must reach the lineitem scan; no cartesian
        ("nation-name filter pushed", lambda p: "In(n_name" in p),
        ("shipdate pushed to lineitem scan",
         lambda p: "GreaterThanOrEqual(l_shipdate" in p),
        ("no cartesian", lambda p: "Cartesian" not in p),
        ("nation dims broadcast", lambda p: "BroadcastHashJoin" in p),
    ],
    "search_bm25": [
        # inverted-index shape: the tiny query set and the vocabulary-sized
        # df relation broadcast; candidates never cross-join the corpus
        # (the only nested-loop is the one-row stats broadcast)
        ("query set broadcast", lambda p: "BroadcastHashJoin" in p),
        ("no data-sized cartesian", lambda p: "CartesianProduct" not in p),
        ("top-k pushed down (WindowGroupLimit)",
         lambda p: "WindowGroupLimit" in p),
        ("column pruning on docs scan", lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
    ],
    "events_json_props": [
        # typed from_json projection is row-local: one hash-agg exchange,
        # no join, JSON never reaches the shuffle
        ("single exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ("no join", lambda p: "Join" not in p),
        ("column pruning on events scan",
         lambda p: "ReadSchema: struct<event_type:string,props:string>" in p),
    ],
    "events_cohort_retention": [
        # ONE user-keyed shuffle (bounded collect_set) + the final matrix
        # aggregate; the relational two-agg+join shape must have collapsed
        ("exactly two exchanges", lambda p: p.count("Exchange hashpartitioning") == 2),
        ("no join", lambda p: "Join" not in p),
        ("map-side partial set", lambda p: "partial_collect_set" in p or "objhashaggregate" in p.lower()),
    ],
    "search_mmr_rerank": [
        # pool-bounded before the greedy step: the corpus-sized side joins
        # only against broadcast seeds; the iterative selection runs as a
        # cogrouped Arrow-batched pandas stage over dimension-sized groups
        ("pool caps pushed down (WindowGroupLimit)",
         lambda p: "WindowGroupLimit" in p),
        ("greedy step is cogrouped pandas",
         lambda p: "FlatMapCoGroupsInPandas" in p),
        ("no data-sized cartesian", lambda p: "CartesianProduct" not in p),
    ],
    "search_hybrid_rrf": [
        # both rankers bound their pool before the fusion join; the seed
        # (query) sides broadcast; no data-sized cartesian anywhere
        ("seed sides broadcast", lambda p: "BroadcastHashJoin" in p),
        ("no data-sized cartesian", lambda p: "CartesianProduct" not in p),
        ("pool caps pushed down (WindowGroupLimit)",
         lambda p: "WindowGroupLimit" in p),
    ],
    "search_bm25_store": [
        # the store search must prune its parquet scan to the query terms'
        # hash buckets via STATIC partition pruning (the literal bucket-IN
        # resolved at plan time), broadcast the query set, and keep the
        # top-k as a group-limit — same shape as the batch gate plus the
        # pruned persisted scan
        ("bucket partition pruning", lambda p: "PartitionFilters: [" in p),
        ("query set broadcast", lambda p: "BroadcastHashJoin" in p),
        ("top-k pushed down (WindowGroupLimit)",
         lambda p: "WindowGroupLimit" in p),
        ("no data-sized cartesian", lambda p: "CartesianProduct" not in p),
    ],
    "agg_q6_forecast_revenue": [
        # the pushdown showcase: all three predicates at the scan, no join,
        # no keyed exchange (1-row global agg merges via SinglePartition)
        # (the plan string truncates long PushedFilters lists with "...",
        # so match the prefix of the range predicate)
        ("all predicates pushed", lambda p: "PushedFilters: [IsNotNull(l_shipdate)" in p
         and "GreaterThanOrEqual(l_shipda" in p),
        ("no join", lambda p: "Join" not in p),
        ("no keyed exchange", lambda p: "Exchange hashpartitioning" not in p),
        ("3-column pruned scan", lambda p: "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate" in p),
    ],
    "join_q4_priority_checking": [
        # EXISTS must compile to LEFT SEMI (at-most-once per order, no
        # DISTINCT pass) with the quarter filter at the orders scan
        ("left semi join", lambda p: "LeftSemi" in p),
        ("no cartesian", lambda p: "CartesianProduct" not in p),
        ("orders scan date-pruned", lambda p: "GreaterThanOrEqual(o_orderdate" in p),
        ("lineitem pruned to 2 cols", lambda p: "ReadSchema: struct<l_orderkey:bigint,l_shipdate" in p),
    ],
    "join_q2_min_cost_supplier": [
        # correlated-min decorrelation: dims broadcast, ONE partkey window
        # computes the per-part floor, top-30 fuses into TakeOrdered
        ("dims broadcast", lambda p: p.count("BroadcastHashJoin") >= 3),
        ("single window pass", lambda p: p.count("Window [") == 1),
        ("take-ordered top-k", lambda p: "TakeOrderedAndProject" in p),
        ("no cartesian", lambda p: "CartesianProduct" not in p),
    ],
    "join_q8_market_share": [
        # dual-role nation: all dims broadcast; the only big exchange pair
        # is lineitem-orders on orderkey; ratio in ONE aggregate (no
        # self-join of the fact)
        ("dims broadcast", lambda p: p.count("BroadcastHashJoin") >= 4),
        ("no cartesian", lambda p: "CartesianProduct" not in p),
        ("part type filter pushed", lambda p: "EqualTo(p_type,ECONOMY)" in p),
    ],
    "join_q9_product_profit": [
        # LIKE-pruned part dim broadcasts; the name filter reaches the part
        # scan as a StringContains pushdown
        ("LIKE pushed to part scan", lambda p: "StringContains(p_name,red)" in p),
        ("dims broadcast", lambda p: p.count("BroadcastHashJoin") >= 2),
        ("no cartesian", lambda p: "CartesianProduct" not in p),
    ],
    "agg_q11_important_parts": [
        # scalar-threshold HAVING: the 1-row mean cross-broadcasts (a
        # BroadcastNestedLoopJoin over ONE row, not a data-sized cartesian);
        # runtime AQE reuses the partkey exchange so the fact is scanned
        # once (asserted post-execution in tests/test_tpch_shapes.py)
        ("scalar broadcast (1-row BNLJ)", lambda p: "BroadcastNestedLoopJoin" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("nation filter pushed", lambda p: "In(n_name" in p or "EqualTo(n_name" in p),
    ],
    "join_q12_late_line_priority": [
        # year filter prunes the fact scan; conditional counts in ONE agg
        ("ship-year pushed", lambda p: "GreaterThanOrEqual(l_shipdate" in p),
        ("single aggregation pass", lambda p: "HashAggregate" in p),
        ("no cartesian", lambda p: "CartesianProduct" not in p),
    ],
    "join_q13_order_distribution": [
        # outer join must SURVIVE (zero-order customers kept): LeftOuter in
        # the plan, priority exclusion pushed to the orders scan, and the
        # second aggregate adds one tiny exchange
        ("left outer preserved", lambda p: "LeftOuter" in p or "RightOuter" in p),
        ("priority filter pushed", lambda p: "Not(EqualTo(o_orderpriority" in p),
        ("two-level agg", lambda p: p.count("Exchange hashpartitioning") == 2),
    ],
    "agg_q14_promo_share": [
        # month-pruned fact + broadcast 2-col part dim; ratio in one agg —
        # zero keyed exchanges end-to-end
        ("month filter pushed", lambda p: "GreaterThanOrEqual(l_shipdate" in p),
        ("part dim broadcast", lambda p: "BroadcastHashJoin" in p),
        ("no keyed exchange", lambda p: "Exchange hashpartitioning" not in p),
    ],
    "join_q15_top_supplier": [
        # view + scalar-max: both consumers of the per-supplier aggregate
        # must share ONE canonical subtree (AQE ReusedExchange at runtime —
        # asserted post-execution in tests/test_tpch_shapes.py); the max
        # reduces partial per partition before the 1-row merge
        ("date filter pushed", lambda p: "GreaterThanOrEqual(l_shipdate" in p),
        ("supplier dim broadcast", lambda p: "BroadcastHashJoin" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "agg_q16_supplier_variety": [
        # distinct (part,supp) pairs once; triple-pruned part and the
        # blacklist broadcast; NOT IN as LEFT ANTI
        ("blacklist anti join", lambda p: "LeftAnti" in p),
        ("part filters pushed", lambda p: "Not(EqualTo(p_brand,Brand#45))" in p),
        ("dims broadcast", lambda p: p.count("BroadcastHashJoin") >= 2),
        ("no cartesian", lambda p: "CartesianProduct" not in p),
    ],
    "join_q17_small_quantity_revenue": [
        # correlated AVG decorrelation: brand-pruned part broadcasts FIRST,
        # then ONE partkey exchange carries the window mean — never a
        # second fact scan, never a self-join
        ("brand filter pushed", lambda p: "EqualTo(p_brand,Brand#23)" in p),
        ("part dim broadcast", lambda p: "BroadcastHashJoin" in p),
        ("one keyed exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ("single window pass", lambda p: p.count("Window [") == 1),
    ],
    "join_q20_part_promotion": [
        # share-of-part: the per-part total is a window ON the (part,supp)
        # aggregate — the oracle's second CTE + self-join costs zero extra
        # scans here
        ("single window pass", lambda p: p.count("Window [") == 1),
        ("name prefix pushed", lambda p: "StringStartsWith(p_name,small)" in p),
        ("dims broadcast", lambda p: p.count("BroadcastHashJoin") >= 2),
        ("no cartesian", lambda p: "CartesianProduct" not in p),
    ],
    "multimodal_h264": [
        # synth + demux + full H.264 I-frame decode are ONE mapInPandas
        # chain AFTER a round-robin spread of the 8-byte doc ids (the
        # local single-file input would otherwise serialize the decode
        # kernel on one core; at scale the input is already partitioned).
        # PAYLOADS never shuffle — they are created after that exchange;
        # no keyed exchange, no join (the display orderBy is a range sort)
        ("no keyed exchange", lambda p: "Exchange hashpartitioning" not in p),
        ("ids spread before synthesis (payloads never shuffle)",
         lambda p: "RoundRobinPartitioning" in p),
        ("no join", lambda p: "Join" not in p),
        ("column pruning (doc_id only)",
         lambda p: "ReadSchema: struct<doc_id:bigint>" in p),
    ],
    "multimodal_h264_gop": [
        # same shape contract as multimodal_h264: the GOP synth + chained
        # P-frame decode is ONE map-only kernel after a round-robin id
        # spread; payloads (and reference-frame state, which lives inside
        # the kernel) never shuffle
        ("no keyed exchange", lambda p: "Exchange hashpartitioning" not in p),
        ("ids spread before synthesis (payloads never shuffle)",
         lambda p: "RoundRobinPartitioning" in p),
        ("no join", lambda p: "Join" not in p),
        ("column pruning (doc_id only)",
         lambda p: "ReadSchema: struct<doc_id:bigint>" in p),
    ],
    "search_hybrid_store": [
        # the composed plan (both live stores + the independent twin +
        # the parity join) must keep every pool rank-capped, prune the
        # persisted scans (bucket + cell partition filters), and never
        # degrade to a data-sized cartesian
        ("persisted scans partition-pruned",
         lambda p: "PartitionFilters: [" in p),
        ("pool caps pushed down (WindowGroupLimit)",
         lambda p: "WindowGroupLimit" in p),
        ("no data-sized cartesian", lambda p: "CartesianProduct" not in p),
    ],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, "/root/repo")
    from engine_spark.queries import QUERIES
    from engine_spark.session import get_spark

    spark = get_spark("audit")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for name, checks in CHECKS.items():
        df = QUERIES[name].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # _ordered_once gates: the kernel chain executes inside a
        # localCheckpoint and the final plan only shows Sort over an
        # ExistingRDD — audit the stashed pre-sort child's plan too
        child = getattr(df, "_pre_order_child", None)
        if child is not None:
            plan += "\n" + child._jdf.queryExecution().executedPlan().toString()
        for label, pred in checks:
            ok = pred(plan)
            failures += 0 if ok else 1
            print(f"{'PASS' if ok else 'FAIL'}  {name}: {label}")
    print(f"\n== {failures} plan-shape failures ==")
    spark.stop()
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
