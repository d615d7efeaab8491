"""Public operator surface — one import for every bounded operator.

    from data_harvesting_ray import ops
    deduped = ops.dedup_exact(turns)
    joined  = ops.equi_join(deduped, stats, on="conv_id")

Streaming lives behind ``pipelines.streaming.StreamingEngine`` and the
``python -m data_harvesting_ray`` CLI; everything here is a
Dataset -> Dataset (or small-result) transform safe to compose freely.
Import is side-effect-free beyond the package's DataContext defaults;
call ``data_harvesting_ray.configure_session()`` after ``ray.init``
(each pipeline entry point also does it defensively).
"""

from __future__ import annotations

# per-record / projection / sampling
from .stages.normalize import normalize_turns  # noqa: F401
from .stages.projection import (  # noqa: F401
    call_spans,
    head_per_conv,
    systematic_sample,
    stratified_split,
    train_split,
    translate_tools,
)

# dedup / near-dup / similarity
from .stages.dedup import conv_dedup, dedup_exact, incremental_dedup  # noqa: F401
from .stages.dedup_approx import (  # noqa: F401
    minhash_candidates,
    minhash_near_dups,
    ngram_jaccard_near_dups,
    simhash_near_dups,
)
from .stages.components import (  # noqa: F401
    connected_components,
    keep_best_per_group,
)
from .stages.similarity import (  # noqa: F401
    dim_stats,
    embedding_near_dups,
    group_centroids,
    knn_bruteforce,
    knn_ivf,
    label_centroid_dist,
    quantize_embeddings,
    semdedup,
)
from .stages.text import (  # noqa: F401
    bpe_token_count,
    char_entropy,
    doc_dedup_exact,
    explode_ngrams,
    explode_tokens,
    fingerprint_docs,
    freq_spectrum,
    gopher_gate,
    lang_id,
    length_percentile_gate,
    normalize_text,
    quality_score,
    source_dup_stats,
    token_stats,
    tokenizer_fertility,
    vocab_drift,
    winnow_fingerprints,
)

# window functions (per-key ordered lag/lead, bounded trailing windows)
from .stages.window_fns import (  # noqa: F401
    rolling_sum,
    rolling_sum_salted,
    with_lag,
    with_lag_salted,
    with_rank,
)

# relevance / importance scoring
from .stages.relevance import (  # noqa: F401
    doc_keywords,
    dsir_weights,
    tfidf_scores,
    unigram_surprisal,
)

# scrubbing / decontamination / sequence packing
from .stages.scrub import (  # noqa: F401
    PII_RULES,
    contamination_flags,
    cross_split_contamination,
    fuzzy_split_contamination,
    overlap_contamination_ratio,
    scrub_text,
)
from .stages.packing import pack_sequences  # noqa: F401

# sketch-accelerated exact aggregates + deterministic cardinality sketch
from .stages.sketches import (  # noqa: F401
    heavy_hitters,
    heavy_tokens,
    kmv_distinct_tokens,
)

# reshapes / distributions / funnels
from .stages.aggregates import (  # noqa: F401
    late_order_counts,
    local_supplier_volume,
    pivot_counts,
    promo_revenue_share,
    rollup_counts,
    segment_revenue_topk,
    value_histogram,
)
from .stages.events import (  # noqa: F401
    daily_spikes,
    dow_profile,
    funnel_events,
    sliding_mau,
    type_cooccurrence,
    window_distinct_users,
)

# windows / CEP / state
from .stages.windows import (  # noqa: F401
    session_windows,
    session_windows_salted,
    sliding_windows,
    tumbling_windows,
)
from .stages.cep import PatternSpec, cep_matches  # noqa: F401

# joins
from .stages.join import (  # noqa: F401
    broadcast_join,
    equi_join,
    orphan_calls,
    tool_join,
)
from .stages.asof import (  # noqa: F401
    asof_join,
    asof_join_salted,
    interval_join,
    overlap_join,
)

# aggregates
from .stages.aggregates import (  # noqa: F401
    distinct_per_key,
    gap_quantiles,
    global_value_quantiles,
    key_skew_stats,
    lineitem_rollup,
    profile_table,
    quota_sample,
    role_mode,
    sample_per_key,
    stride_sample,
    topk_per_key,
    topk_tools,
    turn_stats,
    value_quantiles_per_key,
    winsorize_per_key,
)

# event-stream variants
from .stages.events import (  # noqa: F401
    cep_events,
    session_events,
    sliding_events,
    tumbling_events,
)

# sampling / sources / compaction
from .stages.projection import hash_sample  # noqa: F401
from .sources.jsonl import read_documents_jsonl  # noqa: F401
from .sinks.compact import compact_channel, compacted_files  # noqa: F401

# multimodal / debug
from .stages.multimodal import (  # noqa: F401
    binary_meta,
    extract_features,
    resize_frames,
    sample_frames,
)
from .stages.render import debug_render, render_conversations  # noqa: F401

# composite pipelines
from .pipelines.corpus_prep import corpus_prep  # noqa: F401
from .pipelines.flagship import conv_scorecard  # noqa: F401
from .pipelines.repair import (  # noqa: F401
    repair_latency,
    repair_matches,
    repair_orphans,
    repair_pairs,
    repair_rolling,
    repair_sessions,
    repair_sliding,
    repair_tumbling,
)
