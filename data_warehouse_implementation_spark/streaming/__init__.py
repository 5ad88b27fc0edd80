"""Structured Streaming extension (SURVEY §2.10 — extension, not
reference parity): incremental versions of the batch operators via
``readStream`` + watermarked windows + ``foreachBatch`` SCD
maintenance."""

from .pipelines import (  # noqa: F401
    clusters_from_state,
    cms_estimate,
    cms_sketch_sink,
    curation_admission_sink,
    curation_sequences_from_state,
    dedup_stream,
    distinct_from_state,
    enrich_stream,
    events_stream_schema,
    histogram_sketch_sink,
    hll_sketch_sink,
    incremental_dedup_sink,
    incremental_scd2_sink,
    incremental_scd3_sink,
    interval_join_stream,
    ivf_admission_sink,
    ivf_state_topk,
    line_census_from_state,
    line_census_sink,
    dedup_lines_against_state,
    normalize_event_ts,
    quantiles_from_state,
    rollup_hour_sink,
    rollup_month_from_state,
    run_to_memory,
    sessionize_stateful,
    stream_events,
    substring_census_from_state,
    substring_gram_sink,
    tumbling_counts,
    word_count_sink,
    word_table_from_state,
)
