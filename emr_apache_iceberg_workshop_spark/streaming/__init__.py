from .jobs import (  # noqa: F401
    stream_ingest_available_now,
    stream_jsonl_ingest_available_now,
    windowed_event_counts,
    run_windowed_agg_available_now,
    sessionize_stateful,
    stream_cdc_upsert,
    stream_stream_attribution,
    run_attribution_available_now,
)
