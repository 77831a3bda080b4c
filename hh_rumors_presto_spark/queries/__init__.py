"""Query modules. Importing them populates the registry (side-effect)."""

from __future__ import annotations

_LOADED = False


def load() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import order is irrelevant; each module only registers keys.
    from hh_rumors_presto_spark.queries import (  # noqa: F401
        advanced,
        aggregation,
        analytics_extra,
        analytics_round2,
        analytics_round3,
        analytics_round4,
        analytics_round5,
        breadth_round3,
        breadth_round4,
        breadth_round5,
        breadth_round6,
        breadth_round7,
        breadth_round8,
        breadth_round9,
        breadth_round10,
        breadth_round11,
        breadth_round12,
        breadth_round13,
        breadth_round14,
        breadth_round15,
        breadth_round16,
        breadth_round17,
        breadth_round18,
        breadth_round19,
        breadth_round20,
        breadth_round21,
        breadth_round22,
        breadth_round23,
        breadth_round24,
        breadth_round25,
        experimentation,
        tokenizer_round2,
        engine_surface,
        engine_surface2,
        event_analytics,
        curation_round4,
        curation_round5,
        extensions_corpus,
        extensions_curation,
        extensions_dedup,
        extensions_pipeline,
        extensions_sim,
        extensions_text,
        extensions_udf,
        flagship,
        flagship_multitag,
        graph,
        joins,
        lakehouse,
        misc_ops,
        multimodal_round2,
        observability,
        page_pipeline,
        relational,
        render,
        scale_patterns,
        scale_round2,
        scans,
        scans_extra,
        sql_surface,
        streaming,
        streaming_joins,
        strings_dates,
        tpch_full,
        tpch_more,
        tpch_partsupp,
        udtf_native,
        windows,
    )

    _LOADED = True
