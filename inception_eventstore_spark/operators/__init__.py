"""Operators: event-store core (R/X/C/M/S) + LLM-pipeline extensions."""

from inception_eventstore_spark.operators.eventstore import (  # noqa: F401
    AggregateCommit,
    EventStore,
    PlayerOptions,
)
from inception_eventstore_spark.operators.index import (  # noqa: F401
    IndexByEventTypeStore,
)
from inception_eventstore_spark.operators.counters import MessageCounter  # noqa: F401
from inception_eventstore_spark.operators.message_store import MessageStore  # noqa: F401
from inception_eventstore_spark.operators.migration import (  # noqa: F401
    copy_raw,
    migrate_event_store,
)
from inception_eventstore_spark.operators.joins import (  # noqa: F401
    asof_join,
    range_join,
)
from inception_eventstore_spark.operators.sessions import (  # noqa: F401
    session_stats,
    sessionize,
)
from inception_eventstore_spark.operators.ann_index import (  # noqa: F401
    IvfVectorIndex,
    LshVectorIndex,
)
from inception_eventstore_spark.operators.pipeline import (  # noqa: F401
    curate_corpus,
    curation_summary,
)
from inception_eventstore_spark.operators.components import (  # noqa: F401
    connected_components,
    dedup_by_components,
    dedup_survivors,
)
from inception_eventstore_spark.operators.sampling import (  # noqa: F401
    deterministic_sample,
    hash_split,
    mix_corpora,
    temperature_mixture,
)
from inception_eventstore_spark.operators.chunking import (  # noqa: F401
    chunk_stats,
    chunk_text,
)
from inception_eventstore_spark.operators.lm import (  # noqa: F401
    bigram_counts,
    bigram_lm_score,
)
from inception_eventstore_spark.operators.text_index import (  # noqa: F401
    MinHashTextIndex,
)
from inception_eventstore_spark.operators.decontaminate import (  # noqa: F401
    # NB: the bare `decontaminate` function is NOT re-exported here —
    # it would shadow the `operators.decontaminate` SUBMODULE on the
    # package namespace and break `from ... import decontaminate as DC`
    contaminated_ids,
    flag_contamination,
)
from inception_eventstore_spark.operators.decontaminate import (  # noqa: F401
    decontaminate as decontaminate_corpus,
)
from inception_eventstore_spark.operators.merge import (  # noqa: F401
    latest_by_key,
    merge_changelog,
)
from inception_eventstore_spark.operators.clustering import (  # noqa: F401
    assign_clusters,
    balanced_sample,
    kmeans_fit,
)
from inception_eventstore_spark.operators.packing import (  # noqa: F401
    pack_chunked,
    pack_greedy,
    token_offsets,
)
from inception_eventstore_spark.operators.filtering import (  # noqa: F401
    quantile_threshold_filter,
)
from inception_eventstore_spark.operators.importance import (  # noqa: F401
    dsir_select,
    importance_scores,
    token_logratios,
)
from inception_eventstore_spark.operators.domains import (  # noqa: F401
    domain_blocklist_filter,
    domain_stats,
)
from inception_eventstore_spark.operators.embeddings import (  # noqa: F401
    hashed_bow_embedding,
)
from inception_eventstore_spark.operators.retrieval import (  # noqa: F401
    bm25_topk,
    build_inverted_index,
)
from inception_eventstore_spark.operators.linkage import (  # noqa: F401
    fuzzy_join,
)
# NB: the bare `pagerank` function would shadow nothing (module is
# `graph`), safe to re-export
from inception_eventstore_spark.operators.graph import (  # noqa: F401
    adamic_adar,
    label_propagation,
    pagerank,
    triangle_counts,
)
from inception_eventstore_spark.operators.timeseries import (  # noqa: F401
    ewma_smooth,
    rolling_stats,
    zscore_anomalies,
)
from inception_eventstore_spark.operators.prop_index import (  # noqa: F401
    PropertyIndex,
)
from inception_eventstore_spark.operators.basket import (  # noqa: F401
    association_rules,
    item_pair_counts,
)
