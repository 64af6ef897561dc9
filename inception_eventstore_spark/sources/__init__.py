"""Sources & sinks: testdata loaders, table layout, naming strategies."""

from inception_eventstore_spark.sources.tables import (  # noqa: F401
    TABLES,
    TIMESTAMP_COLUMNS,
    load_table,
    load_all,
    register_views,
)
from inception_eventstore_spark.sources.layout import (  # noqa: F401
    keyspace_per_tenant,
    table_per_bounded_context,
    EventStoreLayout,
)
from inception_eventstore_spark.sources.snapshots import SnapshotLog  # noqa: F401
from inception_eventstore_spark.sources.matview import (  # noqa: F401
    IncrementalAggView,
    Measure,
)
from inception_eventstore_spark.sources.zorder import (  # noqa: F401
    zorder_write,
    zvalue_by_range,
)
from inception_eventstore_spark.sources.training_export import (  # noqa: F401
    export_shards,
    read_manifest,
    verify_shards,
)
