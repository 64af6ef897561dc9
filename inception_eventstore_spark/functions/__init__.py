"""Pure transforms and column expressions shared across operators."""

from inception_eventstore_spark.functions.filetime import (  # noqa: F401
    FILETIME_EPOCH_TICKS,
    filetime_to_datetime,
    filetime_to_timestamp_col,
    datetime_to_filetime,
    timestamp_to_filetime_col,
)
from inception_eventstore_spark.functions.partitions import (  # noqa: F401
    pid_from_datetime,
    pid_from_filetime,
    pid_col_from_filetime,
    pid_col_from_timestamp,
    next_pid,
    pid_range,
)
from inception_eventstore_spark.functions.paging import (  # noqa: F401
    PagingToken,
    encode_token,
    decode_token,
)
from inception_eventstore_spark.functions.timebucket import (  # noqa: F401
    interval_to_micros,
    time_bucket,
)
