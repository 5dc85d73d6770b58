"""Source normalizers and wire-format decoders: each heterogeneous
source shape → the canonical change record (SURVEY §2.1), plus the
public-spec byte decoders (binlog v4, pgoutput, change-stream BSON,
Kafka RecordBatch v2) whose feeds the normalizers consume."""

from .binlog import read_binlog_feed  # noqa: F401
from .bson_wire import read_changestream_feed  # noqa: F401
from .kafka_wire import read_kafka_segments  # noqa: F401
from .normalize import (  # noqa: F401
    from_cosmos_documents,
    from_kafka_messages,
    from_mongo_events,
    from_mysql_rows,
    from_pg_tuples,
)
from .pgoutput import read_pgoutput_feed  # noqa: F401
