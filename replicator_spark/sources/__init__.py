"""Source normalizers: each heterogeneous source shape → the canonical
change record (SURVEY §2.1)."""

from .normalize import (  # noqa: F401
    from_cosmos_documents,
    from_kafka_messages,
    from_mongo_events,
    from_mysql_rows,
    from_pg_tuples,
)
