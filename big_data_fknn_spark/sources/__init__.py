"""Input connectors beyond plain parquet/CSV.

``keel`` reads the KEEL dataset format — the reference's native
input ([R src/main/scala/utils/keel/KeelParser.scala]): an
``@attribute``-style header declaring names/types/ranges and a
comma-separated data section.  A user migrating from the reference
can point their existing KEEL files at this engine unchanged.
"""

from big_data_fknn_spark.sources.keel import (
    KeelSchema,
    parse_keel_header,
    read_keel,
    write_keel,
)

__all__ = ["KeelSchema", "parse_keel_header", "read_keel", "write_keel"]
