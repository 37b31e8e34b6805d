from datastream_io_spark.sources.scan import (  # noqa: F401
    scan_corpus,
    load_table,
    documents_as_corpus,
)
