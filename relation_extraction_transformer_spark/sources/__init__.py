"""Sources and sinks: synthetic Common-Crawl-style pages, gazetteers,
GloVe-style embedding text files, parquet/Iceberg table IO."""
