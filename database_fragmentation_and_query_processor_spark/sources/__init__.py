"""Sources: ``::``-delimited ratings text reader, testdata parquet tables."""
