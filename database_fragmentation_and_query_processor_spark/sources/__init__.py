"""Sources: ``::``-delimited ratings text reader (plain CSV scan and a
registered splittable Python DataSource), quarantining CSV/JSONL
loaders, binary-file ingest, incremental ledger, testdata parquet
tables."""
