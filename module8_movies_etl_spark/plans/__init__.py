"""Composed plans: the benchmark/driver query catalog and the
reference ETL pipeline."""
