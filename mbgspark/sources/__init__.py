from mbgspark.sources.ingest import ingest_raw_records, parse_metric_counts

__all__ = ["ingest_raw_records", "parse_metric_counts"]
