"""Input-side helpers: deterministic synthetic pages corpus + parquet read
helpers with column pruning."""
