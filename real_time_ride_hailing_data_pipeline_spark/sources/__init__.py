"""Source / sink adapters: parquet catalog tables, synthetic ride-event
generator, JSON wire format, Kafka (import-guarded — no broker in the
test environment)."""
