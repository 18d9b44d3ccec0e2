"""Sources & sinks (SURVEY.md §2.1 S1-S16): file readers (CSV variants,
JSON/JSONL, zip-extract), Kafka stream/batch builders with Confluent
wire-format framing, Avro codec helpers (import-gated on spark-avro)."""
