from monasca_aggregator_spark.sources.envelope import (
    ENVELOPE_JSON_SCHEMA,
    events_to_envelopes,
    parse_envelopes,
)
from monasca_aggregator_spark.sources.tables import TABLES, load_table, register_tables

__all__ = [
    "ENVELOPE_JSON_SCHEMA",
    "events_to_envelopes",
    "parse_envelopes",
    "TABLES",
    "load_table",
    "register_tables",
]
