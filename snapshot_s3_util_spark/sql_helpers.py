"""Oracle-SQL building blocks shared across operator modules.

The DuckDB oracle views are registered over the RAW parquet files, so
`events.ts` arrives as TIMESTAMP_NS there; every oracle query must go
through :data:`EVENTS_REL` which truncates it to microseconds exactly
like the engine's `io.load_table` does (SURVEY.md §1.2).
"""

# Canonical events relation for oracle SQL (ns -> us truncation mirrors
# Spark's timestamp_micros(ts DIV 1000)).
EVENTS_REL = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM events)"
)
