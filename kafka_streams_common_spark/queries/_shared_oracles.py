"""Oracle SQL shared verbatim between queries.

When a streaming query's correctness contract is "must hash-match the
batch definition", the two registrations share ONE oracle string here —
an edit to the definition cannot silently decouple the gate.
"""

OHLC_DAILY_ORACLE = """
    WITH ranked AS (
      SELECT CAST(ts AS DATE) AS day, event_type, value,
             row_number() OVER (
               PARTITION BY CAST(ts AS DATE), event_type
               ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (
               PARTITION BY CAST(ts AS DATE), event_type
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM ranked GROUP BY day, event_type
    """
