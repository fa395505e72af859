-- Session windows: activity bursts per user separated by 30-minute gaps.
-- Run:
--   python run_app.py examples/sessions.sql \
--     --register "events=/root/testdata/sf0.01/events.parquet:ts"
CREATE STREAM events (ts TIMESTAMP, user_id BIGINT, event_id BIGINT,
                      event_type VARCHAR, value DOUBLE);

INSERT INTO Sessions
SELECT user_id, count(*) AS n_events, sum(value) AS session_value
FROM events WINDOW SESSION(30 MINUTES)
GROUP BY user_id;
