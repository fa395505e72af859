-- Signup→purchase funnel: CEP pattern per user with a 30-minute horizon.
-- Run:
--   python run_app.py examples/funnel.sql \
--     --register "events=/root/testdata/sf0.01/events.parquet:ts"
CREATE STREAM events (ts TIMESTAMP, user_id BIGINT, event_id BIGINT,
                      event_type VARCHAR, value DOUBLE);

PARTITION WITH (user_id OF events) BEGIN
  INSERT INTO Funnels
  SELECT e1.user_id AS user_id,
         e1.ts AS signup_ts,
         e2.ts AS purchase_ts,
         e2.value AS purchase_value
  FROM PATTERN (e1=events[event_type = 'signup'] ->
                e2=events[event_type = 'purchase'])
  WITHIN 1800 SECONDS;
END;
