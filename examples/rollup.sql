-- Tumbling-hour revenue rollup with HAVING + ORDER BY + LIMIT.
-- Run:
--   python run_app.py examples/rollup.sql \
--     --register "events=/root/testdata/sf0.01/events.parquet:ts"
CREATE STREAM events (ts TIMESTAMP, user_id BIGINT, event_id BIGINT,
                      event_type VARCHAR, value DOUBLE);

INSERT INTO HourlyTop
SELECT user_id, sum(value) AS revenue, count(*) AS n
FROM events WINDOW TUMBLING(1 HOUR)
WHERE event_type = 'purchase'
GROUP BY user_id
HAVING count(*) >= 2
ORDER BY revenue DESC
LIMIT 10;
