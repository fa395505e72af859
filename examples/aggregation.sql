-- Incremental multi-granularity aggregation DDL (the reference's
-- "define aggregation" shape — #[ignore]d in its own test suite,
-- app_runner_aggregations.rs — runnable here). Read the cascade back
-- with --agg NAME=GRANULARITY.
-- Run:
--   python run_app.py examples/aggregation.sql \
--     --register "events=/root/testdata/sf0.01/events.parquet:ts" \
--     --agg Rollup=hour
CREATE STREAM events (ts TIMESTAMP, user_id BIGINT, event_id BIGINT,
                      event_type VARCHAR, value DOUBLE);

CREATE AGGREGATION Rollup FROM events
SELECT sum(value) AS total
GROUP BY event_type
AGGREGATE EVERY sec ... day;
