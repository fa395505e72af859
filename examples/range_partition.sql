-- Range partition: each event is routed to every matching price band and
-- aggregated per band (reference range_partition_type.rs semantics).
-- Run:
--   python run_app.py examples/range_partition.sql \
--     --register "events=/root/testdata/sf0.01/events.parquet:ts"
CREATE STREAM events (ts TIMESTAMP, user_id BIGINT, event_id BIGINT,
                      event_type VARCHAR, value DOUBLE);

PARTITION WITH (value < 100 AS 'small' OR value >= 100 AS 'large' OF events)
BEGIN
  INSERT INTO BandTotals
  SELECT _range AS band, count(*) AS n, sum(value) AS total
  FROM events GROUP BY _range;
END;
