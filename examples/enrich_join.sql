-- Stream↔table enrichment: purchases joined to the customer dimension.
-- Run:
--   python run_app.py examples/enrich_join.sql \
--     --register "events=/root/testdata/sf0.01/events.parquet:ts" \
--     --register "customer=/root/testdata/sf0.01/customer.parquet"
CREATE STREAM events (ts TIMESTAMP, user_id BIGINT, event_id BIGINT,
                      event_type VARCHAR, value DOUBLE);
CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR, c_address VARCHAR,
                       c_nationkey BIGINT, c_phone VARCHAR,
                       c_acctbal DOUBLE, c_mktsegment VARCHAR,
                       c_comment VARCHAR);

INSERT INTO Enriched
SELECT events.user_id AS user_id, customer.c_name AS name,
       customer.c_mktsegment AS segment, events.value AS value
FROM events JOIN customer ON events.user_id = customer.c_custkey
WHERE events.event_type = 'purchase';
