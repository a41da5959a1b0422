-- materialized: table
-- Port of bread dbt/models/parsed/blocks.sql:1 — parquet glob scan with
-- hive partition recovery (year=/month=/day=), which Spark's reader does
-- automatically from the root path.
select * from parquet.`{{ var('parsed_root') }}/blocks`
