-- materialized: table
-- Port of bread dbt/models/parsed/events.sql:1-2 ("ran in 14 seconds when
-- ran alone" — the reference's only published model timing, BASELINE.md).
select * from parquet.`{{ var('parsed_root') }}/events`
