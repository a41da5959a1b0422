-- materialized: table
-- Port of bread dbt/models/parsed/log_attributes.sql:1.
select * from parquet.`{{ var('parsed_root') }}/log_attributes`
