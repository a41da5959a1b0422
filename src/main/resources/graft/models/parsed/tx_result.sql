-- materialized: table
-- Port of bread dbt/models/parsed/tx_result.sql:1.
select * from parquet.`{{ var('parsed_root') }}/tx_result`
