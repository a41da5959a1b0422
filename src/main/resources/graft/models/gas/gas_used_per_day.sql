-- Port of bread dbt/old_models/gas/gas_used_per_day.sql:1-5.
-- The reference leaves sum(gas_used) unaliased; aliased here because
-- Spark's auto-generated name `sum(gas_used)` needs backticks downstream.
select sum(gas_used) as sum_gas_used, date_trunc('day', timestamp) as day
from {{ source("indexer", "txs") }}
group by day
order by day
