-- Port of bread dbt/old_models/txs/cum_txs_per_day.sql:1-13 (SURVEY §2.5
-- W1: cumulative sum with explicit ROWS frame; the window is global but
-- runs over an already-aggregated one-row-per-day frame).
with cum_txs_per_day as (
    select
        day,
        sum(tx_count) over (
            order by day asc rows between unbounded preceding and current row
        ) as tx_count
    from {{ ref("num_txs_per_day") }}
)
select * from cum_txs_per_day
