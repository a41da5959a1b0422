-- Port of bread dbt/old_models/ibc/daily_cum_ibc_transfers.sql:1-8.
-- NOTE (SURVEY §2.5 W1 caveat): the reference orders the running sum by
-- day only while rows are keyed by (day, transfer_denom) — denoms
-- interleave in the cumulative total. Reproduced as-is for parity.
select
    day,
    transfer_denom,
    sum(total_amount_over_direction) over (
        order by day asc rows between unbounded preceding and current row
    ) as cum_amount_over_direction
from {{ ref("daily_ibc_transfers") }}
order by day desc
