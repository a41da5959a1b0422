-- Port of bread dbt/old_models/ibc/ibc_transfers.sql:1-10.
-- SQL UNION (not UNION ALL) — deduplicates; outbound amounts sign-flipped
-- (SURVEY §2.7 U1).
with combined_transfers as (
    select *, transfer_amount as amount_over_direction
    from {{ ref("ibc_transfers_in") }}
    union
    select *, transfer_amount * -1 as amount_over_direction
    from {{ ref("ibc_transfers_out") }}
)
select * from combined_transfers
