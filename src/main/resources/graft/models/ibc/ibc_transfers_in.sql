-- Port of bread dbt/old_models/ibc/ibc_transfers_in.sql:1-44.
-- `parsed` is map<string, array<string>> here (the postgres jsonb column).
-- Postgres semantics reproduced:
--  * multiple jsonb_array_elements_text() in one select expand in lockstep
--    (PG10+ SRF behavior, null-padded to the longest) -> arrays_zip + one
--    inline(), which also avoids the Cartesian blow-up (SURVEY §7 risk 4);
--  * regexp_matches(x,'[0-9]*')[1] returns the FIRST match = the leading
--    digit run -> regexp_extract with an anchored pattern;
--  * regexp_replace without 'g' replaces only the FIRST match -> anchored
--    '^[0-9]*' (Spark's regexp_replace is global);
--  * jsonb array-equality filter -> array() literal comparison.
with fields as (
    select
        logs.txhash,
        logs.msg_index,
        txs.timestamp,
        parsed['transfer_amount']                  as amount_raw,
        parsed['fungible_token_packet_sender']     as ibc_sender,
        parsed['fungible_token_packet_receiver']   as ibc_recv,
        parsed['recv_packet_packet_src_port']      as src_port,
        parsed['recv_packet_packet_src_channel']   as src_channel,
        parsed['recv_packet_packet_dst_port']      as dst_port,
        parsed['recv_packet_packet_dst_channel']   as dst_channel
    from {{ source("indexer", "logs") }} logs
    left join {{ source("indexer", "txs") }} txs on logs.txhash = txs.txhash
    where parsed['message_module'] = array('ibc_channel', 'ibc_channel')
),
exploded as (
    select
        txhash, msg_index, timestamp,
        inline(arrays_zip(
            amount_raw, ibc_sender, ibc_recv,
            src_port, src_channel, dst_port, dst_channel))
    from fields
)
select
    txhash,
    msg_index,
    timestamp,
    cast(regexp_extract(amount_raw, '^[0-9]*', 0) as decimal(38, 0)) as transfer_amount,
    regexp_replace(amount_raw, '^[0-9]*', '') as transfer_denom,
    ibc_sender,
    ibc_recv,
    src_port,
    src_channel,
    dst_port,
    dst_channel
from exploded
order by timestamp desc
