-- Port of bread dbt/old_models/ibc/ibc_transfers_out.sql:1-40.
-- The jsonb key-exists predicates `parsed->'message_module' ? 'transfer'`
-- become array_contains over the parsed string arrays (SURVEY §2.2 P8).
with fields as (
    select
        logs.txhash,
        logs.msg_index,
        txs.timestamp,
        parsed['transfer_amount']                 as amount_raw,
        parsed['ibc_transfer_sender']             as ibc_sender,
        parsed['ibc_transfer_receiver']           as ibc_recv,
        parsed['send_packet_packet_src_port']     as src_port,
        parsed['send_packet_packet_src_channel']  as src_channel,
        parsed['send_packet_packet_dst_port']     as dst_port,
        parsed['send_packet_packet_dst_channel']  as dst_channel
    from {{ source("indexer", "logs") }} logs
    left join {{ source("indexer", "txs") }} txs on logs.txhash = txs.txhash
    where array_contains(parsed['message_module'], 'transfer')
      and array_contains(parsed['message_module'], 'ibc_channel')
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
