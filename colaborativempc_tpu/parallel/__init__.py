from colaborativempc_tpu.parallel.fleet import (
    make_sharded_lpv_step, batch_fleet_state, shard_fleet_state,
)
