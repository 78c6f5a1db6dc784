from colaborativempc_tpu.parallel.fleet import (
    make_sharded_lpv_step, make_sharded_lpv_rollout,
    batch_fleet_state, shard_fleet_state,
)
from colaborativempc_tpu.parallel.ocd import (
    make_sharded_nl_ocd_step, make_sharded_nl_ocd_rollout,
    shard_ocd_state, place_ocd_batch,
)
from colaborativempc_tpu.parallel.multihost import (
    initialize_distributed, fleet_mesh,
)
