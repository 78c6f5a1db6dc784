from colaborativempc_tpu.parallel.fleet import (
    make_sharded_lpv_step, batch_fleet_state, shard_fleet_state,
)
from colaborativempc_tpu.parallel.ocd import (
    make_sharded_nl_ocd_step, shard_ocd_state, place_ocd_batch,
)
from colaborativempc_tpu.parallel.multihost import (
    initialize_distributed, fleet_mesh,
)
