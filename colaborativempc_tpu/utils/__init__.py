from colaborativempc_tpu.utils.warmstart import (
    warmstart_trajectory, initialise_agents,
)
from colaborativempc_tpu.utils.rollout import rollout_euler, rollout_rk4
from colaborativempc_tpu.utils.precision import x64_island, dtype_island
from colaborativempc_tpu.utils.sysid import regression, gbellmf
