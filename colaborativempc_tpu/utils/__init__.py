from colaborativempc_tpu.utils.warmstart import (
    warmstart_trajectory, initialise_agents,
)
