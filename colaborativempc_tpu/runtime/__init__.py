from colaborativempc_tpu.runtime.simulate import (
    FleetState, StepMetrics, ExperimentResult,
    make_lpv_fleet_step, init_lpv_fleet, run_lpv_experiment,
)
