from colaborativempc_tpu.runtime.simulate import (
    FleetState, StepMetrics, ExperimentResult,
    make_lpv_fleet_step, make_lpv_fleet_rollout, init_lpv_fleet,
    run_lpv_experiment,
)
from colaborativempc_tpu.runtime.ocd import (
    OCDFleetState, OCDStepMetrics, NLExperimentResult,
    make_nl_ocd_step, make_nl_ocd_rollout, make_nl_ocd_instrumented,
    init_nl_fleet, run_nl_experiment,
)
from colaborativempc_tpu.runtime.racing import (
    MPCCState, MPCCStepMetrics, MPCCResult,
    make_mpcc_step, make_mpcc_rollout, init_mpcc,
    run_mpcc_experiment, load_mpcc_track,
)
from colaborativempc_tpu.runtime.io import (
    ExperimentIO, load_lambdas, load_experiment,
)
from colaborativempc_tpu.runtime.battery import (
    gain_grid, run_lpv_battery, BatteryResult,
    run_nl_battery, NLBatteryResult,
)
