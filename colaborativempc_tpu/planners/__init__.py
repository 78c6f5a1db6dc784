from colaborativempc_tpu.planners.lpv import (
    LPVSolution, build_lpv_qp, lpv_solve, NZ, NC,
)
from colaborativempc_tpu.planners.nl import (
    NLSolution, build_nl_qp, nl_solve,
)
from colaborativempc_tpu.planners.mpcc import (
    MPCCGains, MPCCBounds, MPCCNormalization, MPCCConfig, MPCCSolution,
    build_mpcc_qp, mpcc_solve,
    mpcc_config_from_json, mpcc_config_to_json,
    pacejka_from_reference, mpcc_gains_from_reference,
    mpcc_bounds_from_reference,
)
