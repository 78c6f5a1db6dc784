from colaborativempc_tpu.planners.lpv import (
    LPVSolution, build_lpv_qp, lpv_solve, NZ, NC,
)
