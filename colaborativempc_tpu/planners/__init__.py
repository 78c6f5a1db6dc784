from colaborativempc_tpu.planners.lpv import (
    LPVSolution, build_lpv_qp, lpv_solve, NZ, NC,
)
from colaborativempc_tpu.planners.nl import (
    NLSolution, build_nl_qp, nl_solve,
)
from colaborativempc_tpu.planners.mpcc import (
    MPCCGains, MPCCSolution, build_mpcc_qp, mpcc_solve,
)
