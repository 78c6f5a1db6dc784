from colaborativempc_tpu.ops.lqr import (
    LQRCost, LQRDynamics, LQRFactors,
    lqr_factorize, lqr_affine_solve, lqr_solve,
)
from colaborativempc_tpu.ops.admm import (
    StageQP, ADMMSolution, build_admm_cost, admm_solve, scale_stage_qp,
)
