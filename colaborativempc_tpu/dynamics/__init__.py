from colaborativempc_tpu.dynamics.bicycle import (
    NX, NU, LOW_VEL_THRESH,
    lpv_coeffs, lpv_matrices, f_continuous, discretize_euler,
    lpv_discrete_horizon, step_euler, step_rk4,
)
from colaborativempc_tpu.dynamics.pacejka import (
    PacejkaParams, f_continuous_pacejka, tire_forces, slip_angles,
    friction_ellipse_residual, slip_angle_residuals, linearize_pacejka,
)
