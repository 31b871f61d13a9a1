from nerfnav_tpu.nav.math_utils import (
    skew_matrix,
    vec_to_rot_matrix,
    rot_matrix_to_vec,
    rot_x,
    mahalanobis,
    nearest_pd,
    is_pd,
    calc_so3_err,
    calc_se3_err,
)
from nerfnav_tpu.nav.astar import astar
from nerfnav_tpu.nav.dynamics import drone_dynamics, DynamicsConfig, Simulator, next_rotation
from nerfnav_tpu.nav.planner import Planner, PlannerConfig
from nerfnav_tpu.nav.estimator import Estimator, EstimatorConfig, find_poi
from nerfnav_tpu.nav.agent import Agent, AgentConfig, add_noise_to_state
from nerfnav_tpu.nav.viz import QuadPlot, estimator_triptych

__all__ = [
    "QuadPlot", "estimator_triptych",
    "skew_matrix", "vec_to_rot_matrix", "rot_matrix_to_vec", "rot_x",
    "mahalanobis", "nearest_pd", "is_pd", "calc_so3_err", "calc_se3_err",
    "astar", "drone_dynamics", "DynamicsConfig", "Simulator", "next_rotation",
    "Planner", "PlannerConfig", "Estimator", "EstimatorConfig", "find_poi",
    "Agent", "AgentConfig", "add_noise_to_state",
]
