"""SLAM layer: odometry chain, pose graph, bundle adjustment, engine."""

from icp_tpu.slam.se3 import Pose
from icp_tpu.slam.odometry import (
    KeyframePolicy,
    absolute_trajectory_error,
    odometry_chain_device,
    run_odometry,
)
from icp_tpu.slam.pose_graph import PoseGraph, graph_from_poses, optimize
from icp_tpu.slam.bundle_adjustment import BAProblem, ba_solve, make_sharded_ba
from icp_tpu.slam.mapping import SlamEngine
from icp_tpu.slam.checkpoint import load_session, save_session
